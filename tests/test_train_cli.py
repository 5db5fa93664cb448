"""End-to-end train CLI: YAML data config -> steps -> final artifacts."""

import json
import os

import numpy as np
import pytest


def _write_dataset(tmp_path, n=6):
    items = [
        {
            "video": f"v{i}.mp4",
            "conversations": [
                {"from": "human", "value": "what color is the sky ."},
                {"from": "gpt", "value": "blue ."},
            ],
        }
        for i in range(n)
    ]
    jpath = tmp_path / "data.json"
    with open(jpath, "w") as f:
        json.dump(items, f)
    ypath = tmp_path / "data.yaml"
    with open(ypath, "w") as f:
        f.write(
            "datasets:\n"
            f"  - format: conversation\n"
            f"    json_path: {jpath}\n"
            f"    sampling: uniform\n"
            f"    num_frames: 2\n"
        )
    return str(ypath)


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    import timeviper_tpu.data.datasets as ds_mod
    from tests.test_eval_cli import _fake_load_video, _make_tokenizer
    import timeviper_tpu.data.video as video_mod

    monkeypatch.setattr(video_mod, "load_video", _fake_load_video)
    _make_tokenizer(tmp_path)
    yaml_path = _write_dataset(tmp_path)
    run_dir = str(tmp_path / "run")

    from timeviper_tpu.train.cli import main

    main([
        "--data_config", yaml_path,
        "--vision_backbone_id", "debug-vit-tiny",
        "--llm_backbone_id", "debug-nano-tiny",
        "--arch_specifier", "tome_mlp-2",
        "--conv_template", "nano_base",
        "--tokenizer_path", str(tmp_path),
        "--run_dir", run_dir,
        "--max_steps", "3",
        "--batch_size", "2",
        "--save_every", "2",
        "--log_every", "1",
        "--learning_rate", "1e-3",
        "--data_parallel", "2",
        "--num_workers", "1",
    ])

    # checkpoints + final artifacts exist
    assert any(d.startswith("checkpoint-") for d in os.listdir(run_dir))
    final = os.path.join(run_dir, "final")
    assert os.path.isdir(os.path.join(final, "orbax"))
    with open(os.path.join(final, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["llm_backbone_id"] == "debug-nano-tiny"
    assert os.path.exists(os.path.join(run_dir, "train.log"))


def test_train_cli_qlora(tmp_path, monkeypatch):
    """QLoRA end-to-end: int8 frozen base + factor-only training updates.

    The reference's LoRA run (train.py:364-383) via --lora_enable, plus the
    int8 base (--lora_quantize_base) that lets the full 9B fine-tune on one
    16 GB chip. Asserts only lora factors moved and the artifact split
    (lora_state.npz, the non_lora_trainables.bin analog) exists.
    """
    import timeviper_tpu.data.video as video_mod
    from tests.test_eval_cli import _fake_load_video, _make_tokenizer

    monkeypatch.setattr(video_mod, "load_video", _fake_load_video)
    _make_tokenizer(tmp_path)
    yaml_path = _write_dataset(tmp_path)
    run_dir = str(tmp_path / "run_qlora")

    from timeviper_tpu.train.cli import main

    main([
        "--data_config", yaml_path,
        "--vision_backbone_id", "debug-vit-tiny",
        "--llm_backbone_id", "debug-nano-tiny",
        "--arch_specifier", "tome_mlp-2",
        "--conv_template", "nano_base",
        "--tokenizer_path", str(tmp_path),
        "--run_dir", run_dir,
        "--max_steps", "2",
        "--batch_size", "1",
        "--save_every", "10",
        "--log_every", "1",
        "--learning_rate", "1e-2",
        "--num_workers", "1",
        "--lora_enable", "--lora_r", "4", "--lora_quantize_base",
    ])

    final = os.path.join(run_dir, "final")
    lora_npz = os.path.join(final, "lora_state.npz")
    assert os.path.exists(lora_npz)
    sd = np.load(lora_npz)
    b_moved = [k for k in sd.files
               if "lora_b" in k and np.abs(sd[k]).sum() > 0]
    assert b_moved, "training must move some lora_b factors off zero"
    with open(os.path.join(final, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["lora"]["quantized_base"] is True
