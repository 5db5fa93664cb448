"""End-to-end eval CLI: tiny checkpoint -> generate -> jsonl -> scores."""

import json
import os

import numpy as np
import pytest


def _make_tokenizer(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    words = (
        "<pad> <unk> <SPECIAL_10> <SPECIAL_11> <SPECIAL_12> System User "
        "Assistant ( ) A B C D . what color is the sky blue red Best "
        "Option : Please provide your answer by stating letter followed "
        "full option"
    ).split()
    vocab = {w: i for i, w in enumerate(words)}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    t = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
        eos_token="<SPECIAL_12>",
    )
    t.save_pretrained(str(tmp_path))
    return t


def _make_checkpoint(tmp_path):
    import jax
    import jax.numpy as jnp

    from timeviper_tpu.config import VLMConfig
    from timeviper_tpu.models.api import build_arch
    from timeviper_tpu.models.vlm import init_vlm_params
    from timeviper_tpu.train.checkpoint import save_params

    cfg = {
        "model_id": "timeviper-debug",
        "vision_backbone_id": "debug-vit-tiny",
        "llm_backbone_id": "debug-nano-tiny",
        "arch_specifier": "tome_mlp-2",
        "conv_template": "nano_base",
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg, f)
    arch = build_arch(VLMConfig(
        vision_backbone_id=cfg["vision_backbone_id"],
        llm_backbone_id=cfg["llm_backbone_id"],
        arch_specifier=cfg["arch_specifier"],
    ))
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    save_params(str(tmp_path / "orbax"), params)
    _make_tokenizer(tmp_path)
    return arch


FAKE_RECORDS = [
    {
        "video": f"/nonexistent/v{i}.mp4",
        "question": "what color is the sky .",
        "options": ["A . blue", "B . red"],
        "answer": 0,
        "duration": 10.0,
        "task_type": "color",
        "qid": f"fake|{i}",
    }
    for i in range(3)
]


def _fake_load_video(path, **kw):
    from timeviper_tpu.data.video import VideoMeta

    rng = np.random.default_rng(hash(path) % 2**31)
    frames = rng.integers(0, 255, (4, 28, 28, 3), dtype=np.uint8)
    return frames, np.arange(4) / 1.0, VideoMeta(4, 1.0, 4.0)


@pytest.mark.parametrize("serving", [False, True])
def test_eval_cli_end_to_end(tmp_path, monkeypatch, serving):
    import timeviper_tpu.data.video as video_mod
    import timeviper_tpu.eval.evaluate as ev

    _make_checkpoint(tmp_path)
    monkeypatch.setattr(ev, "load_benchmark",
                        lambda name, root, split: list(FAKE_RECORDS))
    monkeypatch.setattr(video_mod, "load_video", _fake_load_video)

    out_dir = str(tmp_path / ("out_serving" if serving else "out"))
    argv = [
        "--checkpoint", str(tmp_path),
        "--dataset_name", "mvbench",
        "--output_dir", out_dir,
        "--max_new_tokens", "4",
        "--min_frames", "4", "--max_frames", "4",
    ]
    if serving:
        argv += ["--use_serving_engine", "--serving_slots", "2"]
    ev.main(argv)

    shard = os.path.join(out_dir, "0_of_1.jsonl")
    with open(shard) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 3
    assert all("pred" in r and "output_text" in r for r in recs)

    # resume: re-running adds nothing
    ev.main(argv)
    with open(shard) as f:
        assert len(f.readlines()) == 3

    # scoring
    result = ev.main(["--score_only", "--dataset_name", "mvbench",
                      "--output_dir", out_dir])
    assert "avg" in result and result["total"] == 3
    assert os.path.exists(os.path.join(out_dir, "scores.json"))


def test_eval_cli_speculative(tmp_path, monkeypatch):
    """--speculative ngram routes through the speculative decode loop and
    produces OUTPUT-IDENTICAL predictions to the plain greedy loop (the
    models/speculative.py invariant, here exercised through the full CLI
    plumbing: get_args -> load_pretrained_vlm -> Generator)."""
    import timeviper_tpu.data.video as video_mod
    import timeviper_tpu.eval.evaluate as ev

    _make_checkpoint(tmp_path)
    monkeypatch.setattr(ev, "load_benchmark",
                        lambda name, root, split: list(FAKE_RECORDS))
    monkeypatch.setattr(video_mod, "load_video", _fake_load_video)

    outs = {}
    for mode in ("plain", "spec"):
        out_dir = str(tmp_path / f"out_{mode}")
        argv = [
            "--checkpoint", str(tmp_path),
            "--dataset_name", "mvbench",
            "--output_dir", out_dir,
            "--max_new_tokens", "6",
            "--min_frames", "4", "--max_frames", "4",
        ]
        if mode == "spec":
            argv += ["--speculative", "ngram", "--n_draft", "3"]
        ev.main(argv)
        with open(os.path.join(out_dir, "0_of_1.jsonl")) as f:
            outs[mode] = [json.loads(l)["output_text"] for l in f]
    assert outs["spec"] == outs["plain"]


def test_eval_cli_with_real_video_decode(tmp_path, monkeypatch):
    """Same pipeline but decoding REAL video files through the native
    libav decoder (no loader monkeypatch)."""
    import timeviper_tpu.eval.evaluate as ev
    from timeviper_tpu.data.native_video import native_video_available

    if not native_video_available():
        pytest.skip("native video decoder unavailable")
    from tests.test_native_video import write_raw_avi

    _make_checkpoint(tmp_path)
    records = []
    for i in range(2):
        rng = np.random.default_rng(i)
        frames = rng.integers(0, 255, (10, 28, 28, 3), dtype=np.uint8)
        path = str(tmp_path / f"v{i}.avi")
        write_raw_avi(path, frames, fps=5)
        records.append({
            "video": path,
            "question": "what color is the sky .",
            "options": ["A . blue", "B . red"],
            "answer": 0, "duration": 2.0, "task_type": "color",
            "qid": f"real|{i}",
        })
    monkeypatch.setattr(ev, "load_benchmark",
                        lambda name, root, split: list(records))
    out_dir = str(tmp_path / "out_real")
    ev.main([
        "--checkpoint", str(tmp_path), "--dataset_name", "mvbench",
        "--output_dir", out_dir, "--max_new_tokens", "3",
        "--min_frames", "4", "--max_frames", "4",
    ])
    with open(os.path.join(out_dir, "0_of_1.jsonl")) as f:
        assert len(f.readlines()) == 2


def test_eval_video_lru_cache(tmp_path, monkeypatch):
    """Repeated questions on one video decode it once; LRU evicts."""
    import timeviper_tpu.data.video as video_mod
    import timeviper_tpu.eval.datasets as ds

    monkeypatch.setattr(ds, "VIDEO_CACHE_SIZE", 2)
    ds._VIDEO_CACHE.clear()
    calls = []

    def counting(path, **kw):
        calls.append(path)
        return _fake_load_video(path, **kw)

    monkeypatch.setattr(video_mod, "load_video", counting)
    from timeviper_tpu.data.conversation import CONV_TEMPLATES

    class _FakeProc:
        def __call__(self, prompt, videos=None):
            return {"input_ids": np.zeros(4, np.int32),
                    "pixels": np.zeros((1, 2, 2, 3), np.uint8)}

    records = [dict(FAKE_RECORDS[0], video=f"/v{v}.mp4", qid=f"q{i}")
               for i, v in enumerate([0, 0, 1, 1, 0, 2, 0])]
    dset = ds.EvalDataset(records, "mcq", _FakeProc(),
                          CONV_TEMPLATES["nano_base"],
                          ds.EvalSampleConfig(min_frames=4, max_frames=4))
    for i in range(len(dset)):
        dset[i]
    # v0 x2 -> 1 decode; v1 x2 -> 1; v0 again (still cached) -> 0;
    # v2 evicts v1... v0 stays hot -> final v0 hit. total: v0,v1,v2 = 3
    assert calls == ["/v0.mp4", "/v1.mp4", "/v2.mp4"]
    ds._VIDEO_CACHE.clear()


def test_eval_cli_prefix_cache(tmp_path, monkeypatch, capsys):
    """--prefix_cache: questions on the same video reuse one cached video
    prefill (models/prefix_cache.py). Two of three items share a video
    NON-adjacently (the loop groups by video), so the run must report one
    prefix-cache hit and still produce valid records for all items."""
    import timeviper_tpu.data.video as video_mod
    import timeviper_tpu.eval.evaluate as ev

    _make_checkpoint(tmp_path)
    records = [dict(r) for r in FAKE_RECORDS]
    records[2]["video"] = records[0]["video"]  # same video, interleaved
    records[2]["question"] = "is the sky red ."
    monkeypatch.setattr(ev, "load_benchmark",
                        lambda name, root, split: records)
    monkeypatch.setattr(video_mod, "load_video", _fake_load_video)

    out_dir = str(tmp_path / "out_prefix")
    ev.main([
        "--checkpoint", str(tmp_path),
        "--dataset_name", "mvbench",
        "--output_dir", out_dir,
        "--max_new_tokens", "4",
        "--min_frames", "4", "--max_frames", "4",
        "--prefix_cache", "--suffix_budget", "64",
    ])
    assert "prefix-cache hits: 1/3" in capsys.readouterr().out
    with open(os.path.join(out_dir, "0_of_1.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert len(recs) == 3
    assert all(r["pred"] in ("A", "B", None) or r["pred"] is not None
               for r in recs)
    assert all("output_text" in r for r in recs)
