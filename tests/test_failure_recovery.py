"""Failure handling: crash-save, data retry, eval resume (SURVEY.md §5.3)."""

import json
import os

import numpy as np
import pytest


def test_trainer_emergency_save_on_crash(tmp_path):
    import jax
    import jax.numpy as jnp

    from tests.test_train_loop import _make_arch, _make_batches
    from timeviper_tpu.models.vlm import init_vlm_params
    from timeviper_tpu.train.optim import OptimConfig
    from timeviper_tpu.train.trainer import Trainer, TrainerConfig

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    run_dir = str(tmp_path / "run")
    trainer = Trainer(
        arch, params,
        OptimConfig(learning_rate=1e-3, total_steps=10, schedule="constant"),
        TrainerConfig(run_dir=run_dir, max_steps=10, save_every=100,
                      data_parallel=1, model_parallel=1, resume=False),
    )

    batches = _make_batches(arch, 3)

    def exploding():
        yield batches[0]
        yield batches[1]
        raise RuntimeError("injected data failure")

    with pytest.raises(RuntimeError, match="injected"):
        trainer.train(exploding())
    # emergency checkpoint written at the crash step (reference
    # train.py:515-528 semantics)
    cks = [d for d in os.listdir(run_dir) if d.startswith("checkpoint-")]
    assert cks, os.listdir(run_dir)


def test_dataset_retry_substitutes_corrupt_sample(tmp_path, monkeypatch):
    import timeviper_tpu.data.video as video_mod
    from tests.test_eval_cli import _fake_load_video, _make_tokenizer
    from timeviper_tpu.data.conversation import CONV_TEMPLATES
    from timeviper_tpu.data.datasets import BaseMultimodalDataset, DatasetConfig
    from timeviper_tpu.data.image_processing import ImageTransform
    from timeviper_tpu.data.processor import Processor

    calls = {"n": 0}

    def flaky_load_video(path, **kw):
        calls["n"] += 1
        if "bad" in path:
            raise OSError("corrupt video")
        return _fake_load_video(path, **kw)

    monkeypatch.setattr(video_mod, "load_video", flaky_load_video)
    tok = _make_tokenizer(tmp_path)
    processor = Processor.build(
        tok, ImageTransform(28, (0.5,) * 3, (0.5,) * 3), "nano")
    items = [
        {"video": "bad.mp4", "conversations": [
            {"from": "human", "value": "what color"},
            {"from": "gpt", "value": "blue ."}]},
        {"video": "good.mp4", "conversations": [
            {"from": "human", "value": "what color"},
            {"from": "gpt", "value": "red ."}]},
    ]
    jpath = tmp_path / "d.json"
    with open(jpath, "w") as f:
        json.dump(items, f)
    ds = BaseMultimodalDataset(
        DatasetConfig(json_path=str(jpath), sampling="uniform", num_frames=2),
        processor, CONV_TEMPLATES["nano_base"],
    )
    # index 0 is corrupt -> retry machinery must eventually return the good
    # substitute instead of raising (random substitution; 2-item dataset)
    np.random.seed(0)
    import random

    random.seed(3)
    out = ds[0]
    assert out["pixels"] is not None
    assert calls["n"] >= 2  # at least one failed attempt + one substitute
