"""Heterogeneous-batch collation: rows with different image-token layouts
batch together (reference splices raggedly per row, generic_vlm.py:517-564;
here per-row plans travel as data over one compiled program)."""

import numpy as np
import pytest

from timeviper_tpu.config import VLMConfig, tiny_nano_config, tiny_vit_config
from timeviper_tpu.data.fusion import HeteroPlan, fuse_labels, plan_fusion
from timeviper_tpu.data.loader import collate
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params, vlm_loss

IMG = 500


def _arch(llm_family="nano"):
    if llm_family == "nano":
        llm = tiny_nano_config()
    else:
        from timeviper_tpu.config import tiny_qwen2_config

        llm = tiny_qwen2_config()
    return VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=llm,
        llm_family=llm_family,
    )


def _items(rng):
    # two rows with DIFFERENT lengths, frame counts and image positions
    a_ids = np.asarray([5, 6, IMG, IMG, 9, 10, 11, 12])
    b_ids = np.asarray([5, IMG, 9, 10, 11])
    return [
        {
            "input_ids": a_ids,
            "labels": np.asarray([-100] * 5 + [10, 11, 12]),
            "pixels": rng.standard_normal((2, 28, 28, 3)).astype(np.float32),
        },
        {
            "input_ids": b_ids,
            "labels": np.asarray([-100] * 2 + [9, 10, 11]),
            "pixels": rng.standard_normal((1, 28, 28, 3)).astype(np.float32),
        },
    ]


def test_collate_detects_hetero_and_pads():
    items = _items(np.random.default_rng(0))
    arch = _arch()
    cb = collate(items, IMG, arch.tokens_per_frame)
    assert isinstance(cb.plan, HeteroPlan)
    B = 2
    assert cb.batch["input_ids"].shape == (B, 8)
    assert cb.batch["gather_idx"].shape == cb.batch["seq_idx"].shape
    assert cb.batch["pixels"].shape[:2] == (B, 2)
    # row B's pad tail must sit in a fresh segment
    seq_b = cb.batch["seq_idx"][1]
    assert seq_b[-1] > seq_b[0]
    # labels padded with IGNORE
    assert (cb.batch["labels"][1][cb.plan.fused_len - 2:] == -100).all()


def test_collate_homogeneous_stays_static():
    rng = np.random.default_rng(0)
    items = _items(rng)
    items[1] = dict(items[0], pixels=rng.standard_normal(
        (2, 28, 28, 3)).astype(np.float32))
    arch = _arch()
    cb = collate(items, IMG, arch.tokens_per_frame)
    assert not isinstance(cb.plan, HeteroPlan)
    assert "gather_idx" not in cb.batch


@pytest.mark.parametrize("family", ["nano", "qwen2"])
def test_hetero_loss_matches_per_row_static(family):
    import jax
    import jax.numpy as jnp

    from timeviper_tpu.train.step import _make_loss_fn

    arch = _arch(family)
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    items = _items(np.random.default_rng(1))
    cb = collate(items, IMG, arch.tokens_per_frame)
    assert isinstance(cb.plan, HeteroPlan)

    loss_fn = _make_loss_fn(arch, cb.plan, use_pdrop=False, remat=False)
    batch = {k: jnp.asarray(v) for k, v in cb.batch.items()}
    hetero_loss, _ = jax.jit(loss_fn)(params, batch)

    # oracle: each row through the STATIC single-row path
    per_row = []
    for it in items:
        plan = plan_fusion(it["input_ids"], IMG, arch.tokens_per_frame)
        row = {
            "input_ids": jnp.asarray(np.where(
                it["input_ids"] == IMG, 0, it["input_ids"]).astype(np.int32)),
            "labels": jnp.asarray(
                fuse_labels(plan, it["labels"]).astype(np.int32)),
            "pixels": jnp.asarray(it["pixels"]),
        }
        loss, _ = vlm_loss(params, arch, row, plan, remat=False)
        per_row.append(float(loss))
    np.testing.assert_allclose(
        float(hetero_loss), np.mean(per_row), rtol=2e-4, atol=1e-5)


def test_hetero_batch_trains(tmp_path):
    import jax
    import jax.numpy as jnp

    from timeviper_tpu.train.optim import OptimConfig
    from timeviper_tpu.train.trainer import Trainer, TrainerConfig

    arch = _arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    cfg = TrainerConfig(run_dir=str(tmp_path / "run"), max_steps=2,
                        save_every=100, data_parallel=1, model_parallel=1,
                        resume=False)
    tr = Trainer(arch, params, OptimConfig(
        learning_rate=3e-3, total_steps=2, schedule="constant"), cfg)
    cb = collate(_items(np.random.default_rng(2)), IMG, arch.tokens_per_frame)
    m1 = tr.train_step(cb)
    m2 = tr.train_step(cb)
    l1, l2 = float(np.asarray(m1["loss"])), float(np.asarray(m2["loss"]))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1
