"""End-to-end trainer: synthetic batches -> sharded steps -> ckpt/resume."""

import numpy as np
import pytest

from timeviper_tpu.config import VLMConfig, tiny_nano_config, tiny_vit_config
from timeviper_tpu.data.fusion import fuse_labels, plan_fusion
from timeviper_tpu.data.loader import CollatedBatch
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params
from timeviper_tpu.train.optim import OptimConfig
from timeviper_tpu.train.trainer import Trainer, TrainerConfig


def _make_arch():
    return VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )


def _make_batches(arch, n, batch_size=2, seed=0):
    rng = np.random.default_rng(seed)
    img = 500
    ids = [5, 6, img, img, 9, 10, 11, 12]
    plan = plan_fusion(ids, img, arch.tokens_per_frame)
    out = []
    for i in range(n):
        rows_ids, rows_lab, rows_pix = [], [], []
        for _ in range(batch_size):
            labels = [-100] * 5 + [10, 11, 12]
            rows_ids.append(np.where(np.asarray(ids) == img, 0, ids))
            rows_lab.append(fuse_labels(plan, labels))
            rows_pix.append(
                rng.standard_normal((2, 28, 28, 3), dtype=np.float32))
        out.append(CollatedBatch(
            batch={
                "input_ids": np.stack(rows_ids).astype(np.int32),
                "labels": np.stack(rows_lab).astype(np.int32),
                "pixels": np.stack(rows_pix),
            },
            plan=plan,
        ))
    return out


def test_train_loop_loss_decreases(tmp_path):
    import jax
    import jax.numpy as jnp

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    cfg = TrainerConfig(
        run_dir=str(tmp_path / "run"), max_steps=8, log_every=4,
        save_every=4, data_parallel=2, model_parallel=2, resume=False,
    )
    trainer = Trainer(arch, params, OptimConfig(
        learning_rate=3e-3, projector_lr=3e-3, total_steps=8,
        schedule="constant"), cfg)

    batches = _make_batches(arch, 8)
    losses = []
    for cb in batches:
        m = trainer.train_step(cb)
        losses.append(float(np.asarray(m["loss"])))
    assert all(np.isfinite(losses)), losses
    # same batch content each step -> loss must drop under training
    assert losses[-1] < losses[0], losses


def test_trainer_checkpoint_resume(tmp_path):
    import jax
    import jax.numpy as jnp

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    run_dir = str(tmp_path / "run")
    cfg = TrainerConfig(run_dir=run_dir, max_steps=4, log_every=2,
                        save_every=2, data_parallel=1, model_parallel=1,
                        resume=False)
    opt = OptimConfig(learning_rate=1e-3, total_steps=4, schedule="constant")
    trainer = Trainer(arch, params, opt, cfg)
    trainer.train(iter(_make_batches(arch, 4)))
    assert int(trainer.state.step) == 4

    # resume picks up the saved step
    trainer2 = Trainer(
        arch, params, opt,
        TrainerConfig(run_dir=run_dir, max_steps=4, save_every=2,
                      data_parallel=1, model_parallel=1, resume=True),
    )
    assert int(trainer2.state.step) == 4


def test_freeze_mask_keeps_frozen_params(tmp_path):
    import jax
    import jax.numpy as jnp

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    cfg = TrainerConfig(
        run_dir=str(tmp_path / "run"), max_steps=2, save_every=100,
        data_parallel=1, model_parallel=1, resume=False,
        trainable_modules="projector",
    )
    trainer = Trainer(arch, params, OptimConfig(
        learning_rate=1e-2, total_steps=2, schedule="constant"), cfg)
    before_vis = np.asarray(
        jax.device_get(trainer.state.params["vision_backbone"]["patch_embed"]["kernel"]))
    before_proj = np.asarray(
        jax.device_get(trainer.state.params["projector"]["fc1"]["kernel"]))
    for cb in _make_batches(arch, 2):
        trainer.train_step(cb)
    after_vis = np.asarray(
        jax.device_get(trainer.state.params["vision_backbone"]["patch_embed"]["kernel"]))
    after_proj = np.asarray(
        jax.device_get(trainer.state.params["projector"]["fc1"]["kernel"]))
    np.testing.assert_array_equal(before_vis, after_vis)
    assert not np.array_equal(before_proj, after_proj)


def test_grad_accumulation_matches_fused_step(tmp_path):
    """A=2 accumulation over two half-batches == one fused step over the
    full batch (grad of the mean over 2B rows equals the mean of the two
    microbatch grads)."""
    import jax
    import jax.numpy as jnp

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    opt = OptimConfig(learning_rate=1e-3, total_steps=2, schedule="constant")

    full = _make_batches(arch, 1, batch_size=4, seed=7)[0]
    micro = [
        CollatedBatch(
            batch={k: v[i * 2:(i + 1) * 2] for k, v in full.batch.items()},
            plan=full.plan,
        )
        for i in range(2)
    ]

    cfg_a = TrainerConfig(run_dir=str(tmp_path / "a"), max_steps=1,
                          save_every=100, data_parallel=1, model_parallel=1,
                          resume=False)
    tr_a = Trainer(arch, params, opt, cfg_a)
    tr_a.train_step(full)

    cfg_b = TrainerConfig(run_dir=str(tmp_path / "b"), max_steps=1,
                          save_every=100, data_parallel=1, model_parallel=1,
                          resume=False, grad_accum_steps=2)
    tr_b = Trainer(arch, params, opt, cfg_b)
    tr_b.train(iter(micro))

    assert int(tr_b.state.step) == 1
    flat_a = jax.tree_util.tree_leaves(tr_a.state.params)
    flat_b = jax.tree_util.tree_leaves(tr_b.state.params)
    for a, b in zip(flat_a, flat_b):
        # reduction order differs (mean over 4 rows vs mean-of-means); on
        # XLA:CPU alignment-dependent oneDNN kernels add last-bit noise —
        # margin tolerance, never bitwise (see tests/conftest.py notes)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


def test_grad_accumulation_leftover_applies(tmp_path):
    """3 microbatches with A=2: one full update + one leftover update."""
    import jax
    import jax.numpy as jnp

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    opt = OptimConfig(learning_rate=1e-3, total_steps=4, schedule="constant")
    cfg = TrainerConfig(run_dir=str(tmp_path / "c"), max_steps=10,
                        save_every=100, data_parallel=1, model_parallel=1,
                        resume=False, grad_accum_steps=2)
    tr = Trainer(arch, params, opt, cfg)
    tr.train(iter(_make_batches(arch, 3)))
    assert int(tr.state.step) == 2


def test_lora_trainable_modules_updates_extra_module(tmp_path):
    """LoRA mode + --trainable_modules projector trains the projector too.

    The reference's LoRA recipe (train.py:384-398) unfreezes listed modules
    in addition to the peft factors — that is what non_lora_trainables.bin
    carries (train_utils.py:150-158). A fresh projector must NOT stay
    frozen under `--lora_enable --trainable_modules projector`.
    """
    import jax
    import jax.numpy as jnp

    from timeviper_tpu.train.lora import add_lora, split_lora_state

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    params = add_lora(params, rank=2, key=jax.random.PRNGKey(1))
    cfg = TrainerConfig(
        run_dir=str(tmp_path / "run"), max_steps=2, save_every=100,
        data_parallel=1, model_parallel=1, resume=False,
        lora=True, trainable_modules="projector",
    )
    trainer = Trainer(arch, params, OptimConfig(
        learning_rate=1e-2, total_steps=2, schedule="constant"), cfg)

    def get(p):
        lora_b = [v for k, v in split_lora_state(p)[0].items()
                  if "lora_b" in k]
        return {
            "proj": np.asarray(jax.device_get(
                p["projector"]["fc1"]["kernel"])),
            "vis": np.asarray(jax.device_get(
                p["vision_backbone"]["patch_embed"]["kernel"])),
            "lora_b": float(sum(
                np.abs(np.asarray(jax.device_get(v))).sum()
                for v in lora_b)),
        }

    before = get(trainer.state.params)
    for cb in _make_batches(arch, 2):
        trainer.train_step(cb)
    after = get(trainer.state.params)

    assert not np.array_equal(before["proj"], after["proj"]), \
        "projector must train under lora + trainable_modules=projector"
    np.testing.assert_array_equal(before["vis"], after["vis"])
    assert after["lora_b"] > 0, "lora factors must also train"


def test_lora_bf16_factors_get_f32_moments(tmp_path):
    """QLoRA bf16 factors: grads cast to f32 and Adam moments init f32
    (bf16 second moments can't resolve eps=1e-8)."""
    import jax
    import jax.numpy as jnp

    from timeviper_tpu.train.lora import add_lora

    arch = _make_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    params = add_lora(params, rank=2, key=jax.random.PRNGKey(1),
                      dtype=jnp.bfloat16)
    cfg = TrainerConfig(
        run_dir=str(tmp_path / "run"), max_steps=1, save_every=100,
        data_parallel=1, model_parallel=1, resume=False, lora=True,
    )
    trainer = Trainer(arch, params, OptimConfig(
        learning_rate=1e-2, total_steps=1, schedule="constant"), cfg)

    moment_dtypes = {
        leaf.dtype
        for leaf in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    }
    assert jnp.bfloat16 not in moment_dtypes, moment_dtypes

    trainer.train_step(_make_batches(arch, 1)[0])
    moment_dtypes = {
        leaf.dtype
        for leaf in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    }
    assert jnp.bfloat16 not in moment_dtypes, moment_dtypes
