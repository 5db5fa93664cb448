"""Host-offloaded (layer-streamed) training vs on-device jax.grad+optax.

The streamed step recomputes each layer in the backward walk and applies
AdamW on host numpy — gradients and post-step params must match the
monolithic jitted step (VERDICT r3 ask #6: the zero3-offload analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.nano import (
    compute_logits,
    init_nano_params,
    nano_forward,
)
from timeviper_tpu.ops.norms import rms_norm  # noqa: F401 (parity of import path)
from timeviper_tpu.train.offload import HostAdamW, StreamedTrainer


def _ce_loss(params, cfg, ids, labels):
    out = nano_forward(params, cfg, input_ids=ids)
    logits = out["logits"][:, :, :]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(labels, 0, None)
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    m = (labels != -100).astype(jnp.float32)
    return (-(ll * m).sum()) / jnp.maximum(m.sum(), 1.0)


def test_streamed_step_matches_optax_adamw():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    params_np = jax.tree_util.tree_map(
        lambda x: np.array(x, np.float32), params)

    rng = np.random.default_rng(1)
    B, L = 2, 33
    ids = rng.integers(3, 500, (B, L)).astype(np.int32)
    labels = ids.copy()
    labels[:, :7] = -100  # prompt-masked prefix

    lr = 3e-4
    trainer = StreamedTrainer(cfg, params_np, lr=lr,
                              compute_dtype=jnp.float32)
    loss_streamed = trainer.train_step(ids, labels, shift=True)

    # reference: monolithic grad + optax.adamw on the SHIFTED batch
    ids_s = jnp.asarray(ids[:, :-1])
    lab_s = jnp.asarray(labels[:, 1:])
    loss_ref, grads = jax.jit(jax.value_and_grad(
        lambda p: _ce_loss(p, cfg, ids_s, lab_s)))(params)
    tx = optax.adamw(lr, weight_decay=0.0)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    want = optax.apply_updates(params, updates)

    assert abs(loss_streamed - float(loss_ref)) < 2e-4, (
        loss_streamed, float(loss_ref))
    flat_w, _ = jax.tree_util.tree_flatten(want)
    flat_g, _ = jax.tree_util.tree_flatten(
        jax.tree_util.tree_map(jnp.asarray, params_np))
    for a, b in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_streamed_two_steps_loss_decreases():
    cfg = tiny_nano_config(num_hidden_layers=4, hybrid_override_pattern="M-*-")
    params = init_nano_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    params_np = jax.tree_util.tree_map(
        lambda x: np.array(x, np.float32), params)
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 500, (1, 48)).astype(np.int32)
    labels = ids.copy()
    trainer = StreamedTrainer(cfg, params_np, lr=3e-3,
                              compute_dtype=jnp.float32)
    l0 = trainer.train_step(ids, labels)
    for _ in range(3):
        l1 = trainer.train_step(ids, labels)
    assert l1 < l0, (l0, l1)


def test_host_adamw_matches_optax_moments():
    p = {"w": np.array([1.0, -2.0, 0.5], np.float32)}
    g = {"w": np.array([0.1, -0.2, 0.3], np.float32)}
    opt = HostAdamW(p, lr=1e-2, weight_decay=0.01)

    # copy() matters: on the CPU backend jnp.asarray zero-copy aliases
    # the numpy buffer, and HostAdamW mutates p["w"] IN PLACE — without
    # the copy this test flaked under load with the optax side reading
    # post-update values (exactly the hazard train/offload.py:_stage
    # guards against in the production path)
    pj = {"w": jnp.asarray(p["w"].copy())}
    tx = optax.adamw(1e-2, weight_decay=0.01)
    st = tx.init(pj)
    for _ in range(3):
        opt.step += 1
        opt.update_tree(p, opt.mu, opt.nu, g)
        upd, st = tx.update({"w": jnp.asarray(g["w"])}, st, pj)
        pj = optax.apply_updates(pj, upd)
    np.testing.assert_allclose(p["w"], np.asarray(pj["w"]), rtol=1e-6,
                               atol=1e-7)
