"""Hybrid backbone: decode path must agree with full-sequence forward."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.cache import init_nano_cache
from timeviper_tpu.models.nano import (
    init_nano_params,
    nano_decode_step,
    nano_forward,
)

CFG = tiny_nano_config()


def test_forward_shapes_and_loss_inputs():
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, CFG.vocab_size)
    out = nano_forward(params, CFG, input_ids=ids)
    assert out["logits"].shape == (2, 24, CFG.vocab_size)
    assert out["logits"].dtype == jnp.float32


def test_decode_matches_full_forward():
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 21), 0, CFG.vocab_size)
    full = nano_forward(params, CFG, input_ids=ids)

    prefill_len = 17
    out = nano_forward(params, CFG, input_ids=ids[:, :prefill_len],
                       fill_cache=True, cache_max_len=32)
    cache = out["cache"]
    # pad attention kv caches up to max_len happens inside; check logits agree
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(full["logits"][:, :prefill_len]),
        rtol=5e-3, atol=5e-3)
    logits_t = None
    for t in range(prefill_len, 21):
        logits_t, cache = nano_decode_step(params, CFG, ids[:, t : t + 1], cache)
        np.testing.assert_allclose(
            np.asarray(logits_t), np.asarray(full["logits"][:, t]),
            rtol=5e-3, atol=5e-3)


def test_packed_segments_isolated():
    """Two packed sequences == the same sequences run separately."""
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    a = jax.random.randint(jax.random.PRNGKey(2), (1, 9), 0, CFG.vocab_size)
    b = jax.random.randint(jax.random.PRNGKey(3), (1, 13), 0, CFG.vocab_size)
    packed = jnp.concatenate([a, b], axis=1)
    seq_idx = jnp.concatenate(
        [jnp.zeros((1, 9), jnp.int32), jnp.ones((1, 13), jnp.int32)], axis=1)
    out_packed = nano_forward(params, CFG, input_ids=packed, seq_idx=seq_idx)
    out_a = nano_forward(params, CFG, input_ids=a)
    out_b = nano_forward(params, CFG, input_ids=b)
    np.testing.assert_allclose(np.asarray(out_packed["logits"][:, :9]),
                               np.asarray(out_a["logits"]), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_packed["logits"][:, 9:]),
                               np.asarray(out_b["logits"]), rtol=5e-3, atol=5e-3)


def test_remat_matches():
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 16), 0, CFG.vocab_size)
    out1 = nano_forward(params, CFG, input_ids=ids)
    out2 = nano_forward(params, CFG, input_ids=ids, remat=True)
    np.testing.assert_allclose(np.asarray(out1["logits"]),
                               np.asarray(out2["logits"]), rtol=1e-5, atol=1e-5)


def test_remat_policies_grads_identical():
    """Every remat_policy computes the SAME gradients — a policy only
    changes what the backward rebuild recomputes vs reads back (the
    measured throughput A/B lives in BENCH_SUITE train_fwdbwd rows)."""
    params = init_nano_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 32), 0, CFG.vocab_size)

    def loss(p, pol):
        out = nano_forward(p, CFG, input_ids=ids, remat=True,
                           remat_policy=pol)
        lp = jax.nn.log_softmax(out["logits"][:, :-1], axis=-1)
        return -jnp.take_along_axis(lp, ids[:, 1:, None], axis=-1).mean()

    ref = jax.grad(lambda p: loss(p, "full"))(params)
    for pol in ("scan", "dots", "dots_scan"):
        g = jax.grad(lambda p, pol=pol: loss(p, pol))(params)
        # allclose, not array_equal: XLA may fuse saved-vs-recomputed
        # chains differently across backends/versions; the invariant is
        # same-function, not same-rounding (today's CPU run IS bitwise
        # equal, but that is not a guarantee worth pinning)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
            ref, g)
    # the string-threaded form (remat="dots") is the same as the kwarg
    g2 = jax.grad(lambda p: nano_forward(
        p, CFG, input_ids=ids, remat="dots")["logits"].sum())(params)
    assert jax.tree_util.tree_structure(g2) == jax.tree_util.tree_structure(ref)
