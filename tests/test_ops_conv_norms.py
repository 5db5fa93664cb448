"""Causal conv1d + norms vs. straightforward numpy references."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.ops.conv import causal_conv1d, causal_conv1d_update, init_conv_state
from timeviper_tpu.ops.norms import gated_rms_norm, rms_norm


def np_causal_conv(x, w, b):
    B, L, C = x.shape
    K = w.shape[-1]
    xp = np.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    y = np.zeros_like(x)
    for t in range(L):
        y[:, t] = np.sum(xp[:, t : t + K].transpose(0, 2, 1) * w, axis=-1)
    return y + b


def silu(x):
    return x / (1 + np.exp(-x))


def test_causal_conv1d_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 11, 6).astype(np.float32)
    w = rng.randn(6, 4).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    y = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y), silu(np_causal_conv(x, w, b)),
                               rtol=1e-5, atol=1e-5)


def test_causal_conv1d_segment_reset():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 20, 4).astype(np.float32)
    w = rng.randn(4, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    seq_idx = jnp.asarray(np.repeat([[0, 1]], [12, 8], axis=1).reshape(1, 20))
    seq_idx = jnp.concatenate([jnp.zeros((1, 12), jnp.int32),
                               jnp.ones((1, 8), jnp.int32)], axis=1)
    y = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), seq_idx=seq_idx)
    # second segment must equal conv over it alone
    y2 = causal_conv1d(jnp.asarray(x[:, 12:]), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y[:, 12:]), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


def test_conv_update_matches_prefill():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 9, 5).astype(np.float32)
    w = rng.randn(5, 4).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    y_full = causal_conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    state = init_conv_state(jnp.asarray(x[:, :6]), 4)
    ys = []
    for t in range(6, 9):
        y_t, state = causal_conv1d_update(jnp.asarray(x[:, t]), state,
                                          jnp.asarray(w), jnp.asarray(b))
        ys.append(y_t)
    np.testing.assert_allclose(np.stack([np.asarray(v) for v in ys], 1),
                               np.asarray(y_full[:, 6:]), rtol=1e-5, atol=1e-5)


def test_rms_norm():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 16).astype(np.float32)
    w = rng.randn(16).astype(np.float32)
    y = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5)
    ref = w * x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_gated_group_rms_norm():
    rng = np.random.RandomState(4)
    x = rng.randn(3, 24).astype(np.float32)
    g = rng.randn(3, 24).astype(np.float32)
    w = rng.randn(24).astype(np.float32)
    y = gated_rms_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(w),
                       eps=1e-5, group_size=8)
    xg = (x * silu(g)).reshape(3, 3, 8)
    ref = (xg / np.sqrt((xg ** 2).mean(-1, keepdims=True) + 1e-5)).reshape(3, 24) * w
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_gated_rms_norm_mm_impl_matches_reshape():
    """The one-hot-matmul grouping (the TPU fast path; auto-selected only
    on tpu/axon backends, so the CPU suite must force it) computes the
    same function as the reshape path and the exact-f32 oracle."""
    rng = np.random.RandomState(5)
    x = rng.randn(2, 17, 64).astype(np.float32)
    g = rng.randn(2, 17, 64).astype(np.float32)
    w = rng.randn(64).astype(np.float32)

    # bf16 inputs: mm vs reshape must agree within bf16 noise
    xb, gb = jnp.asarray(x, jnp.bfloat16), jnp.asarray(g, jnp.bfloat16)
    y_mm = gated_rms_norm(xb, gb, jnp.asarray(w), group_size=16, impl="mm")
    y_rs = gated_rms_norm(xb, gb, jnp.asarray(w), group_size=16,
                          impl="reshape")
    np.testing.assert_allclose(
        np.asarray(y_mm, np.float32), np.asarray(y_rs, np.float32),
        rtol=0.05, atol=0.05)

    # and both track the exact-f32 path
    y_f32 = gated_rms_norm(jnp.asarray(x), jnp.asarray(g), jnp.asarray(w),
                           group_size=16)
    err = np.sqrt(np.mean((np.asarray(y_mm, np.float32)
                           - np.asarray(y_f32)) ** 2)
                  / np.mean(np.asarray(y_f32) ** 2))
    assert err < 0.02, err

    # gradients flow through the selector matmuls (training uses this path)
    def loss(xx):
        return (gated_rms_norm(xx, gb.astype(jnp.float32),
                               jnp.asarray(w), group_size=16,
                               impl="mm") ** 2).mean()

    gr = jax.grad(loss)(jnp.asarray(x))
    assert np.isfinite(np.asarray(gr)).all()
