"""Fused residual+LayerNorm(+int8 quantize) kernel vs jnp (interpret mode),
and the fused-LN ViT block path vs the reference block loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from timeviper_tpu.ops.layernorm import fused_ln, fused_ln_supported


def _ln_ref(x, w, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * w.astype(jnp.float32) + b.astype(jnp.float32)


def test_fused_ln_plain_matches_jnp():
    D = 256
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 37, D), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (D,)) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (D,)) * 0.1
    got = fused_ln(x, w, b, eps=1e-6, interpret=True)
    want = _ln_ref(x, w, b).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_ln_residual_and_quant():
    D = 128
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    res = jax.random.normal(k[0], (2, 50, D), jnp.float32)
    out = jax.random.normal(k[1], (2, 50, D), jnp.float32)
    w = jax.random.normal(k[2], (D,)) * 0.2 + 1.0
    b = jax.random.normal(k[3], (D,)) * 0.1
    inv = jnp.float32(127.0 / 5.0)

    x_new, yq = fused_ln(out, w, b, eps=1e-6, residual=res, act_inv=inv,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(x_new), np.asarray(res + out),
                               rtol=1e-6, atol=1e-6)
    y = _ln_ref(res + out, w, b)
    want_q = np.clip(np.round(np.asarray(y * inv)), -127, 127).astype(np.int8)
    assert yq.dtype == jnp.int8
    # ties at .5 may round either way across impls; allow off-by-one there
    diff = np.abs(np.asarray(yq, np.int32) - want_q.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-2


def test_fused_ln_grad_matches_jnp():
    """The custom VJP (Pallas fwd, jnp LN-gradient bwd) vs jax.grad of the
    plain jnp LayerNorm — plain and residual variants."""
    D = 128
    k = jax.random.split(jax.random.PRNGKey(9), 4)
    x = jax.random.normal(k[0], (2, 24, D), jnp.float32)
    res = jax.random.normal(k[1], (2, 24, D), jnp.float32)
    w = jax.random.normal(k[2], (D,)) * 0.2 + 1.0
    b = jax.random.normal(k[3], (D,)) * 0.1

    def loss_fused(x, res, w, b):
        x_new, y = fused_ln(x, w, b, eps=1e-6, residual=res)
        return (y ** 2).mean() + (x_new ** 3).mean()

    def loss_ref(x, res, w, b):
        x_new = res + x
        y = _ln_ref(x_new, w, b)
        return (y.astype(x.dtype) ** 2).mean() + (x_new ** 3).mean()

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, res, w, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, res, w, b)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=1e-4, atol=1e-5)

    def loss_fused_plain(x, w, b):
        return (fused_ln(x, w, b, eps=1e-6) ** 2).mean()

    def loss_ref_plain(x, w, b):
        return (_ln_ref(x, w, b).astype(x.dtype) ** 2).mean()

    got = jax.grad(loss_fused_plain, argnums=(0, 1, 2))(x, w, b)
    want = jax.grad(loss_ref_plain, argnums=(0, 1, 2))(x, w, b)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=1e-4, atol=1e-5)


def test_vit_fused_ln_path_grad():
    """vit_forward differentiates through the fused-LN path (bf16/f32
    variant; the int8 variant is inference-only by construction)."""
    import os

    from timeviper_tpu.config import ViTConfig
    from timeviper_tpu.models.vit import init_vit_params, vit_forward

    cfg = ViTConfig(
        image_size=56, patch_size=14, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu_tanh",
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3), jnp.float32)

    def loss(p):
        return (vit_forward(p, cfg, px).astype(jnp.float32) ** 2).mean()

    g_plain = jax.grad(loss)(params)
    os.environ["TIMEVIPER_VIT_FUSED_LN"] = "1"
    try:
        g_fused = jax.grad(loss)(params)
    finally:
        os.environ.pop("TIMEVIPER_VIT_FUSED_LN", None)
    for a, b_ in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5)


def test_fused_ln_supported():
    assert fused_ln_supported(1152) and fused_ln_supported(1024)
    assert not fused_ln_supported(1408 + 8) and not fused_ln_supported(72)


def test_vit_fused_ln_path_matches_reference_loop(monkeypatch):
    """TIMEVIPER_VIT_FUSED_LN=1 (interpret on CPU) must equal the plain
    block loop — bf16 params, the production SigLIP-shaped dims scaled
    down, class token + penultimate-layer semantics included."""
    from timeviper_tpu.config import ViTConfig
    from timeviper_tpu.models.vit import init_vit_params, vit_forward

    cfg = ViTConfig(
        image_size=56, patch_size=14, hidden_size=128, intermediate_size=256,
        num_hidden_layers=3, num_attention_heads=2, hidden_act="gelu_tanh",
    )
    params = init_vit_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    pixels = jax.random.normal(jax.random.PRNGKey(1),
                               (2, 56, 56, 3), jnp.float32)

    monkeypatch.setenv("TIMEVIPER_VIT_FUSED_LN", "0")
    want = vit_forward(params, cfg, pixels)
    monkeypatch.setenv("TIMEVIPER_VIT_FUSED_LN", "1")
    got = vit_forward(params, cfg, pixels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_vit_fused_ln_path_int8_close_to_plain_int8(monkeypatch):
    """W8A8 + fused-LN quantize vs W8A8 through the plain loop: the only
    difference is f32-vs-bf16 rounding before quantization, so outputs
    stay within the int8 quantization noise floor."""
    from timeviper_tpu.config import ViTConfig
    from timeviper_tpu.models.vit import init_vit_params, vit_forward
    from timeviper_tpu.train.quantize import (
        calibrate_act_scales, quantize_params_int8)

    cfg = ViTConfig(
        image_size=56, patch_size=14, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu_tanh",
    )
    params = quantize_params_int8(
        init_vit_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    pixels = jax.random.normal(jax.random.PRNGKey(1),
                               (2, 56, 56, 3), jnp.float32)
    params = calibrate_act_scales(
        lambda p, px: vit_forward(p, cfg, px), params, [pixels])

    monkeypatch.setenv("TIMEVIPER_VIT_FUSED_LN", "0")
    monkeypatch.setenv("TIMEVIPER_VIT_INT8_MXU", "1")
    want = np.asarray(vit_forward(params, cfg, pixels), np.float32)
    monkeypatch.setenv("TIMEVIPER_VIT_FUSED_LN", "1")
    got = np.asarray(vit_forward(params, cfg, pixels), np.float32)
    rms = np.sqrt(((got - want) ** 2).mean()) / (np.sqrt(
        (want ** 2).mean()) + 1e-9)
    assert rms < 3e-2, rms
