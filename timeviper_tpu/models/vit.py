"""ViT vision backbones (SigLIP / DINOv2 families) — TPU-native functional.

Replaces the reference's timm-backed TimmViTBackbone (timeviper/model/vit/
base_vision.py:126-294). The defining behaviour is preserved: features are
the *penultimate* transformer block's patch tokens — no final norm, prefix
(CLS/register) tokens dropped — matching the timm monkey-patch
``get_intermediate_layers(n={len(blocks)-2})`` at base_vision.py:165-170.

Pre-norm ViT blocks; LayerScale for DINOv2. Position embeddings are learned
and bicubic-resized when the input grid differs from the checkpoint grid.
All matmuls are batched (frames fold into the batch axis) and bf16 by
default — MXU-friendly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from timeviper_tpu.config import ViTConfig


def _linear(key, d_in, d_out, dtype, std=0.02, bias=True):
    p = {"kernel": (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _apply_linear(p, x):
    if "kernel_q" in p:
        import os

        from timeviper_tpu.ops.int8_linear import apply_linear_w8a8

        # W8A8 with static calibrated activation scales (the measured-fast
        # int8 path on TPU — rationale in ops/int8_linear.py). Off-TPU, or
        # for uncalibrated leaves, weight-only dequantization (exact).
        mode = os.environ.get("TIMEVIPER_VIT_INT8_MXU", "auto")
        use_mxu = (jax.default_backend() in ("tpu", "axon")
                   if mode == "auto" else mode == "1")
        return apply_linear_w8a8(p, x, use_int8_mxu=use_mxu)
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def _layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _act(name):
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


def init_vit_params(key, cfg: ViTConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_hidden_layers + 4)
    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 6)
        layer = {
            "norm1": {"weight": jnp.ones((d,), jnp.float32),
                      "bias": jnp.zeros((d,), jnp.float32)},
            "attn": {
                "qkv": _linear(ks[0], d, 3 * d, dtype, bias=cfg.qkv_bias),
                "proj": _linear(ks[1], d, d, dtype),
            },
            "norm2": {"weight": jnp.ones((d,), jnp.float32),
                      "bias": jnp.zeros((d,), jnp.float32)},
            "mlp": {
                "fc1": _linear(ks[2], d, cfg.intermediate_size, dtype),
                "fc2": _linear(ks[3], cfg.intermediate_size, d, dtype),
            },
        }
        if cfg.use_layer_scale:
            layer["ls1"] = {"gamma": jnp.full((d,), cfg.layer_scale_init, jnp.float32)}
            layer["ls2"] = {"gamma": jnp.full((d,), cfg.layer_scale_init, jnp.float32)}
        layers.append(layer)
    params = {
        "patch_embed": {
            "kernel": (jax.random.normal(
                keys[-4], (cfg.patch_size, cfg.patch_size, 3, d)) * 0.02
            ).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        # pos embed covers PATCHES ONLY (timm `no_embed_class` semantics:
        # DINOv2-reg4 and SigLIP both store (1, num_patches, D); cls/reg
        # tokens are prepended after the pos add)
        "pos_embed": (jax.random.normal(
            keys[-3], (1, cfg.num_patches, d)) * 0.02
        ).astype(jnp.float32),
        "layers": layers,
    }
    if cfg.use_class_token:
        params["cls_token"] = jnp.zeros((1, 1, d), jnp.float32)
    if cfg.num_register_tokens:
        params["reg_tokens"] = jnp.zeros(
            (1, cfg.num_register_tokens, d), jnp.float32)
    return params


def _resize_pos_embed(pos, cfg: ViTConfig, grid: int) -> jax.Array:
    """Bicubic-resize patch position embeddings to a new grid.
    pos: (1, num_patches, D) — patches only (no prefix entries)."""
    g0 = int(round(pos.shape[1] ** 0.5))
    if g0 == grid:
        return pos
    d = pos.shape[-1]
    patch = pos.reshape(1, g0, g0, d)
    patch = jax.image.resize(patch, (1, grid, grid, d), method="cubic")
    return patch.reshape(1, grid * grid, d)


def vit_forward(
    params: Dict[str, Any], cfg: ViTConfig, pixels: jax.Array
) -> jax.Array:
    """pixels: (B, H, W, 3) -> penultimate-block patch features (B, P, D)."""
    B, H, W, _ = pixels.shape
    grid = H // cfg.patch_size
    # Patchify as an extract-patches + matmul instead of a conv: with
    # C_in=3 XLA's conv path can't tile the (14,14,3) taps onto the MXU
    # and runs ~100x off peak (measured 53 ms per 64 frames on v5e vs
    # 0.8 ms for this formulation). The reshape/transpose is pure layout;
    # the (B*P, p*p*3) @ (p*p*3, D) matmul is MXU-shaped. Exactly equals
    # the VALID-padding strided conv (margin pixels beyond grid*patch are
    # dropped, matching timm).
    p = cfg.patch_size
    kernel = params["patch_embed"]["kernel"]
    crop = pixels[:, : grid * p, : grid * p].astype(kernel.dtype)
    patches = (
        crop.reshape(B, grid, p, grid, p, 3)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, grid * grid, p * p * 3)
    )
    x = jnp.einsum(
        "bpk,kd->bpd", patches, kernel.reshape(p * p * 3, cfg.hidden_size))
    x = x + params["patch_embed"]["bias"].astype(x.dtype)

    prefix = []
    if cfg.use_class_token:
        prefix.append(jnp.broadcast_to(
            params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size)))
    if cfg.num_register_tokens:
        prefix.append(jnp.broadcast_to(
            params["reg_tokens"].astype(x.dtype),
            (B, cfg.num_register_tokens, cfg.hidden_size)))
    # timm no_embed_class order: patches + pos first, then prepend cls/regs
    pos = _resize_pos_embed(params["pos_embed"], cfg, grid)
    x = x + pos.astype(x.dtype)
    toks = prefix + [x]
    x = jnp.concatenate(toks, axis=1) if len(toks) > 1 else toks[0]

    act = _act(cfg.hidden_act)
    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh

    # Non-causal attention. ViT sequences are short (T ≈ 729-1024), so the
    # whole-frame Pallas kernel (ops/vit_attention.py) computes exact
    # softmax attention with the (T, T) scores resident in VMEM — measured
    # ~3x faster than the streaming flash kernel at SigLIP shapes. The
    # shared dispatcher streams longer sequences through the flash kernel
    # and falls back to the jnp oracle on CPU.
    from timeviper_tpu.ops.vit_attention import encoder_attention_qkv

    if _use_fused_ln(cfg):
        return _vit_blocks_fused_ln(params, cfg, x, act, nh, hd)

    # penultimate-layer features: run blocks [0, L-2), i.e. skip the last block
    for layer in params["layers"][: cfg.num_hidden_layers - 1]:
        res = x
        n = _layer_norm(x, layer["norm1"], cfg.layer_norm_eps)
        qkv = _apply_linear(layer["attn"]["qkv"], n)
        out = encoder_attention_qkv(qkv, nh, hd)
        out = _apply_linear(layer["attn"]["proj"], out)
        if "ls1" in layer:
            out = out * layer["ls1"]["gamma"].astype(out.dtype)
        x = res + out
        res = x
        n = _layer_norm(x, layer["norm2"], cfg.layer_norm_eps)
        out = _apply_linear(layer["mlp"]["fc2"], act(_apply_linear(layer["mlp"]["fc1"], n)))
        if "ls2" in layer:
            out = out * layer["ls2"]["gamma"].astype(out.dtype)
        x = res + out
    return x[:, cfg.num_prefix_tokens :]


def _use_fused_ln(cfg: ViTConfig) -> bool:
    import os

    from timeviper_tpu.ops.int8_linear import ACT_AMAX_SINK
    from timeviper_tpu.ops.layernorm import fused_ln_supported

    # default OFF until the on-chip A/B lands (same discipline as the
    # fused conv+scan kernel: unmeasured fusions don't ship enabled)
    mode = os.environ.get("TIMEVIPER_VIT_FUSED_LN", "0")
    if mode != "1" or ACT_AMAX_SINK is not None:
        # calibration capture must see the bf16 LN output through
        # apply_linear_w8a8's amax sink — take the reference loop
        return False
    return fused_ln_supported(cfg.hidden_size)


def _vit_blocks_fused_ln(params, cfg, x, act, nh, hd):
    """Encoder blocks with residual-add + LayerNorm (+ W8A8 activation
    quantize) fused into one Pallas pass per norm (ops/layernorm.py). Same
    math as the reference loop in `vit_forward` — the residual add moves
    inside the kernel, and when a following projection is W8A8-calibrated
    the normalized activation goes straight to int8 without a bf16
    round-trip."""
    from timeviper_tpu.ops.int8_linear import w8a8_matmul_prequant
    from timeviper_tpu.ops.layernorm import fused_ln
    from timeviper_tpu.ops.vit_attention import encoder_attention_qkv

    eps = cfg.layer_norm_eps

    def inv_of(leaf):
        return leaf["act_inv"] if ("kernel_q" in leaf and "act_inv" in leaf) \
            else None

    def matmul(leaf, n, inv):
        if inv is not None:
            return w8a8_matmul_prequant(leaf, n, x.dtype)
        return _apply_linear(leaf, n)

    pending = None  # (res, delta): residual add owed to the next norm
    for layer in params["layers"][: cfg.num_hidden_layers - 1]:
        qkv_p = layer["attn"]["qkv"]
        inv1 = inv_of(qkv_p)
        if pending is None:
            n = fused_ln(x, layer["norm1"]["weight"], layer["norm1"]["bias"],
                         eps=eps, act_inv=inv1)
        else:
            x, n = fused_ln(
                pending[1], layer["norm1"]["weight"], layer["norm1"]["bias"],
                eps=eps, residual=pending[0], act_inv=inv1)
        qkv = matmul(qkv_p, n, inv1)
        out = encoder_attention_qkv(qkv, nh, hd)
        out = _apply_linear(layer["attn"]["proj"], out)
        if "ls1" in layer:
            out = out * layer["ls1"]["gamma"].astype(out.dtype)

        fc1_p = layer["mlp"]["fc1"]
        inv2 = inv_of(fc1_p)
        x, n = fused_ln(out, layer["norm2"]["weight"], layer["norm2"]["bias"],
                        eps=eps, residual=x, act_inv=inv2)
        h = _apply_linear(layer["mlp"]["fc2"], act(matmul(fc1_p, n, inv2)))
        if "ls2" in layer:
            h = h * layer["ls2"]["gamma"].astype(h.dtype)
        pending = (x, h)
    x = pending[0] + pending[1] if pending is not None else x
    return x[:, cfg.num_prefix_tokens :]
