"""InternVideo2-1B video-native ViT-g — TPU-native functional implementation.

Re-design of the reference tower (timeviper/model/vit/internvideo2/
vit_scale_clean.py:464-740, model.py:118-198): clips of `num_frames` (4)
frames run through a tubelet patch embed, a CLS token and 3D sin-cos
position embeddings are added, then `depth + x_vis_return_idx + 1` (= 39
for -2) pre-norm blocks with RMSNorm, full-dim q/k RMSNorm
(vit_scale_clean.py:233-244), GELU MLP (ratio 48/11), and LayerScale.
Output is the patch tokens minus CLS (model.py:186-190).

The VLM reshapes (F, H, W, 3) frames into (F/4, 4, H, W, 3) clips; each
clip yields 4*16*16 tokens which the ToMe projector compresses jointly with
`local_num_frames=4` (reference generic_vlm.py:405-421).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import InternVideo2Config
from timeviper_tpu.ops.attention import attention
from timeviper_tpu.ops.vit_attention import encoder_attention
from timeviper_tpu.ops.norms import rms_norm


def _linear(key, d_in, d_out, dtype, bias=True):
    p = {"kernel": (jax.random.normal(key, (d_in, d_out)) * 0.02).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _apply_linear(p, x):
    if "kernel_q" in p:
        # same int8 dispatch as the timm ViT (models/vit.py): W8A8 with
        # calibrated static activation scales on TPU, weight-only
        # dequantization otherwise — so quantize_params_int8 +
        # calibrate_act_scales work on the IV2 tower too
        from timeviper_tpu.models.vit import _apply_linear as _vit_linear

        return _vit_linear(p, x)
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# 3D sin-cos position embedding (reference pos_embed.py:14-125)
# ---------------------------------------------------------------------------


def _sincos_1d(dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(
    embed_dim: int, grid_size: int, t_size: int, cls_token: bool = True
) -> np.ndarray:
    """(T*H*W [+1], D): spatial 3/4 of dims, temporal 1/4."""
    assert embed_dim % 4 == 0
    dim_s = embed_dim // 4 * 3
    dim_t = embed_dim // 4
    gh = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(gh, gh)  # (w, h) order per mae_st
    grid = np.stack(grid, axis=0).reshape(2, -1)
    emb_h = _sincos_1d(dim_s // 2, grid[0])
    emb_w = _sincos_1d(dim_s // 2, grid[1])
    pos_s = np.concatenate([emb_h, emb_w], axis=1)  # (H*W, dim_s)
    pos_t = _sincos_1d(dim_t, np.arange(t_size, dtype=np.float64))
    pos_t = np.repeat(pos_t[:, None, :], grid_size * grid_size, axis=1)
    pos_s = np.repeat(pos_s[None, :, :], t_size, axis=0)
    pos = np.concatenate([pos_t, pos_s], axis=-1).reshape(-1, embed_dim)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos


def _linear_resize_axis(x: np.ndarray, axis: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) semantics."""
    x = np.moveaxis(x, axis, 0)
    n = x.shape[0]
    center = np.clip(
        (np.arange(out_size, dtype=np.float64) + 0.5) * n / out_size - 0.5,
        0.0, n - 1)
    lo = np.floor(center).astype(int)
    hi = np.minimum(lo + 1, n - 1)
    frac = (center - lo).reshape(-1, *([1] * (x.ndim - 1)))
    y = (1.0 - frac) * x[lo] + frac * x[hi]
    return np.moveaxis(y, 0, axis)


def _bicubic_resize_axis(x: np.ndarray, axis: int, out_size: int) -> np.ndarray:
    """torch F.interpolate(mode='bicubic', align_corners=False) along one
    axis (separable): cubic convolution with A = -0.75 (torch's constant —
    jax.image.resize uses Keys A = -0.5, which diverges ~1e-3)."""
    A = -0.75
    x = np.moveaxis(x, axis, 0)
    n = x.shape[0]
    center = (np.arange(out_size, dtype=np.float64) + 0.5) * n / out_size - 0.5
    base = np.floor(center).astype(int)
    frac = center - base

    def k1(t):  # |t| <= 1
        return ((A + 2) * t - (A + 3)) * t * t + 1

    def k2(t):  # 1 < |t| < 2
        return ((A * t - 5 * A) * t + 8 * A) * t - 4 * A

    w = np.stack([k2(frac + 1), k1(frac), k1(1 - frac), k2(2 - frac)], 1)
    taps = np.clip(np.stack([base - 1, base, base + 1, base + 2], 1), 0, n - 1)
    y = np.einsum("ot,ot...->o...", w, x[taps])
    return np.moveaxis(y, 0, axis)


def interpolate_pos_embed(
    pos: np.ndarray,
    orig_t: int,
    new_t: int,
    new_grid: int,
    num_extra_tokens: int = 1,
) -> np.ndarray:
    """Resize a (1, orig_t*g²+extra, D) position table to
    (1, new_t*new_grid²+extra, D) — temporal linear then spatial bicubic,
    exactly matching the reference's load-time interpolation
    (pos_embed.py:125-203: checkpoints are pretrained at 8 frames / 224px).
    Extra (CLS) tokens pass through unchanged."""
    pos = np.asarray(pos, np.float64)
    D = pos.shape[-1]
    extra = pos[:, :num_extra_tokens]
    tok = pos[:, num_extra_tokens:]
    orig_grid = int(round((tok.shape[1] // orig_t) ** 0.5))
    tok = tok.reshape(orig_t, orig_grid, orig_grid, D)
    if orig_t != new_t:
        tok = _linear_resize_axis(tok, 0, new_t)
    if orig_grid != new_grid:
        tok = _bicubic_resize_axis(tok, 1, new_grid)
        tok = _bicubic_resize_axis(tok, 2, new_grid)
    tok = tok.reshape(1, new_t * new_grid * new_grid, D)
    return np.concatenate([extra, tok], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Attention pooling head (reference vit_scale_clean.py:140-150, 588-597):
# the CLIP-aligned pooled embedding. TimeViper's tower runs x_vis_only=True
# (model.py:169) so the VLM path never calls this, but full InternVideo2
# checkpoints carry it and retrieval-style use needs it.
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def init_attention_pool_params(
    key, cfg: InternVideo2Config, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    d = cfg.hidden_size
    out = cfg.clip_embed_dim
    ks = jax.random.split(key, 4)

    def ln():
        return {"weight": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    return {
        "norm1_q": ln(), "norm1_k": ln(), "norm1_v": ln(),
        "q": _linear(ks[0], d, d, dtype, bias=True),
        "k": _linear(ks[1], d, d, dtype, bias=True),
        "v": _linear(ks[2], d, d, dtype, bias=True),
        "proj": _linear(ks[3], d, out, dtype, bias=True),
    }


def attention_pool(
    params: Dict[str, Any], cfg: InternVideo2Config, x: jax.Array
) -> jax.Array:
    """(B, T, D) patch features -> (B, clip_embed_dim) pooled embedding.

    AttentionPoolingBlock.forward (vit_scale_clean.py:141-150): the query
    is the mean token; q/k/v each get their own LayerNorm (eps 1e-5);
    single cross-attention step, then projection to clip_embed_dim.
    """
    B, T, d = x.shape
    nh = cfg.attn_pool_num_heads
    hd = d // nh
    eps = 1e-5
    xq = _layer_norm(jnp.mean(x, axis=1, keepdims=True), params["norm1_q"], eps)
    xk = _layer_norm(x, params["norm1_k"], eps)
    xv = _layer_norm(x, params["norm1_v"], eps)
    q = _apply_linear(params["q"], xq).reshape(B, 1, nh, hd)
    k = _apply_linear(params["k"], xk).reshape(B, T, nh, hd)
    v = _apply_linear(params["v"], xv).reshape(B, T, nh, hd)
    out = attention(q, k, v)
    out = _apply_linear(params["proj"], out.reshape(B, 1, d))
    return out[:, 0]


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_internvideo2_params(
    key, cfg: InternVideo2Config, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    d = cfg.hidden_size
    depth = cfg.effective_depth
    keys = jax.random.split(key, depth + 2)
    layers = []
    for i in range(depth):
        ks = jax.random.split(keys[i], 6)
        layers.append({
            "norm1": {"weight": jnp.ones((d,), jnp.float32)},
            "attn": {
                "qkv": _linear(ks[0], d, 3 * d, dtype, bias=cfg.qkv_bias),
                "q_norm": {"weight": jnp.ones((d,), jnp.float32)},
                "k_norm": {"weight": jnp.ones((d,), jnp.float32)},
                "proj": _linear(ks[1], d, d, dtype),
            },
            "ls1": {"gamma": jnp.full((d,), 1e-5, jnp.float32)},
            "norm2": {"weight": jnp.ones((d,), jnp.float32)},
            "mlp": {
                "fc1": _linear(ks[2], d, cfg.intermediate_size, dtype),
                "fc2": _linear(ks[3], cfg.intermediate_size, d, dtype),
            },
            "ls2": {"gamma": jnp.full((d,), 1e-5, jnp.float32)},
        })
    g = cfg.grid_size
    pos = get_3d_sincos_pos_embed(
        d, g, cfg.num_frames // cfg.tubelet_size, cls_token=True
    )
    return {
        "patch_embed": {
            # conv3d tubelet kernel flattened: (t*ps*ps*3, D)
            "kernel": (jax.random.normal(
                keys[-2],
                (cfg.tubelet_size * cfg.patch_size * cfg.patch_size * 3, d),
            ) * 0.02).astype(dtype),
            "bias": jnp.zeros((d,), dtype),
        },
        "cls_token": jnp.zeros((1, 1, d), jnp.float32),
        "pos_embed": jnp.asarray(pos, jnp.float32)[None],
        "layers": layers,
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def internvideo2_forward(
    params: Dict[str, Any], cfg: InternVideo2Config, clips: jax.Array,
    keep_cls: bool = False,
) -> jax.Array:
    """clips: (B, T, H, W, 3) with T == cfg.num_frames ->
    (B, T*grid², D) patch features (CLS dropped; `keep_cls` retains it —
    the attention-pooling head consumes CLS+patches, vit_scale_clean.py:728)."""
    B, T, H, W, _ = clips.shape
    ps, tb = cfg.patch_size, cfg.tubelet_size
    d = cfg.hidden_size
    g = H // ps
    assert T % tb == 0

    # tubelet patch embed as one matmul: (B, T/tb, g, g, tb*ps*ps*3) @ kernel
    x = clips.reshape(B, T // tb, tb, g, ps, g, ps, 3)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))  # B,T',g,g,tb,ps,ps,3
    x = x.reshape(B, (T // tb) * g * g, tb * ps * ps * 3)
    pe = params["patch_embed"]
    if "kernel" in pe:  # int8-quantized leaves take x's own float dtype
        x = x.astype(pe["kernel"].dtype)
    x = _apply_linear(pe, x)

    cls = jnp.broadcast_to(
        params["cls_token"].astype(x.dtype), (B, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    nh = cfg.num_attention_heads
    hd = d // nh
    scale = hd ** -0.5
    for layer in params["layers"]:
        res = x
        n = rms_norm(x, layer["norm1"]["weight"], eps=cfg.layer_norm_eps)
        qkv = _apply_linear(layer["attn"]["qkv"], n)
        Tk = qkv.shape[1]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # full-dim q/k RMSNorm (vit_scale_clean.py:233-244)
        q = rms_norm(q, layer["attn"]["q_norm"]["weight"], eps=cfg.layer_norm_eps)
        k = rms_norm(k, layer["attn"]["k_norm"]["weight"], eps=cfg.layer_norm_eps)
        q = q.reshape(B, Tk, nh, hd)
        k = k.reshape(B, Tk, nh, hd)
        v = v.reshape(B, Tk, nh, hd)
        # 1025-token clips ride the whole-frame Pallas kernel on TPU
        # (ops/vit_attention.py MAX_WHOLE_FRAME_T=1280), jnp oracle on CPU
        out = encoder_attention(q, k, v)
        out = _apply_linear(layer["attn"]["proj"], out.reshape(B, Tk, d))
        x = res + out * layer["ls1"]["gamma"].astype(out.dtype)
        res = x
        n = rms_norm(x, layer["norm2"]["weight"], eps=cfg.layer_norm_eps)
        h = jax.nn.gelu(_apply_linear(layer["mlp"]["fc1"], n),
                        approximate=False)
        h = _apply_linear(layer["mlp"]["fc2"], h)
        x = res + h * layer["ls2"]["gamma"].astype(h.dtype)
    return x if keep_cls else x[:, 1:]


def encode_frames_iv2(
    params: Dict[str, Any], cfg: InternVideo2Config, frames: jax.Array
) -> jax.Array:
    """(F, H, W, 3) -> (F//num_frames, clip_tokens, D): frames group into
    clips of cfg.num_frames (reference model.py:173-190 reshape)."""
    F = frames.shape[0]
    T = cfg.num_frames
    assert F % T == 0, (F, T)
    clips = frames.reshape(F // T, T, *frames.shape[1:])
    return internvideo2_forward(params, cfg, clips)
