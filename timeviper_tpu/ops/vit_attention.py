"""Whole-frame Pallas attention for ViT towers.

The generic streaming flash kernel is built for long sequences; at ViT
shapes (T ≈ 729-1024 patch tokens, 16 heads) its block machinery runs at
<10% MXU and dominates the encode (measured: 10.2 ms of a 23 ms
SigLIP-SO400M layer at 64 frames). At these lengths the full (T, T) score
matrix fits comfortably in VMEM, so one program per (frame, head) computes
the exact softmax attention in two MXU matmuls with no streaming:

    S = q kᵀ · scale   (T, T) f32 in VMEM (2.4 MB at T=768)
    P = softmax(S) masked to the valid token count
    O = P v

Replaces the reference's flash-attn 2 usage inside vision towers
(timeviper/model/vit/base_vision.py via timm SDPA; internvideo2/
flash_attention_class.py:8). Head dim is zero-padded to 128 by the caller
(lane alignment); the column mask covers token padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# S+P in f32 must fit VMEM alongside q/k/v/o tiles; 1024² f32 ≈ 4 MB.
MAX_WHOLE_FRAME_T = 1024


def _vit_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                     t_valid: int):
    q = q_ref[...]  # (T, D)
    k = k_ref[...]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (T, T)
    T = s.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    s = jnp.where(jj < t_valid, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    # reciprocal-multiply: a full (T, T) divide is ~10x the VPU cost of mul
    l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
    p = (p * l_inv).astype(q.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def vit_attention(
    q: jax.Array,  # (B, T, H, hd) — non-causal, all tokens attend to all
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Exact non-causal attention; T is padded to a multiple of 128 and
    head_dim to 128 internally. Returns (B, T, H, hd) in q.dtype."""
    B, T, H, hd = q.shape
    if scale is None:
        scale = 1.0 / (hd ** 0.5)
    Tp = -(-T // 128) * 128
    Dp = -(-hd // 128) * 128
    pt, pd = Tp - T, Dp - hd

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, pt), (0, 0), (0, pd)))
        return jnp.transpose(x, (0, 2, 1, 3))  # (B, H, Tp, Dp)

    qk, kk, vk = prep(q * jnp.asarray(scale, q.dtype)), prep(k), prep(v)

    kernel = functools.partial(_vit_attn_kernel, scale=1.0, t_valid=T)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((None, None, Tp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_specs=pl.BlockSpec((None, None, Tp, Dp),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qk, kk, vk)
    return jnp.transpose(out, (0, 2, 1, 3))[:, :T, :, :hd]
