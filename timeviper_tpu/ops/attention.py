"""Attention ops.

Replaces flash-attn 2 / torch SDPA in the reference (modeling_nano.py:84-86,
1119-1220; cross_attention.py). One general jnp implementation drives:

* causal self-attention (the 4-6 attention layers of the hybrid backbone —
  note: *no RoPE* in nano attention, reference modeling_nano.py:1012-1114),
* packed sequences via segment ids (replacing flash-attn varlen cu_seqlens),
* fixed-capacity KV-cache decode (q_len==1 against a padded cache),
* non-causal TransV cross-attention.

GQA is expressed directly in the einsum (no repeat_kv materialization).
A Pallas flash kernel handles long-sequence prefill on TPU
(ops/flash_pallas.py); this jnp path is the oracle and the short-sequence /
decode path — XLA already fuses it into two MXU matmuls + softmax.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def make_attention_mask(
    q_len: int,
    kv_len: int,
    *,
    causal: bool = True,
    q_positions: Optional[jax.Array] = None,
    kv_positions: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    kv_valid: Optional[jax.Array] = None,
) -> Optional[jax.Array]:
    """Build a boolean (B?, q_len, kv_len) mask (True = attend).

    `q_positions`/`kv_positions` support decode against a cache: causality is
    position-based, not index-based. `kv_valid` masks cache slots not yet
    written. Returns None when nothing constrains attention.
    """
    masks = []
    if causal:
        qp = (
            q_positions
            if q_positions is not None
            else jnp.arange(q_len)[None, :]
        )
        kp = (
            kv_positions
            if kv_positions is not None
            else jnp.arange(kv_len)[None, :]
        )
        masks.append(qp[:, :, None] >= kp[:, None, :])
    if q_segment_ids is not None and kv_segment_ids is not None:
        masks.append(
            q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        )
    if kv_valid is not None:
        masks.append(kv_valid[:, None, :])
    if not masks:
        return None
    out = masks[0]
    for m in masks[1:]:
        out = jnp.logical_and(out, m)
    return out


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    scale: Optional[float] = None,
    logits_dtype=jnp.float32,
    precision=None,
) -> jax.Array:
    """Scaled dot-product attention with GQA.

    q: (B, Lq, Hq, D); k, v: (B, Lk, Hkv, D) with Hq % Hkv == 0.
    mask: broadcastable to (B, Lq, Lk), True = attend.
    Returns (B, Lq, Hq, D) in q.dtype. Softmax in float32.
    """
    B, Lq, Hq, D = q.shape
    Hkv = k.shape[2]
    rep = Hq // Hkv
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    qg = q.reshape(B, Lq, Hkv, rep, D)
    logits = jnp.einsum(
        "bqhrd,bkhd->bhrqk", qg, k, preferred_element_type=logits_dtype,
        precision=precision,
    )
    logits = logits.astype(logits_dtype) * scale
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhrqk,bkhd->bqhrd", probs.astype(v.dtype), v,
        preferred_element_type=logits_dtype, precision=precision,
    )
    return out.reshape(B, Lq, Hq, D).astype(q.dtype)


def causal_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Prefill/training causal attention, optionally packed (segment ids)."""
    B, Lq, _, _ = q.shape
    mask = make_attention_mask(
        Lq, k.shape[1], causal=True,
        q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
    )
    if mask is not None and mask.ndim == 3 and mask.shape[0] == 1 and B > 1:
        mask = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
    return attention(q, k, v, mask)


def cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Non-causal cross attention (TransV merge, cross_attention.py:218-324)."""
    mask = None
    if kv_valid is not None:
        mask = kv_valid[:, None, :]
    return attention(q, k, v, mask)
