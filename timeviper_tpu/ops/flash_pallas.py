"""Flash attention for long-sequence prefill on TPU.

Replaces flash-attn 2 in the reference (modeling_nano.py:84-86, 1119-1210;
SURVEY.md §2.2 N5). Wraps JAX's bundled Pallas TPU flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) behind the same call
shape as ops/attention.py, with:

* GQA by repeating KV heads into the kernel's MHA layout,
* packed sequences via the kernel's SegmentIds (replacing flash-attn's
  varlen cu_seqlens),
* dispatch: the fused kernel needs seq_len % block == 0 and pays off past
  ~1k tokens; anything else falls back to the jnp path (the oracle).

The O(L) memory scaling is what makes 10k-frame (160k-token) prefill
possible at all — the jnp path materializes O(L²) logits (34 GB at 16k).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from timeviper_tpu.ops.attention import attention, make_attention_mask

_BLOCK = 512


def _kernel_ok(q_len: int, kv_len: int, head_dim: int) -> bool:
    return (
        q_len == kv_len
        and q_len >= 512
        and q_len % 256 == 0
        and head_dim % 128 == 0
    )


def flash_attention(
    q: jax.Array,  # (B, Lq, Hq, D)
    k: jax.Array,  # (B, Lk, Hkv, D)
    v: jax.Array,
    segment_ids: Optional[jax.Array] = None,  # (B, L) int32
    causal: bool = True,
    scale: Optional[float] = None,
    conservative_blocks: bool = False,
) -> jax.Array:
    """Causal (optionally packed) attention; O(L) memory on TPU.

    `conservative_blocks` keeps the 512 forward blocks: REQUIRED when the
    call will be differentiated — AD swaps in the kernel's save-residuals
    forward, whose VMEM working set at block_q=2048 is 18.8 MB > the
    16 MB budget (measured compile failure at the 13L/8192 train shape).
    Training callers (nano remat path) set it; inference prefill gets the
    measured-faster (2048, 1024) blocks.
    """
    B, Lq, Hq, D = q.shape
    Lk, Hkv = k.shape[1], k.shape[2]

    use_kernel = (
        jax.default_backend() in ("tpu", "axon")
        and _kernel_ok(Lq, Lk, D)
    )
    if not use_kernel:
        mask = make_attention_mask(
            Lq, Lk, causal=causal,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
        )
        return attention(q, k, v, mask, scale=scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
    )
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as _fa,
    )

    rep = Hq // Hkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # kernel layout: (B, H, L, D)
    qk = jnp.transpose(q, (0, 2, 1, 3))
    kk = jnp.transpose(k, (0, 2, 1, 3))
    vk = jnp.transpose(v, (0, 2, 1, 3))
    seg = None
    if segment_ids is not None:
        seg = SegmentIds(q=segment_ids, kv=segment_ids)
    blk = _BLOCK if Lq % _BLOCK == 0 else 256
    # Forward blocks larger than the 512 default: measured at the
    # headline 80k shape (scripts/microbench_flash.py, L=81920 Hq=32
    # D=128 causal), (block_q=2048, block_k=1024) runs 130.2 TF/s vs
    # 112.7 at (512, 512) — 13% off the four attention layers' share of
    # the 80k prefill. Anything larger fails Mosaic's VMEM budget. The
    # BACKWARD blocks stay at `blk`: the dkv/dq passes were tuned with
    # the train-step A/Bs and keep their measured operating point.
    if conservative_blocks:
        bq = bk = blk
    else:
        bq = next((b for b in (2048, 1024, 512, 256) if Lq % b == 0), blk)
        bk = next((b for b in (1024, 512, 256) if Lk % b == 0), blk)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = _fa(
        qk, kk, vk, causal=causal, segment_ids=seg,
        sm_scale=scale if scale is not None else 1.0 / (D ** 0.5),
        block_sizes=sizes,
    )
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)
