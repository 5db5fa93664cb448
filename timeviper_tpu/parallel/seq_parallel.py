"""Sequence-parallel long-context prefill over the `seq` mesh axis.

The capability the reference lacks (SURVEY.md §2.3, §5.7): it reaches 10k+
frames through compression only, never sharding the sequence. On TPU the
fused visual+text sequence shards cleanly over ICI:

* **Mamba/SSD layers** — chunk states compose associatively. Each device
  scans its local span with zero initial state (producing local outputs,
  its boundary state, and its total decay), then one `all_gather` of the
  tiny (B, H, P, N) boundary states lets every device compute its inbound
  state by a prefix product — an inter-chip associative scan. A cheap
  correction term (C_i · h_in · exp(local ΣdA)) fixes the local outputs.
  Communication per layer: ndev × state ≈ ndev × 4 MB, independent of L.
* **Attention layers** (4-6 of 52) — K/V are all-gathered across the seq
  axis; queries stay sharded (each device computes its rows of causal
  attention against global KV).
* Everything else is per-token and needs no communication.

The whole prefill runs inside ONE `shard_map` over (data, seq) so each
device executes the single-device Pallas/XLA kernels on its local span —
no GSPMD guessing on the scan structure.

Packed sequences (`seq_idx` segment ids, the reference's training mode,
modeling_nano.py:569) shard too: the SSD's cross-device state composition
zeroes the inbound state when the device seam crosses a segment start and
stops the carry at devices containing internal boundaries; the conv halo
carries the left neighbor's segment id so taps crossing a boundary mask
out inside `causal_conv1d`; attention layers add a segment-equality mask
(flash segment ids / dense block-diagonal). `seq_idx` must be
nondecreasing (packed segments are contiguous), as in the reference.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.models.nano import (
    _apply_linear,
    compute_logits,
    mlp_mixer_forward,
)
from timeviper_tpu.ops.attention import attention, make_attention_mask
from timeviper_tpu.ops.conv import causal_conv1d, init_conv_state
from timeviper_tpu.ops.norms import gated_rms_norm, rms_norm
from timeviper_tpu.ops.ssd import _process_dt
from timeviper_tpu.ops.ssd_pallas import ssd_auto


# ---------------------------------------------------------------------------
# Sequence-sharded SSD (runs INSIDE shard_map; axis_name = the seq axis)
# ---------------------------------------------------------------------------


def ssd_seq_sharded(
    x: jax.Array,      # (B, Lloc, H, P) local span
    dt: jax.Array,     # (B, Lloc, H)
    A: jax.Array,      # (H,)
    B_: jax.Array,     # (B, Lloc, G, N)
    C: jax.Array,      # (B, Lloc, G, N)
    *,
    axis_name: str,
    chunk_size: int,
    D: Optional[jax.Array],
    dt_bias: Optional[jax.Array],
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
    dt_mask: Optional[jax.Array] = None,
    return_final_state: bool = False,
    seq_idx: Optional[jax.Array] = None,
):
    """Per-device SSD with cross-device state composition (see module doc).

    `dt_mask` (B, Lloc) bool zeroes the post-softplus dt at masked
    positions, making them exact no-ops in the scan (decay exp(0)=1,
    contribution dt·B·x = 0) — how sharded pdrop drops tokens without
    reshaping (see `nano_prefill_seq_parallel`).
    `seq_idx` (B, Lloc) int32 LOCAL span of nondecreasing packed segment
    ids: the local scan resets at segment starts (ssd kernels' seq_idx),
    the cross-device carry is zeroed when the device seam crosses a
    segment boundary, and a device containing an internal boundary stops
    the carry (its final segment started locally).
    With `return_final_state`, also returns the GLOBAL final state
    (B, H, P, N) — the state after the last device's span, i.e. exactly
    what decode's `ssd_update_step` continues from.
    """
    H = x.shape[2]
    assert not (dt_mask is not None and seq_idx is not None), \
        "masked pdrop and packed seq_idx are mutually exclusive here"

    dtf = _process_dt(dt, dt_bias, dt_softplus, dt_limit)  # (B, Lloc, H)
    if dt_mask is not None:
        dtf = jnp.where(dt_mask[..., None], dtf, 0.0)

    # 1. local scan, zero init — ssd_auto: the compiled Pallas kernel on
    # TPU (shard_map bodies run per-device programs, so the kernel sees
    # only the local span), jnp chunked scan elsewhere. dt is passed
    # pre-processed (identity-processed downstream) when masking is on.
    if dt_mask is not None:
        y_local, state_local = ssd_auto(
            x, dtf, A, B_, C, chunk_size=chunk_size, D=D, dt_bias=None,
            dt_softplus=False, dt_limit=(0.0, float("inf")),
            return_final_state=True,
        )
    else:
        y_local, state_local = ssd_auto(
            x, dt, A, B_, C, chunk_size=chunk_size, D=D, dt_bias=dt_bias,
            dt_softplus=dt_softplus, dt_limit=dt_limit,
            seq_idx=seq_idx, return_final_state=True,
        )

    # total decay over the local span, per head: exp(sum dA). Plain f32
    # multiply+sum, NOT an einsum — default matmul precision would run
    # the contraction in bf16 and drift the composed cross-device state
    # (the f32 state-math rule, ops/ssd.py)
    dA_sum = jnp.sum(
        dtf.astype(jnp.float32) * A.astype(jnp.float32)[None, None, :],
        axis=1)
    local_decay = jnp.exp(dA_sum)  # (B, H)

    # 2. gather every device's (decay, state); prefix-compose to my inbound
    ndev = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    decays = jax.lax.all_gather(local_decay, axis_name)  # (ndev, B, H)
    states = jax.lax.all_gather(state_local, axis_name)  # (ndev, B, H, P, N)

    if seq_idx is not None:
        # segment-aware carry gates (seq_idx nondecreasing): the carry
        # enters device k only when the seam is segment-continuous, and
        # flows THROUGH k only when k holds no internal boundary (its
        # local final state already restarted from the last segment start)
        seg_first, seg_last = seq_idx[:, 0], seq_idx[:, -1]  # (B,)
        firsts = jax.lax.all_gather(seg_first, axis_name)    # (ndev, B)
        lasts = jax.lax.all_gather(seg_last, axis_name)
        prev_last = jnp.concatenate(
            [jnp.full_like(lasts[:1], -1), lasts[:-1]], axis=0)
        cont_in = (prev_last == firsts).astype(jnp.float32)  # (ndev, B)
        through = (firsts == lasts).astype(jnp.float32)
    else:
        cont_in = through = jnp.ones(decays.shape[:2], jnp.float32)

    def compose(carry, inp):
        # carry: state arriving at device k's seam; inbound: what enters
        # k's span (zeroed at a broken seam)
        d_k, s_k, c_k, t_k = inp
        inbound = carry * c_k[:, None, None, None]
        new = inbound * (d_k * t_k[:, None])[..., None, None] + s_k
        return new, inbound

    # scan over devices 0..ndev-1; carry entering device k = inbound state;
    # final carry = state after the LAST device = global final SSM state
    init = jnp.zeros_like(state_local)
    final_state, inbound_all = jax.lax.scan(
        compose, init, (decays, states, cont_in, through))
    h_in = inbound_all[my]  # (B, H, P, N) state entering my span

    # 3. correction: y_i += C_i · h_in * exp(cumsum dA up to i, inclusive)
    dA_cum = jnp.cumsum(
        dtf * A.astype(jnp.float32)[None, None, :], axis=1
    )  # (B, Lloc, H)
    G = B_.shape[-2]
    Ch = jnp.repeat(C.astype(jnp.float32), H // G, axis=2)  # (B, Lloc, H, N)
    y_corr = jnp.einsum(
        "blhn,bhpn->blhp", Ch, h_in,
        precision=jax.lax.Precision.HIGHEST,
    ) * jnp.exp(dA_cum)[..., None]
    if seq_idx is not None:
        # the inbound state reaches only the span's FIRST segment
        y_corr = y_corr * (
            seq_idx == seq_idx[:, :1]).astype(jnp.float32)[..., None, None]
    y = (y_local.astype(jnp.float32) + y_corr).astype(x.dtype)
    if return_final_state:
        return y, final_state
    return y


# ---------------------------------------------------------------------------
# Ring attention over the seq axis (inside shard_map)
# ---------------------------------------------------------------------------


def _block_attn_lse(q, k, v, *, causal, valid_kv=None, valid_q=None,
                    seg_q=None, seg_kv=None, scale=None):
    """One KV-block attention returning (normalized out, sumexp, rowmax).

    The streaming-softmax primitive for ring attention: per-block partial
    results merge exactly via (l, m) — flash attention's invariant. On
    TPU the Pallas flash kernel computes this with O(L) memory
    (`save_residuals`); elsewhere a dense jnp path (the oracle).

    `valid_kv` masks invalid KV rows (pads / pdrop-dropped). On the flash
    path it becomes segment ids (invalid rows segment 1); `valid_q` marks
    the query rows' own validity so an invalid q row pairs with invalid
    kv rows instead of ending up fully masked (a fully-masked row makes
    the kernel emit NaN, which 0·NaN would propagate into the SSD state
    downstream even at dead positions — the dense path's denom guard
    avoids this at the source). Invalid rows' outputs are garbage by
    contract; callers never consume them.
    `seg_q`/`seg_kv` (B, Lq)/(B, Lk) int32 packed segment ids restrict
    attention to equal segments (block-diagonal packing); they compose
    with the valid masks (invalid rows get segment -1).
    Returns o: (B, Lq, Hq, D); l, m: (B, Hq, Lq) float32.
    """
    import math as _math

    B, Lq, Hq, D = q.shape
    Lk, Hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / _math.sqrt(D)

    # flash path: causal requires aligned q/kv origins (Lq == Lk); the
    # non-causal form also serves rectangular Lq != Lk blocks (the
    # prefix-cache suffix attention, models/prefix_cache.py)
    if (jax.default_backend() in ("tpu", "axon")
            and (Lq == Lk or not causal)
            and min(Lq, Lk) >= 256 and Lq % 256 == 0 and Lk % 256 == 0
            and D % 128 == 0):
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                _flash_attention_impl,
            )

            segs = None
            if valid_kv is not None or seg_q is not None:
                base_kv = (seg_kv if seg_kv is not None
                           else jnp.zeros((B, Lk), jnp.int32))
                base_q = (seg_q if seg_q is not None
                          else jnp.zeros((B, Lq), jnp.int32))
                if valid_kv is not None:
                    base_kv = jnp.where(valid_kv[None], base_kv, -1)
                    vq = (valid_q if valid_q is not None
                          else jnp.ones((Lq,), bool))
                    # invalid q rows pair with invalid kv rows (NaN guard)
                    base_q = jnp.where(vq[None], base_q, -1)
                segs = SegmentIds(q=jnp.broadcast_to(base_q, (B, Lq)),
                                  kv=jnp.broadcast_to(base_kv, (B, Lk)))

            rep = Hq // Hkv
            kk, vv = (jnp.repeat(k, rep, axis=2),
                      jnp.repeat(v, rep, axis=2)) if rep > 1 else (k, v)
            blk_q = 512 if Lq % 512 == 0 else 256
            blk_k = 512 if Lk % 512 == 0 else 256
            o, l, m = _flash_attention_impl(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(kk, (0, 2, 1, 3)),
                jnp.transpose(vv, (0, 2, 1, 3)),
                None, segs, True, causal, scale,
                1, blk_q, blk_k, blk_k, False,
            )
            return (jnp.transpose(o, (0, 2, 1, 3)).astype(q.dtype),
                    l.astype(jnp.float32), m.astype(jnp.float32))
        except Exception:
            pass  # private API drift -> dense fallback below

    rep = Hq // Hkv
    qg = q.reshape(B, Lq, Hkv, rep, D)
    logits = jnp.einsum(
        "bqhrd,bkhd->bhrqk", qg, k,
        preferred_element_type=jnp.float32) * scale
    mask = jnp.ones((1, Lq, Lk), bool)
    if causal:
        mask = mask & (jnp.arange(Lq)[:, None] >= jnp.arange(Lk)[None, :])
    if valid_kv is not None:
        mask = mask & valid_kv[None, None, :]
    if seg_q is not None:
        mask = mask & (seg_q[:, :, None] == seg_kv[:, None, :])
    logits = jnp.where(mask[:, None, None], logits, -jnp.inf)
    m = jnp.max(logits, axis=-1)  # (B, Hkv, rep, Lq)
    p = jnp.exp(logits - jnp.where(
        jnp.isneginf(m), 0.0, m)[..., None])
    p = jnp.where(jnp.isneginf(m)[..., None], 0.0, p)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhrqk,bkhd->bqhrd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    denom = jnp.where(l == 0, 1.0, l)
    o = o / jnp.moveaxis(denom, 3, 1)[..., None]
    return (o.reshape(B, Lq, Hq, D).astype(q.dtype),
            l.reshape(B, Hq, Lq), m.reshape(B, Hq, Lq))


def attention_seq_ring(
    q: jax.Array,  # (B, Lloc, Hq, hd)
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    n_shards: int,
    valid_g: Optional[jax.Array] = None,  # (L,) global bool
    seq_g: Optional[jax.Array] = None,    # (B, L) global packed segment ids
) -> jax.Array:
    """Causal attention with KV blocks rotating around the seq ring.

    Unlike `attention_seq_sharded` (which all-gathers the FULL KV — ~1.3
    GB per attention layer per device at 160k tokens), only one
    (Lloc, Hkv, hd) block is in flight per step; after `n_shards`
    ppermute steps every device has seen every block. Per-block partial
    softmaxes merge via the flash (l, m) invariants; blocks from devices
    right of mine contribute zero (causality) via the merge weights, so
    no data-dependent control flow enters the traced program."""
    B, Lloc, Hq, D = q.shape
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def merge(acc, o_s, l_s, m_s, live):
        o, l, m = acc
        l_s = jnp.where(live, l_s, 0.0)
        m_s = jnp.where(live & (l_s > 0), m_s, -jnp.inf)
        m_new = jnp.maximum(m, m_s)
        a = jnp.where(l > 0, l * jnp.exp(m - m_new), 0.0)
        b = jnp.where(l_s > 0, l_s * jnp.exp(m_s - m_new), 0.0)
        l_new = a + b
        denom = jnp.where(l_new == 0, 1.0, l_new)
        wa = jnp.moveaxis(a / denom, 1, 2)[..., None]  # (B, Lq, Hq, 1)
        wb = jnp.moveaxis(b / denom, 1, 2)[..., None]
        # select, don't multiply-by-zero: a fully-masked row's o_s is NaN
        # on the flash path, and 0·NaN = NaN would ride the residual into
        # the SSD's 0·x products
        contrib = jnp.where(wb > 0, o_s.astype(jnp.float32) * wb, 0.0)
        return (jnp.where(wa > 0, o * wa, 0.0) + contrib, l_new, m_new)

    def block_valid(j):
        if valid_g is None:
            return None
        return jax.lax.dynamic_slice(valid_g, (j * Lloc,), (Lloc,))

    def block_seg(j):
        if seq_g is None:
            return None
        return jax.lax.dynamic_slice(
            seq_g, (0, j * Lloc), (seq_g.shape[0], Lloc))

    # step 0: my own (diagonal, causal) block
    o0, l0, m0 = _block_attn_lse(q, k, v, causal=True,
                                 valid_kv=block_valid(my),
                                 valid_q=block_valid(my),
                                 seg_q=block_seg(my), seg_kv=block_seg(my))
    acc = (jnp.zeros_like(q, dtype=jnp.float32),
           jnp.zeros((B, Hq, Lloc), jnp.float32),
           jnp.full((B, Hq, Lloc), -jnp.inf, jnp.float32))
    acc = merge(acc, o0, l0, m0, jnp.asarray(True))

    if n_shards > 1:
        # remaining steps are uniform (non-causal full blocks, masked dead
        # by the merge weights when they lie in the future) — scan them so
        # the traced program holds ONE ring step, not n_shards copies
        def step(carry, s):
            acc, kc, vc = carry
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            j = (my - s) % n_shards
            o_s, l_s, m_s = _block_attn_lse(q, kc, vc, causal=False,
                                            valid_kv=block_valid(j),
                                            valid_q=block_valid(my),
                                            seg_q=block_seg(my),
                                            seg_kv=block_seg(j))
            acc = merge(acc, o_s, l_s, m_s, s <= my)
            return (acc, kc, vc), None

        (acc, _, _), _ = jax.lax.scan(
            step, (acc, k, v), jnp.arange(1, n_shards))
    return acc[0].astype(q.dtype)


# ---------------------------------------------------------------------------
# Attention with all-gathered KV (inside shard_map)
# ---------------------------------------------------------------------------


def attention_seq_sharded(
    q: jax.Array,  # (B, Lloc, Hq, hd)
    k: jax.Array,  # (B, Lloc, Hkv, hd)
    v: jax.Array,
    *,
    axis_name: str,
    q_chunk: int = 1024,
    kv_valid: Optional[jax.Array] = None,  # (L,) global bool, True=attend
    seq_g: Optional[jax.Array] = None,     # (B, L) global packed segment ids
    return_kv: bool = False,
):
    """Causal attention with local queries against all-gathered global KV.

    Long sequences stream the local queries in chunks (lax.map) so the
    (Lloc, L) score matrix never materializes whole — O(q_chunk · L)
    memory, which is what lets the 8k-tokens/device dryrun and CPU
    long-context fallback run at all.

    `kv_valid` masks invalid global KV slots (left-pad, pdrop-dropped).
    With `return_kv`, also returns the gathered (kg, vg) — the decode
    cache's KV for this layer."""
    B, Lloc = q.shape[:2]
    ndev = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    kg = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)  # (B, L, ...)
    vg = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    L = Lloc * ndev
    kv_pos = jnp.arange(L)

    def chunk_mask(q_pos):
        # (1 or B, Lq_chunk, L) — broadcastable to attention()'s mask
        mask = (q_pos[:, None] >= kv_pos[None, :])[None]
        if kv_valid is not None:
            mask = mask & kv_valid[None, None, :]
        if seq_g is not None:
            mask = mask & (jnp.take(seq_g, q_pos, axis=1)[:, :, None]
                           == seq_g[:, None, :])
        return mask

    if Lloc <= q_chunk:
        q_pos = my * Lloc + jnp.arange(Lloc)
        out = attention(q, kg, vg, chunk_mask(q_pos))
        return (out, (kg, vg)) if return_kv else out

    # ceil-chunk: queries are independent, so a non-divisible Lloc pads
    # the LAST chunk (pad rows clamp to the final real position and are
    # sliced off) — falling back to unchunked here would materialize the
    # full (Lloc, L) score matrix, hundreds of GB at the 160k-token scale
    nchunk = -(-Lloc // q_chunk)
    Lpad = nchunk * q_chunk
    qp = (jnp.pad(q, ((0, 0), (0, Lpad - Lloc), (0, 0), (0, 0)))
          if Lpad != Lloc else q)
    qc = jnp.moveaxis(qp.reshape(B, nchunk, q_chunk, *q.shape[2:]), 1, 0)

    def one_chunk(args):
        qi, ci = args
        q_pos = jnp.minimum(my * Lloc + ci * q_chunk + jnp.arange(q_chunk),
                            my * Lloc + Lloc - 1)
        return attention(qi, kg, vg, chunk_mask(q_pos))

    out = jax.lax.map(one_chunk, (qc, jnp.arange(nchunk)))
    out = jnp.moveaxis(out, 0, 1).reshape(B, Lpad, *out.shape[3:])
    out = out[:, :Lloc]
    return (out, (kg, vg)) if return_kv else out


# ---------------------------------------------------------------------------
# Full-model sequence-parallel prefill
# ---------------------------------------------------------------------------


def _select_row(h: jax.Array, global_idx, axis_name: str, my, Lloc: int):
    """Replicate the (B, D) row at a traced GLOBAL sequence position from
    whichever device owns it (one psum of a single row)."""
    local = global_idx - my * Lloc
    in_range = (local >= 0) & (local < Lloc)
    row = jax.lax.dynamic_slice_in_dim(
        h, jnp.clip(local, 0, Lloc - 1), 1, axis=1)  # (B, 1, D)
    row = jnp.where(in_range, row, jnp.zeros((), row.dtype))
    return jax.lax.psum(row[:, 0], axis_name)  # (B, D)


def _proj(p, x):
    # the shared linear apply handles plain, int8-quantized (kernel_q),
    # and LoRA leaves — sharded pdrop must run on int8 serving params
    from timeviper_tpu.models.nano import _apply_linear

    return _apply_linear(p, x)


def _compact_conv(x, conv_params, cfg, axis_name, local_valid):
    """Depthwise causal conv over the VALID subsequence only — exact
    compacted-sequence semantics under the pdrop mask.

    After a pdrop stage the reference's conv runs on the physically
    compacted sequence, so a kept token's K-1 left taps are the previous
    KEPT tokens, not whatever sat adjacent pre-drop. Masked sharding keeps
    shapes static instead of compacting, so the conv must skip dropped
    positions: compact locally (order-preserving argsort), borrow the last
    K-1 valid inputs of the global prefix from the left (a generalized
    halo composed across devices like the SSD state scan), convolve, and
    scatter back. Dropped rows come out as garbage and are re-zeroed by
    the caller."""
    K = cfg.mamba_d_conv
    B, Lloc, C = x.shape
    order = jnp.argsort(~local_valid, stable=True)  # valid first, in order
    inv = jnp.argsort(order)
    xc = jnp.take(x, order, axis=1)
    n_valid = jnp.sum(local_valid.astype(jnp.int32))
    # last (K-1) valid inputs, LEFT-aligned, zero-padded after
    cnt = jnp.minimum(n_valid, K - 1)
    tail_src = jnp.clip(n_valid - cnt + jnp.arange(K - 1), 0, Lloc - 1)
    tail = jnp.take(xc, tail_src, axis=1)  # (B, K-1, C)
    tail = jnp.where((jnp.arange(K - 1) < cnt)[None, :, None], tail, 0.0)
    tails = jax.lax.all_gather(tail, axis_name)  # (ndev, B, K-1, C)
    cnts = jax.lax.all_gather(cnt, axis_name)    # (ndev,)
    ndev = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)

    def compose(carry, inp):
        t, c = inp
        # carry holds the last K-1 valid entries (right-aligned); append
        # the c left-aligned valid entries of t and keep the last K-1
        comb = jnp.concatenate([carry, t], axis=1)  # (B, 2K-2, C)
        new = jax.lax.dynamic_slice_in_dim(comb, c, K - 1, axis=1)
        return new, carry

    init = jnp.zeros_like(tail)
    _, inbound_all = jax.lax.scan(compose, init, (tails, cnts))
    halo = inbound_all[my]  # (B, K-1, C) last K-1 valid of my global prefix
    xp = jnp.concatenate([halo, xc], axis=1)
    y = causal_conv1d(
        xp, conv_params["weight"], conv_params["bias"],
        activation=cfg.mamba_hidden_act,
    )[:, K - 1:]
    return jnp.take(y, inv, axis=1)


def _rank_scores_attn_sharded(
    h, attn_params, cfg, query_pos, axis_name, my, Lloc, valid_g,
):
    """Sharded attention ranking (reference flash_rank_drop,
    modeling_nano.py:2156-2204): the query token's row is psum-selected
    from its owner, each device scores its local keys with the stage
    layer's q/k projections, and one small all-gather of per-head logits
    lets every device compute the identical global softmax — so the
    keep-set decision is replicated without sharing hidden states."""
    L = valid_g.shape[0]
    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    hs = jax.lax.stop_gradient(h)
    qrow = _select_row(hs, query_pos, axis_name, my, Lloc)  # (1, D)
    q = _proj(attn_params["q_proj"], qrow).reshape(Hq, hd).astype(jnp.float32)
    k = _proj(attn_params["k_proj"], hs[0]).reshape(Lloc, Hkv, hd)
    k = jnp.repeat(k.astype(jnp.float32), Hq // Hkv, axis=1)
    logits_loc = jnp.einsum("hd,lhd->hl", q, k) / jnp.sqrt(float(hd))
    lg = jax.lax.all_gather(logits_loc, axis_name, axis=1, tiled=True)
    mask = (jnp.arange(L) <= query_pos) & valid_g
    lg = jnp.where(mask[None, :], lg, -jnp.inf)
    probs = jax.nn.softmax(lg, axis=-1)
    return probs.mean(axis=0)  # (L,) replicated


def _transv_merge_sharded(
    h, merge_stage, cfg, dropped_mask, suffix_local, axis_name, n_drop,
    return_ca_kv,
):
    """Sharded TransV: local text queries cross-attend the dropped tokens'
    K/V, which are computed locally and all-gathered (K/V dims are
    Hkv*head_dim — far smaller than hidden). Exact `_merge_dropped`
    semantics (models/pdrop.py:130-155): alpha.tanh()-gated residual on
    the text-suffix rows only. Returns (new_h, ca_kv|None)."""
    p = merge_stage["cross_attn"]
    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    B, Lloc, _ = h.shape
    k_loc = _proj(p["k_proj"], h[0]).reshape(Lloc, Hkv, hd)
    v_loc = _proj(p["v_proj"], h[0]).reshape(Lloc, Hkv, hd)
    kg = jax.lax.all_gather(k_loc, axis_name, axis=0, tiled=True)  # (L,..)
    vg = jax.lax.all_gather(v_loc, axis_name, axis=0, tiled=True)
    q = _proj(p["q_proj"], h[0]).reshape(1, Lloc, Hq, hd)
    out = attention(q, kg[None], vg[None], dropped_mask[None, None, :])
    o = _proj(p["o_proj"], out.reshape(Lloc, Hq * hd))
    alpha = merge_stage["alpha"].astype(h.dtype)
    merged = h[0] + jnp.tanh(alpha) * o
    new_h = jnp.where(suffix_local[:, None], merged, h[0])[None]
    ca_kv = None
    if return_ca_kv:
        order = jnp.argsort(~dropped_mask, stable=True)[:n_drop]
        ca_kv = {"k": jnp.take(kg, order, axis=0),
                 "v": jnp.take(vg, order, axis=0)}
    return new_h, ca_kv


def _find_repeat_unit(kinds: Tuple[str, ...]) -> Tuple[int, int]:
    """Longest-coverage repeating prefix unit of the layer pattern.

    Returns (unit_len, reps): kinds[: unit_len * reps] is `reps` copies of
    kinds[:unit_len]. The 9B pattern (configuration_nano.py:140) yields
    (11, 4): 44 of 52 layers scan as 4 repetitions of "M-M-M-M*-M-".
    """
    n = len(kinds)
    best = (0, 1, 1)  # (covered, ulen, reps)
    for ulen in range(1, n // 2 + 1):
        unit = kinds[:ulen]
        reps, i = 0, 0
        while kinds[i:i + ulen] == unit:
            reps += 1
            i += ulen
        if reps >= 2 and ulen * reps > best[0]:
            best = (ulen * reps, ulen, reps)
    return best[1], best[2]


def _scan_layers_enabled() -> bool:
    """lax.scan over repeated layer units (compile-time lever).

    Default: on for CPU (the 8-virtual-device dryrun is XLA-compile-bound
    on one core; scanning cuts the 52-layer program to 19 traced bodies),
    off for TPU (stacking the scanned weights costs a transient HBM copy
    — enable explicitly via TIMEVIPER_SCAN_LAYERS=1 where compile time
    matters more than peak memory)."""
    import os

    env = os.environ.get("TIMEVIPER_SCAN_LAYERS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "cpu"


def nano_prefill_seq_parallel(
    params: Dict[str, Any],
    cfg: NanoConfig,
    inputs_embeds: jax.Array,  # (B, L, D); L divisible by mesh seq size
    mesh: Mesh,
    *,
    logits_to_keep: int = 1,
    valid_from: Any = 0,
    fill_cache: bool = False,
    cache_max_len: int = 0,
    cache_dtype=jnp.bfloat16,
    seq_idx: Optional[jax.Array] = None,  # (B, L) global packed segment ids
    return_hidden: bool = False,
    use_pdrop: bool = False,
    pdrop_vision_start: Any = None,  # traced scalar, GLOBAL position
    pdrop_num_vision: int = 0,       # static original visual-token count
    pdrop_query_pos: Any = None,     # traced scalar (attn ranking query)
    merge_params: Optional[List[Any]] = None,
):
    """Run the hybrid backbone prefill with the sequence sharded over the
    mesh's `seq` axis.

    Left-padding: tokens at global positions < `valid_from` are treated as
    pad — their embeddings are zeroed on entry, the Mamba in-proj outputs
    are re-zeroed around the conv (so pads contribute exactly nothing to
    the scan, matching causal zero-padding), attention masks them from KV,
    and the residual stream is re-zeroed after every block. This gives the
    same left-pad bucket semantics as the single-chip prefill
    (models/generate.py) without seq_idx support.

    With `fill_cache`, also returns a decode-ready cache matching
    `models/cache.init_nano_cache` structure (the VERDICT r2 gap: the
    sharded prefill used to throw away every state, so multi-chip
    generation was impossible):

    * Mamba `ssm_state`: the GLOBAL final state from the cross-device
      compose scan; `conv_state`: the last-device tail of the pre-conv
      in-proj activations (the global last K tokens);
    * attention `k`/`v`: the all-gathered KV padded to `cache_max_len`;
    * `length` = L, `valid_from` as given.

    The cache is replicated across the mesh, so `nano_decode_step` runs
    on it directly — under the mesh (TP via GSPMD) or on one device.

    Packed sequences: `seq_idx` (B, L) nondecreasing segment ids (the
    reference's packed training mode, modeling_nano.py:569) shard with the
    embeddings; SSD state, conv taps, and attention all reset/mask at
    segment boundaries exactly as the unsharded packed forward (module
    doc). Mutually exclusive with `use_pdrop`.

    `return_hidden` additionally returns the final post-norm hidden states
    sharded over (data, seq) — the packed-training hook (per-shard CE
    against sharded labels avoids gathering (L, vocab) logits).
    """
    L_global = inputs_embeds.shape[1]
    assert not (use_pdrop and seq_idx is not None)
    assert not (fill_cache and return_hidden)
    assert not (use_pdrop and return_hidden)
    packed = seq_idx is not None
    if seq_idx is None:
        seq_idx = jnp.zeros(
            (inputs_embeds.shape[0], L_global), jnp.int32)
    if fill_cache:
        assert cache_max_len >= L_global, (cache_max_len, L_global)
        # the cache out_spec is P() (replicated): with data > 1 each data
        # shard would hold a DIFFERENT local-batch cache and shard_map
        # (check_rep=False) would silently keep one shard's values,
        # dropping the other batch rows' states
        assert int(mesh.shape.get("data", 1)) == 1, (
            "fill_cache requires a data=1 mesh (sharded-prefill serving "
            "is per-request); shard batches at the engine level instead")
    n_seq_shards = int(mesh.shape["seq"])
    valid_from = jnp.asarray(valid_from, jnp.int32)
    # shard_map bodies may not close over traced values — every traced
    # scalar is an explicit (replicated) argument
    pdrop_vision_start = jnp.asarray(
        0 if pdrop_vision_start is None else pdrop_vision_start, jnp.int32)
    pdrop_query_pos = jnp.asarray(
        0 if pdrop_query_pos is None else pdrop_query_pos, jnp.int32)
    if merge_params is None:
        merge_params_arg: Any = ()
    else:
        merge_params_arg = tuple(
            m if m is not None else {} for m in merge_params)

    def local_forward(params, embeds, seq_local, valid_from,
                      pdrop_vision_start, pdrop_query_pos, merge_params):
        merge_params = [m if m else None for m in merge_params]
        # embeds: (B, Lloc, D) — this device's span
        B, Lloc, _ = embeds.shape
        my = jax.lax.axis_index("seq")
        ndev = jax.lax.psum(1, "seq")
        pos = my * Lloc + jnp.arange(Lloc)          # global positions
        tok_valid = pos >= valid_from               # (Lloc,)
        kv_valid_g = jnp.arange(L_global) >= valid_from
        if packed:
            seq_loc = seq_local                      # (B, Lloc)
            seq_glob = jax.lax.all_gather(
                seq_local, "seq", axis=1, tiled=True)  # (B, L)
        else:
            seq_loc = seq_glob = None

        def zp(x, lv):  # (B, Lloc, ...) — where kills NaN/garbage
            return jnp.where(lv[None, :, None], x, jnp.zeros((), x.dtype))

        def pick_last_device(x):  # replicate the last device's value
            return jax.lax.psum(
                jnp.where(my == ndev - 1, x, jnp.zeros_like(x)), "seq")

        hidden = zp(embeds, tok_valid)
        d_inner = cfg.mamba_intermediate_size
        G, N, H, Pd = (cfg.mamba_n_groups, cfg.ssm_state_size,
                       cfg.mamba_num_heads, cfg.mamba_head_dim)

        def apply_layer(lp, block_type, hidden, lv=tok_valid,
                        vg=kv_valid_g, dropped=False):
            """One hybrid block on the local span. `lv`/`vg` are the
            current local/global token-validity masks (left-pad always;
            plus pdrop-dropped positions once `dropped` is True — then
            the conv compacts over valid tokens and the SSD zeroes dt at
            dropped positions, making them exact no-ops)."""
            res = hidden
            normed = rms_norm(hidden, lp["norm"]["weight"],
                              eps=cfg.layer_norm_epsilon)
            layer_cache: Dict[str, Any] = {}
            if block_type == "mamba":
                p = lp["mixer"]
                ip = p["in_proj"]
                gate = _apply_linear(ip["gate"], normed)
                # invalid tokens must contribute nothing to conv taps or
                # the scan: zero the in-proj outputs (kills proj bias)
                xr = zp(_apply_linear(ip["x"], normed), lv)
                Br = zp(_apply_linear(ip["B"], normed), lv)
                Cr = zp(_apply_linear(ip["C"], normed), lv)
                dtr = _apply_linear(ip["dt"], normed)
                if fill_cache:
                    # decode continues from the last K GLOBAL tokens,
                    # which are valid text for generation layouts (the
                    # visual block never ends the prompt)
                    layer_cache["conv_state"] = {
                        "x": pick_last_device(
                            init_conv_state(xr, cfg.mamba_d_conv)),
                        "B": pick_last_device(
                            init_conv_state(Br, cfg.mamba_d_conv)),
                        "C": pick_last_device(
                            init_conv_state(Cr, cfg.mamba_d_conv)),
                    }
                cv = p["conv1d"]
                if dropped:
                    # conv over the compacted valid subsequence (see
                    # _compact_conv) — matches the reference convolving
                    # the physically shrunk sequence after pdrop
                    xs = zp(_compact_conv(xr, cv["x"], cfg, "seq", lv), lv)
                    Bc = zp(_compact_conv(Br, cv["B"], cfg, "seq", lv), lv)
                    Cc = zp(_compact_conv(Cr, cv["C"], cfg, "seq", lv), lv)
                else:
                    # the depthwise conv (K=4) spans the device boundary
                    # by K-1 tokens; exchange a halo with the left
                    # neighbor (segment-masked when packed). re-zero
                    # post-conv: conv bias + silu leak nonzeros into pads
                    xs = zp(_halo_conv(xr, cv["x"], cfg, "seq",
                                       seq_idx=seq_loc), lv)
                    Bc = zp(_halo_conv(Br, cv["B"], cfg, "seq",
                                       seq_idx=seq_loc), lv)
                    Cc = zp(_halo_conv(Cr, cv["C"], cfg, "seq",
                                       seq_idx=seq_loc), lv)
                y = ssd_seq_sharded(
                    xs.reshape(B, Lloc, H, Pd), dtr,
                    -jnp.exp(p["A_log"]),
                    Bc.reshape(B, Lloc, G, N), Cc.reshape(B, Lloc, G, N),
                    axis_name="seq", chunk_size=cfg.chunk_size,
                    D=p["D"], dt_bias=p["dt_bias"],
                    dt_limit=cfg.time_step_limit,
                    dt_mask=lv[None, :] if dropped else None,
                    seq_idx=None if dropped else seq_loc,
                    return_final_state=fill_cache,
                )
                if fill_cache:
                    y, final_state = y
                    layer_cache["ssm_state"] = final_state
                y = y.reshape(B, Lloc, d_inner)
                y = gated_rms_norm(
                    y, gate, p["norm"]["weight"],
                    eps=cfg.layer_norm_epsilon, group_size=d_inner // G,
                )
                out = _apply_linear(p["out_proj"], y)
            elif block_type == "attention":
                p = lp["mixer"]
                Hq, Hkv, hd = (cfg.num_attention_heads,
                               cfg.num_key_value_heads, cfg.head_dim)
                q = _apply_linear(p["q_proj"], normed).reshape(B, Lloc, Hq, hd)
                k = _apply_linear(p["k_proj"], normed).reshape(B, Lloc, Hkv, hd)
                v = _apply_linear(p["v_proj"], normed).reshape(B, Lloc, Hkv, hd)
                if fill_cache:
                    # generation needs the gathered KV for the cache anyway
                    o, (kg, vg_) = attention_seq_sharded(
                        q, k, v, axis_name="seq", kv_valid=vg,
                        seq_g=seq_glob, return_kv=True)
                    pad = cache_max_len - L_global
                    layer_cache["k"] = jnp.pad(
                        kg, ((0, 0), (0, pad), (0, 0), (0, 0))
                    ).astype(cache_dtype)
                    layer_cache["v"] = jnp.pad(
                        vg_, ((0, 0), (0, pad), (0, 0), (0, 0))
                    ).astype(cache_dtype)
                    if use_pdrop:
                        # THIS layer's validity (pdrop evolves vg between
                        # layers): a pre-stage layer keeps later-dropped
                        # rows attendable at decode, like the reference's
                        # per-layer cache (modeling_nano.py:1162-1165)
                        layer_cache["kv_valid"] = jnp.pad(
                            vg, (0, cache_max_len - L_global))
                else:
                    # pure prefill: ring attention — one KV block in
                    # flight instead of the full gathered KV
                    o = attention_seq_ring(
                        q, k, v, axis_name="seq", n_shards=n_seq_shards,
                        valid_g=vg, seq_g=seq_glob)
                out = _apply_linear(p["o_proj"], o.reshape(B, Lloc, Hq * hd))
            else:
                out = mlp_mixer_forward(lp["mixer"], cfg, normed)
            return zp(res + out, lv), layer_cache

        kinds = tuple(cfg.layers_block_type)
        ulen, reps = _find_repeat_unit(kinds)
        cache_layers: List[Any] = []

        if use_pdrop:
            # ---- masked pdrop under the seq mesh (VERDICT r2 ask #5) --
            # Shapes never change: dropped tokens stay in place but are
            # masked into exact no-ops everywhere (conv compaction, SSD
            # dt-zeroing, attention KV mask). No resharding collective is
            # needed; only the tiny ranking gather. Position bookkeeping
            # vanishes because nano attention has no RoPE — a masked
            # token's index never feeds any computation.
            assert B == 1, "sharded pdrop is generation-path (batch 1)"
            stages = cfg.pdrop_stages
            stage_by_layer = {s.layer: (i, s) for i, s in enumerate(stages)}
            nv0 = pdrop_num_vision
            iota = jnp.arange(L_global)
            vis_mask = ((iota >= pdrop_vision_start)
                        & (iota < pdrop_vision_start + nv0))
            suffix_start = pdrop_vision_start + nv0
            valid_g = iota >= valid_from
            cur_nv = nv0
            any_dropped = False
            ratios = (1.0,) + tuple(s.ratio for s in stages)
            ca_kvs: List[Any] = []
            for idx in range(len(kinds)):
                if idx in stage_by_layer:
                    si, stage = stage_by_layer[idx]
                    keep = min(int(nv0 * ratios[si + 1]), cur_nv)
                    if stage.compress_type == "uni":
                        vv = valid_g & vis_mask
                        rank = jnp.cumsum(vv.astype(jnp.int32)) - 1
                        keep_ranks = jnp.asarray(
                            jnp.linspace(0, cur_nv - 1, keep), jnp.int32)
                        krm = jnp.zeros((cur_nv,), bool).at[
                            keep_ranks].set(True)
                        keep_mask = vv & krm[jnp.clip(rank, 0, cur_nv - 1)]
                    elif stage.compress_type == "attn":
                        scores = _rank_scores_attn_sharded(
                            hidden, params["layers"][idx]["mixer"], cfg,
                            pdrop_query_pos, "seq", my, Lloc, valid_g)
                        svis = jnp.where(valid_g & vis_mask, scores,
                                         -jnp.inf)
                        _, keep_idx = jax.lax.top_k(svis, keep)
                        keep_mask = jnp.zeros((L_global,), bool).at[
                            keep_idx].set(True)
                    else:
                        raise NotImplementedError(stage.compress_type)
                    new_valid = jnp.where(vis_mask, keep_mask, valid_g)
                    n_drop = cur_nv - keep
                    stage_merge = (merge_params[si]
                                   if merge_params is not None
                                   and si < len(merge_params) else None)
                    ca_kv = None
                    if stage_merge is not None and n_drop > 0:
                        dropped_mask = valid_g & vis_mask & ~new_valid
                        hidden, ca_kv = _transv_merge_sharded(
                            hidden, stage_merge, cfg, dropped_mask,
                            pos >= suffix_start, "seq", n_drop,
                            fill_cache)
                    ca_kvs.append(ca_kv if ca_kv is not None else {})
                    valid_g = new_valid
                    cur_nv = keep
                    any_dropped = any_dropped or n_drop > 0
                lv = jax.lax.dynamic_slice(valid_g, (my * Lloc,), (Lloc,))
                hidden, lc = apply_layer(
                    params["layers"][idx], kinds[idx], hidden,
                    lv=lv, vg=valid_g, dropped=any_dropped)
                cache_layers.append(lc)
            hidden = rms_norm(hidden, params["norm_f"]["weight"],
                              eps=cfg.layer_norm_epsilon)
            tail = hidden[:, -logits_to_keep:]
            tails = jax.lax.all_gather(tail, "seq")
            logits = compute_logits(params, tails[-1])
            if not fill_cache:
                return logits
            kv_valid_cache = jnp.pad(
                valid_g, (0, cache_max_len - L_global))
            cache = {
                "layers": cache_layers,
                "length": jnp.asarray(L_global, jnp.int32),
                "valid_from": valid_from,
                "kv_valid": kv_valid_cache,
            }
            if any(len(c) for c in ca_kvs):
                cache["ca_kv"] = ca_kvs
            return logits, cache

        if reps >= 2 and _scan_layers_enabled():
            # scan over the repeated layer unit: the 52-layer 9B pattern is
            # 4 x "M-M-M-M*-M-" + an 8-layer tail, so the traced program
            # holds 11+8 layer bodies instead of 52 — the single biggest
            # XLA-compile-time lever for this model (same trick as
            # T5X/MaxText scanned layers). Off on real TPUs by default:
            # stacking transiently duplicates the scanned weights in HBM.
            unit_kinds = kinds[:ulen]
            stacked = [
                jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs),
                    *[params["layers"][r * ulen + j] for r in range(reps)],
                )
                for j in range(ulen)
            ]

            def unit_body(hidden, unit_params):
                caches = []
                for j, bt in enumerate(unit_kinds):
                    hidden, lc = apply_layer(unit_params[j], bt, hidden)
                    caches.append(lc)
                return hidden, tuple(caches)

            hidden, unit_caches = jax.lax.scan(
                unit_body, hidden, tuple(stacked))
            for r in range(reps):
                for j in range(ulen):
                    cache_layers.append(jax.tree_util.tree_map(
                        lambda x, _r=r: x[_r], unit_caches[j]))
            tail_start = reps * ulen
        else:
            tail_start = 0
        for idx in range(tail_start, len(kinds)):
            hidden, lc = apply_layer(params["layers"][idx], kinds[idx],
                                     hidden)
            cache_layers.append(lc)
        hidden = rms_norm(hidden, params["norm_f"]["weight"],
                          eps=cfg.layer_norm_epsilon)
        # last device holds the final tokens; gather the tail
        tail = hidden[:, -logits_to_keep:]
        tails = jax.lax.all_gather(tail, "seq")  # (ndev, B, k, D)
        logits = compute_logits(params, tails[-1])
        if return_hidden:
            return logits, hidden
        if not fill_cache:
            return logits
        cache = {
            "layers": cache_layers,
            "length": jnp.asarray(L_global, jnp.int32),
            "valid_from": valid_from,
        }
        return logits, cache

    from jax.experimental.shard_map import shard_map

    if return_hidden:
        out_specs: Any = (P("data"), P("data", "seq", None))
    elif fill_cache:
        out_specs = (P("data"), P())
    else:
        out_specs = P("data")
    fn = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P("data", "seq", None), P("data", "seq"),
                  P(), P(), P(), P()),
        out_specs=out_specs,
        check_rep=False,
    )
    return fn(params, inputs_embeds, seq_idx, valid_from,
              pdrop_vision_start, pdrop_query_pos, merge_params_arg)


def encode_frames_seq_parallel(
    vparams: Dict[str, Any],
    pparams: Dict[str, Any],
    vcfg,
    pixels: jax.Array,  # (F, H, W, 3); F divisible by mesh seq size
    mesh: Mesh,
    *,
    projector_type: str = "tome_mlp",
    num_compressed_tokens: int = 16,
) -> jax.Array:
    """Vision encode + ToMe + projector sharded over the `seq` axis.

    ToMe merges within a frame (tome.py:86-177) and the projector is
    per-token, so the whole vision stage is frame-local: each device
    encodes its span of frames and emits its local span of fused visual
    tokens — the exact sharding `nano_prefill_seq_parallel` consumes, with
    ZERO collectives (the north star's "visual tokens over ICI",
    BASELINE.md). Returns (1, F*num_compressed_tokens, llm_dim) sharded
    along axis 1."""
    from jax.experimental.shard_map import shard_map

    from timeviper_tpu.models.projector import projector_forward
    from timeviper_tpu.models.vit import vit_forward

    def local(vp, pp, px):
        feats = vit_forward(vp, vcfg, px)  # (Floc, patches, vdim)
        proj = projector_forward(
            pp, feats, projector_type=projector_type,
            num_compressed_tokens=num_compressed_tokens)
        Floc, T_, D_ = proj.shape
        return proj.reshape(1, Floc * T_, D_)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("seq", None, None, None)),
        out_specs=P(None, "seq", None),
        check_rep=False,
    )
    return fn(vparams, pparams, pixels)


def _halo_conv(x, conv_params, cfg, axis_name, seq_idx=None):
    """Depthwise causal conv with a (K-1)-token halo from the left
    neighbor: shift the last K-1 tokens one device to the right, prepend,
    convolve, drop the halo.

    With packed `seq_idx` (B, Lloc), the halo rows carry the left
    neighbor's trailing segment id, so taps crossing a segment boundary —
    at the seam or inside the span — mask to causal zero-padding inside
    `causal_conv1d` (its seq_idx semantics, ops/conv.py)."""
    K = cfg.mamba_d_conv
    halo = x[:, -(K - 1):, :]
    ndev = jax.lax.psum(1, axis_name)
    # send right: device i's halo -> device i+1
    perm = [(i, i + 1) for i in range(ndev - 1)]
    from_left = jax.lax.ppermute(halo, axis_name, perm)
    # device 0 receives zeros (causal left padding)
    my = jax.lax.axis_index(axis_name)
    from_left = jnp.where(my == 0, jnp.zeros_like(from_left), from_left)
    xp = jnp.concatenate([from_left, x], axis=1)
    ext_seq = None
    if seq_idx is not None:
        halo_seg = jnp.broadcast_to(
            seq_idx[:, -1:], (seq_idx.shape[0], K - 1))
        seg_left = jax.lax.ppermute(halo_seg, axis_name, perm)
        # device 0's halo is causal zero-padding: a never-matching id
        seg_left = jnp.where(my == 0, jnp.full_like(seg_left, -1), seg_left)
        ext_seq = jnp.concatenate([seg_left, seq_idx], axis=1)
    y = causal_conv1d(
        xp, conv_params["weight"], conv_params["bias"],
        activation=cfg.mamba_hidden_act, seq_idx=ext_seq,
    )
    return y[:, K - 1:, :]
