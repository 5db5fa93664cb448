"""Pallas TPU kernel for the Mamba-2 SSD chunked scan.

Replaces the reference's Triton `mamba_chunk_scan_combined`
(modeling_nano.py:61-65; algorithm spec :671-860) with a TPU-native design:

* Grid = (batch, groups, chunks) with the *chunk* axis innermost. TPU grid
  steps execute sequentially on a core, so the inter-chunk state recurrence
  is carried in a VMEM scratch accumulator across grid steps — no second
  pass, no materialized (L/cs, cs, cs) attention tensor in HBM.
* Within a chunk, the "attention" matrix C·Bᵀ (cs × cs) is computed ONCE per
  group on the MXU and reused by all H/G heads of the group; per head it is
  masked by the exp(ΣdA) decay (a VPU op) and matmul'd with the discretized
  inputs.
* All state math is float32 (matching the Triton kernel's accumulators);
  x/B/C tiles stream in as bf16 and feed the MXU directly.
* Packed sequences: per-position segment ids mask the intra-chunk decay, the
  chunk-boundary contribution, and the inbound state, so states reset at
  segment starts — in prefill too (the reference's prefill dropped seq_idx,
  modeling_nano.py:648).

PERF NOTE (round-1 measurements, latency-corrected — the axon tunnel
adds ~30 ms per dispatch+fetch, so single-op timings lie): at the 9B
scale / L=8192 this kernel runs ~5.7 ms vs ~12.1 ms for the XLA-fused jnp
path (2.1x). The host-side layout transposes are sub-ms (the earlier
"32 ms transpose" reading was pure tunnel latency). A native-layout
variant (5D blocked views + per-head sublane loads) also exists
(verified in interpret mode) but crashes this image's remote Mosaic
compile helper; revisit on a standard libtpu toolchain if more is needed.

Backward: `ssd` is a custom_vjp whose forward runs this kernel and whose
backward rematerializes through the pure-jnp `ssd_chunked` (ops/ssd.py) under
XLA AD — numerically identical algorithm, so gradients are consistent.

VMEM budget per grid step (9B config: cs=256, R=16 heads/group, P=64,
N=128): x/y tiles 0.5-1 MB, CB 0.25 MB, state carry 0.5 MB — comfortably
inside the ~16 MB VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timeviper_tpu.ops.ssd import ssd_chunked


def _ssd_kernel(
    # inputs (leading batch/group dims squeezed via BlockSpec None dims)
    x_ref,      # (R, cs, P) x for this (batch, group, chunk)
    dt_ref,     # (R, cs) raw dt
    A_ref,      # (G, R) A (negative reals), full array
    dtb_ref,    # (G, R) dt_bias, full array
    B_ref,      # (cs, N)
    C_ref,      # (cs, N)
    D_ref,      # (G, R), full array
    seg_ref,    # (cs,) int32 segment ids
    # outputs: y_ref, st_ref, then hin_ref when save_prev; scratch last
    *refs,
    R: int,
    cs: int,
    P: int,
    N: int,
    nc: int,
    dt_softplus: bool,
    dt_lo: float,
    dt_hi: float,
    save_prev: bool = False,
    with_init: bool = False,
    fuse_conv: bool = False,
):
    # unpack the variadic refs: [conv weights] + [init] + outputs + scratch
    i = 0
    if fuse_conv:
        wx_ref, bx_ref, wB_ref, bB_ref, wC_ref, bC_ref = refs[i:i + 6]
        i += 6
    if with_init:
        init_ref = refs[i]
        i += 1
    else:
        init_ref = None
    y_ref, st_ref = refs[i:i + 2]
    i += 2
    if save_prev:
        hin_ref = refs[i]
        i += 1
    else:
        hin_ref = None
    state, segprev = refs[i:i + 2]
    i += 2
    if fuse_conv:
        halo_x, halo_B, halo_C, haloseg = refs[i:i + 4]

    g = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        if init_ref is None:
            state[...] = jnp.zeros_like(state)
        else:
            # chunked long-context prefill: continue from the carried
            # state; the caller guarantees segment continuity at the seam
            state[...] = init_ref[...]
        segprev[0] = seg_ref[0]
        if fuse_conv:
            halo_x[...] = jnp.zeros_like(halo_x)
            halo_B[...] = jnp.zeros_like(halo_B)
            halo_C[...] = jnp.zeros_like(halo_C)
            for t in range(3):
                haloseg[t] = -1  # causal start: halo taps masked out

    if hin_ref is not None:
        # inbound state of THIS chunk — the backward kernel's residual
        hin_ref[...] = state[...]

    seg = seg_ref[...]  # (cs,)
    seg_prev = segprev[0]
    in_dtype = x_ref.dtype

    if fuse_conv:
        # --- fused depthwise causal conv (K=4) + SiLU over raw [x|B|C] ---
        # The reference fuses conv+scan in one Triton kernel
        # (mamba_split_conv1d_scan_combined, modeling_nano.py:61-65); here
        # the chunk tiles are already resident in VMEM, so convolving
        # in-kernel removes two full HBM round trips of the 18560-wide
        # activations per layer. Halo rows (last K-1 raw inputs of the
        # previous chunk) are carried in scratch; taps crossing a segment
        # boundary are zeroed (packed-prefill semantics, ops/conv.py).
        K = 4
        iota_cs = jax.lax.broadcasted_iota(jnp.int32, (cs,), 0)

        def _tap_mask(k):
            # positions whose k-back tap stays inside their segment —
            # kept float32: Mosaic only lowers minor-dim broadcasts of
            # 32-bit types ("Insertion of minor dim ... 32-bit")
            m = (jnp.roll(seg, k) == seg).astype(jnp.float32)
            for t in range(k):
                m = jnp.where(
                    iota_cs == t,
                    (haloseg[3 - k + t] == seg_ref[t]).astype(jnp.float32),
                    m)
            return m

        def _onehot(t):
            return (iota_cs == t).astype(jnp.float32)

        # all conv math in f32: Mosaic restricts minor-dim broadcasts and
        # lane-slice shape casts for 16-bit types, and the elementwise cost
        # is negligible next to the kernel's matmuls
        def _conv3d(raw, halo_ref, w_ref, b_ref):
            # raw: (R, cs, P); w_ref: (K, G, R, P); halo rows 0..2
            rf = raw.astype(jnp.float32)
            acc = rf * w_ref[K - 1, g][:, None, :]
            for k in range(1, K):
                src = jnp.roll(rf, k, axis=1)
                for t in range(k):
                    oh = _onehot(t)[None, :, None]
                    src = src * (1 - oh) + halo_ref[
                        :, 3 - k + t: 4 - k + t, :] * oh
                m = _tap_mask(k)[None, :, None]
                acc = acc + (src * m) * w_ref[K - 1 - k, g][:, None, :]
            acc = acc + b_ref[g][:, None, :]
            return (acc * jax.nn.sigmoid(acc)).astype(in_dtype)

        def _conv2d(raw, halo_ref, w_ref, b_ref):
            # raw: (cs, N); w_ref: (K, G, N); halo rows 0..2
            rf = raw.astype(jnp.float32)
            acc = rf * w_ref[K - 1, g][None, :]
            for k in range(1, K):
                src = jnp.roll(rf, k, axis=0)
                for t in range(k):
                    oh = _onehot(t)[:, None]
                    src = src * (1 - oh) + halo_ref[
                        3 - k + t: 4 - k + t, :] * oh
                m = _tap_mask(k)[:, None]
                acc = acc + (src * m) * w_ref[K - 1 - k, g][None, :]
            acc = acc + b_ref[g][None, :]
            return (acc * jax.nn.sigmoid(acc)).astype(in_dtype)

        xraw = x_ref[...]
        Braw = B_ref[...]
        Craw = C_ref[...]
        xv = _conv3d(xraw, halo_x, wx_ref, bx_ref)
        Bc = _conv2d(Braw, halo_B, wB_ref, bB_ref)
        Cc = _conv2d(Craw, halo_C, wC_ref, bC_ref)
        # carry the last K-1 RAW rows + their segment ids to the next chunk
        halo_x[:, 0:3, :] = xraw[:, cs - 3:, :].astype(jnp.float32)
        halo_B[0:3, :] = Braw[cs - 3:, :].astype(jnp.float32)
        halo_C[0:3, :] = Craw[cs - 3:, :].astype(jnp.float32)
        for t in range(3):
            haloseg[t] = seg_ref[cs - 3 + t]
    else:
        xv = x_ref[...]
        Bc = B_ref[...]  # (cs, N)
        Cc = C_ref[...]

    dt = dt_ref[...].astype(jnp.float32) + dtb_ref[g][:, None]  # (R, cs)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    if dt_lo > 0.0 or dt_hi != float("inf"):
        dt = jnp.clip(dt, dt_lo, dt_hi)

    A = A_ref[g]  # (R,)
    dA = dt * A[:, None]  # (R, cs)
    # cumsum along the lane dim via a triangular-ones matmul (Mosaic has no
    # native cumsum; one (R,cs)x(cs,cs) MXU op is cheap)
    ii0 = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    jj0 = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    tri = (ii0 <= jj0).astype(jnp.float32)  # U[j, i] = 1 if j <= i
    Acs = jax.lax.dot_general(
        dA, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, cs)

    # matmul operands stay in the input dtype (bf16 on the fast path, like
    # the Triton kernel's tensor-core usage); accumulation is f32 everywhere
    # group-shared "attention" logits: CB[i, j] = C_i · B_j
    CB = jax.lax.dot_general(
        Cc, Bc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (cs, cs) f32

    # masks shared across the group's heads
    ii = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    causal = ii >= jj
    same_seg = seg[:, None] == seg[None, :]  # (cs, cs)
    keep2d = causal & same_seg

    # per-position masks for the carried (inbound) state
    cont = (seg == seg_prev).astype(jnp.float32)  # (cs,)
    # chunk transition factor: zero if any internal boundary or new segment
    no_boundary = jnp.logical_and(
        seg[0] == seg[cs - 1], seg[0] == seg_prev
    ).astype(jnp.float32)
    # keep mask for local chunk states (positions in the chunk-final segment)
    keep_last = (seg == seg[cs - 1]).astype(jnp.float32)  # (cs,)

    xf = xv.astype(jnp.float32)  # (R, cs, P)
    xdt = xf * dt[:, :, None]  # (R, cs, P) f32
    xdt_mm = xdt.astype(in_dtype)  # matmul operand in input dtype

    for h in range(R):  # static unroll over the group's heads
        Acs_h = Acs[h]  # (cs,)
        # decay matrix exp(Acs_i - Acs_j), masked
        Lh = jnp.exp(Acs_h[:, None] - Acs_h[None, :])
        M = jnp.where(keep2d, CB * Lh, 0.0)  # (cs, cs) f32
        y_diag = jax.lax.dot_general(
            M.astype(x_ref.dtype), xdt_mm[h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cs, P)

        # inbound state contribution: C_i · h_in * exp(Acs_i), masked by cont
        h_in = state[h]  # (P, N) f32
        y_off = jax.lax.dot_general(
            Cc, h_in.astype(x_ref.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cs, P)
        w_out = jnp.exp(Acs_h) * cont  # (cs,)
        y = y_diag + y_off * w_out[:, None]
        y = y + D_ref[g, h] * xf[h]
        y_ref[h] = y.astype(y_ref.dtype)

        # local chunk state: sum_j exp(Acs_end - Acs_j) dt_j x_j B_jᵀ
        w_st = jnp.exp(Acs_h[cs - 1] - Acs_h) * keep_last  # (cs,)
        st_local = jax.lax.dot_general(
            (xdt[h] * w_st[:, None]).astype(x_ref.dtype), Bc,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, N)
        chunk_decay = jnp.exp(Acs_h[cs - 1]) * no_boundary
        state[h] = state[h] * chunk_decay + st_local

    segprev[0] = seg[cs - 1]

    @pl.when(c == nc - 1)
    def _():
        st_ref[...] = state[...]


def _ssd_pallas_fwd(
    x: jax.Array,     # (B, L, H, P)
    dt: jax.Array,    # (B, L, H)
    A: jax.Array,     # (H,)
    B_: jax.Array,    # (B, L, G, N)
    C: jax.Array,     # (B, L, G, N)
    chunk_size: int,
    D: Optional[jax.Array],
    dt_bias: Optional[jax.Array],
    dt_softplus: bool,
    dt_limit: Tuple[float, float],
    seq_idx: Optional[jax.Array],
    interpret: bool = False,
    save_prev: bool = False,
    initial_state: Optional[jax.Array] = None,  # (B, H, P, N) f32
    conv_params: Optional[dict] = None,  # fused conv: {wx,bx,wB,bB,wC,bC}
):
    assert not (save_prev and initial_state is not None)
    assert conv_params is None or not save_prev, (
        "fused conv is the inference path; the bwd kernel has no conv")
    Bsz, L, H, P = x.shape
    G, N = B_.shape[-2], B_.shape[-1]
    R = H // G
    cs = chunk_size
    pad = (cs - L % cs) % cs
    Lp = L + pad
    nc = Lp // cs

    if seq_idx is None:
        seq_idx = jnp.zeros((Bsz, L), jnp.int32)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B_ = jnp.pad(B_, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # dt pads are raw zeros -> after softplus+bias NOT zero; guard by
        # padding seq with the last id (pads contribute x=0·dt to states but
        # nonzero decay... so instead mark pads as same segment: their x is 0
        # so dBx = 0; decay factor would shrink the final state though.
        # Pads must end up with EFFECTIVE dt == 0 (exp(0)=1 decay): with
        # softplus that's raw -inf; with pre-activated dt (dt_softplus=False
        # — e.g. the masked-pdrop sharded path and the prefix-cache
        # continuation) -inf would make dA = -inf*A = +inf and poison the
        # state, so pad with literal 0 instead. The caller must pair
        # dt_softplus=False with dt_limit[0] == 0, else the in-kernel clamp
        # raises pad dt to dt_lo.
        padmask = jnp.arange(Lp) >= L
        pad_dt = -jnp.inf if dt_softplus else 0.0
        dt = jnp.where(padmask[None, :, None], pad_dt, dt)
        seq_idx = jnp.pad(seq_idx, ((0, 0), (0, pad)), mode="edge")

    # blocked layouts
    xb = jnp.transpose(x, (0, 2, 1, 3)).reshape(Bsz, G, R, Lp, P)
    dtb = jnp.transpose(dt, (0, 2, 1)).reshape(Bsz, G, R, Lp)
    Bb = jnp.transpose(B_, (0, 2, 1, 3))  # (B, G, Lp, N)
    Cb = jnp.transpose(C, (0, 2, 1, 3))
    Ab = A.reshape(G, R)
    dtbias = (
        dt_bias if dt_bias is not None else jnp.zeros((H,), jnp.float32)
    ).reshape(G, R).astype(jnp.float32)
    Db = (
        D if D is not None else jnp.zeros((H,), jnp.float32)
    ).reshape(G, R).astype(jnp.float32)

    kernel = functools.partial(
        _ssd_kernel,
        R=R, cs=cs, P=P, N=N, nc=nc,
        dt_softplus=dt_softplus,
        dt_lo=float(dt_limit[0]), dt_hi=float(dt_limit[1]),
        save_prev=save_prev,
        with_init=initial_state is not None,
        fuse_conv=conv_params is not None,
    )

    in_specs_extra = []
    extra_args = []
    conv_scratch = []
    if conv_params is not None:
        K = conv_params["wx"].shape[-1]
        assert K == 4, K  # halo scratch is sized for the reference K
        # full-array blocks, indexed in-kernel (like A_ref); K leads so no
        # lane-slicing of the 4-wide tap dim is ever needed
        in_specs_extra += [
            pl.BlockSpec((K, G, R, P), lambda b, g, c: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R, P), lambda b, g, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, G, N), lambda b, g, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, G, N), lambda b, g, c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, N), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        f32 = jnp.float32
        extra_args += [
            conv_params["wx"].reshape(G, R, P, K).transpose(3, 0, 1, 2)
            .astype(f32),
            conv_params["bx"].reshape(G, R, P).astype(f32),
            conv_params["wB"].reshape(G, N, K).transpose(2, 0, 1).astype(f32),
            conv_params["bB"].reshape(G, N).astype(f32),
            conv_params["wC"].reshape(G, N, K).transpose(2, 0, 1).astype(f32),
            conv_params["bC"].reshape(G, N).astype(f32),
        ]
        conv_scratch = [
            pltpu.VMEM((R, 8, P), jnp.float32),   # halo_x rows 0..2
            pltpu.VMEM((8, N), jnp.float32),      # halo_B
            pltpu.VMEM((8, N), jnp.float32),      # halo_C
            pltpu.SMEM((4,), jnp.int32),          # halo segment ids
        ]
    if initial_state is not None:
        in_specs_extra.append(
            pl.BlockSpec((None, None, R, P, N),
                         lambda b, g, c: (b, g, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        extra_args.append(
            initial_state.astype(jnp.float32).reshape(Bsz, G, R, P, N))

    out_specs = [
        pl.BlockSpec((None, None, R, cs, P), lambda b, g, c: (b, g, 0, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, R, P, N), lambda b, g, c: (b, g, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bsz, G, R, Lp, P), x.dtype),
        jax.ShapeDtypeStruct((Bsz, G, R, P, N), jnp.float32),
    ]
    if save_prev:
        out_specs.append(
            pl.BlockSpec((None, None, None, R, P, N),
                         lambda b, g, c: (b, g, c, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((Bsz, G, nc, R, P, N), jnp.float32))

    grid = (Bsz, G, nc)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, R, cs, P), lambda b, g, c: (b, g, 0, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, R, cs), lambda b, g, c: (b, g, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cs, N), lambda b, g, c: (b, g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cs, N), lambda b, g, c: (b, g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cs), lambda b, g, c: (b, c),
                         memory_space=pltpu.VMEM),
        ] + in_specs_extra,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((R, P, N), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ] + conv_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, dtb, Ab, dtbias, Bb, Cb, Db, seq_idx, *extra_args)

    y, st = outs[0], outs[1]
    y = jnp.transpose(y.reshape(Bsz, H, Lp, P), (0, 2, 1, 3))
    if pad:
        y = y[:, :L]
    final_state = st.reshape(Bsz, H, P, N)
    if save_prev:
        return y, final_state, outs[2]  # hin: (B, G, nc, R, P, N) f32
    return y, final_state


# ---------------------------------------------------------------------------
# Backward kernel: reverse-chunk grid carrying the state cotangent in VMEM
# ---------------------------------------------------------------------------
#
# The training-path analog of the reference's fused Triton backward
# (`mamba_chunk_scan_combined`'s bwd / `mamba_split_conv1d_scan_combined`,
# modeling_nano.py:61-65, train path :561-580). Chunks are visited in
# REVERSE order; the (R, P, N) cotangent of the chunk-boundary state is
# carried across grid steps in VMEM scratch (mirroring the forward's state
# carry), per-chunk inbound states come from the forward's `save_prev`
# output, and the per-head scalar grads (dA, d dt_bias, dD) accumulate in
# scratch and are written at the last grid step.


def _ssd_bwd_kernel(
    # inputs
    x_ref,      # (R, cs, P)
    dt_ref,     # (R, cs) raw dt
    A_ref,      # (G, R)
    dtb_ref,    # (G, R)
    B_ref,      # (cs, N)
    C_ref,      # (cs, N)
    D_ref,      # (G, R)
    seg_ref,    # (cs,) this chunk's segment ids
    segp_ref,   # (cs,) previous chunk's segment ids (chunk ci-1; ci=0 -> ci)
    hin_ref,    # (R, P, N) f32 inbound state of this chunk (fwd residual)
    dy_ref,     # (R, cs, P) output cotangent
    dst_ref,    # (R, P, N) f32 final-state cotangent
    # outputs
    dx_ref,     # (R, cs, P)
    ddt_ref,    # (R, cs)
    dB_ref,     # (cs, N) f32 (group-shared, accumulated over heads)
    dC_ref,     # (cs, N) f32
    dacc_ref,   # (3, R) per (b, g): [dA, d dt_bias, dD]; written at last step
    # scratch
    dh,         # VMEM (R, P, N) f32: cotangent of this chunk's OUT state
    acc,        # VMEM (3, R) f32: [dA, ddt_bias, dD] accumulators
    *,
    R: int,
    cs: int,
    P: int,
    N: int,
    nc: int,
    dt_softplus: bool,
    dt_lo: float,
    dt_hi: float,
):
    g = pl.program_id(1)
    c = pl.program_id(2)
    ci = nc - 1 - c  # data chunk index (reverse traversal)

    @pl.when(c == 0)
    def _():
        dh[...] = dst_ref[...]
        acc[...] = jnp.zeros_like(acc)

    seg = seg_ref[...]
    seg_prev = jnp.where(ci == 0, seg[0], segp_ref[cs - 1])

    # --- recompute chunk-local quantities (same math as forward) ---
    dt_raw = dt_ref[...].astype(jnp.float32) + dtb_ref[g][:, None]  # (R, cs)
    if dt_softplus:
        sp = jax.nn.softplus(dt_raw)
        sig = jax.nn.sigmoid(dt_raw)
    else:
        sp = dt_raw
        sig = jnp.ones_like(dt_raw)
    clipped = dt_lo > 0.0 or dt_hi != float("inf")
    if clipped:
        dtp = jnp.clip(sp, dt_lo, dt_hi)
        clipmask = ((sp > dt_lo) & (sp < dt_hi)).astype(jnp.float32)
    else:
        dtp = sp
        clipmask = None

    A = A_ref[g]  # (R,)
    dA_pos = dtp * A[:, None]  # (R, cs)
    ii0 = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 0)
    jj0 = jax.lax.broadcasted_iota(jnp.int32, (cs, cs), 1)
    tri = (ii0 <= jj0).astype(jnp.float32)      # cumsum operator
    sfx = (ii0 >= jj0).astype(jnp.float32)      # suffix-sum operator
    Acs = jax.lax.dot_general(
        dA_pos, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, cs) inclusive cumsum of dt*A

    Bc = B_ref[...]  # (cs, N)
    Cc = C_ref[...]
    CB = jax.lax.dot_general(
        Cc, Bc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (cs, cs)

    causal = ii0 >= jj0
    same_seg = seg[:, None] == seg[None, :]
    keep2d = causal & same_seg
    cont = (seg == seg_prev).astype(jnp.float32)
    no_boundary = jnp.logical_and(
        seg[0] == seg[cs - 1], seg[0] == seg_prev
    ).astype(jnp.float32)
    keep_last = (seg == seg[cs - 1]).astype(jnp.float32)
    last_onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (cs,), 0) == cs - 1
    ).astype(jnp.float32)

    in_dtype = x_ref.dtype
    xf = x_ref[...].astype(jnp.float32)        # (R, cs, P)
    dyf = dy_ref[...].astype(jnp.float32)
    xdt = xf * dtp[:, :, None]
    xdt_mm = xdt.astype(in_dtype)
    dy_mm = dy_ref[...].astype(in_dtype)
    Bc_mm = Bc.astype(in_dtype)
    Cc_mm = Cc.astype(in_dtype)

    dB_acc = jnp.zeros((cs, N), jnp.float32)
    dC_acc = jnp.zeros((cs, N), jnp.float32)
    # per-head scalar grads packed into a (3, R) delta via masks — Mosaic
    # cannot store scalars to VMEM, so acc is updated with one vector add.
    # All reductions below go through MXU dots with ones-vectors: Mosaic's
    # multi_reduction cannot lower some 1-element-result layouts
    # ("Not implemented: Offset change").
    acc_delta = jnp.zeros((3, R), jnp.float32)
    acc_row = jax.lax.broadcasted_iota(jnp.int32, (3, R), 0)
    acc_col = jax.lax.broadcasted_iota(jnp.int32, (3, R), 1)
    # Reduction helpers. Mosaic rejects both 1-element multi_reductions
    # ("Offset change") and unit-row dots ("only constant accumulators"),
    # so every reduction here is an 8-row MXU dot against a ones matrix;
    # row 0 of the (8, ...) result is the answer (all rows identical).
    ones8 = {K: jnp.ones((8, K), jnp.float32) for K in {cs, P, N}}

    def _rsum(m):
        # (cs, K) -> (cs,): Σ_k m[i, k]
        K = m.shape[-1]
        return jax.lax.dot_general(
            ones8[K], m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[0]

    def _csum(m):
        # (K, cs) -> (cs,): Σ_k m[k, j]
        K = m.shape[0]
        return jax.lax.dot_general(
            ones8[K], m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]

    def _tot(vec):
        # (K,) -> scalar
        K = vec.shape[0]
        v8 = jnp.broadcast_to(vec[None, :], (8, K))
        return jax.lax.dot_general(
            v8, ones8[K], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[0, 0]

    for h in range(R):  # static unroll over the group's heads
        Acs_h = Acs[h]
        Lh = jnp.exp(Acs_h[:, None] - Acs_h[None, :])
        h_in = hin_ref[h]                       # (P, N) f32
        h_in_mm = h_in.astype(in_dtype)
        dh_h = dh[h]                            # (P, N) f32
        dh_mm = dh_h.astype(in_dtype)
        w_out = jnp.exp(Acs_h) * cont           # (cs,)
        w_st = jnp.exp(Acs_h[cs - 1] - Acs_h) * keep_last
        cdecay = jnp.exp(Acs_h[cs - 1]) * no_boundary

        # dM[i,j] = dy_i · xdt_j  (contract P)
        dM = jax.lax.dot_general(
            dy_mm[h], xdt_mm[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cs, cs)
        dCB = jnp.where(keep2d, dM * Lh, 0.0)
        E = dCB * CB  # = dM ⊙ M on kept entries

        # (cs, N) cross terms
        dy_hin = jax.lax.dot_general(
            dy_mm[h], h_in_mm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dy @ h_in
        xdt_dh = jax.lax.dot_general(
            xdt_mm[h], dh_mm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # xdt @ dh

        dCB_mm = dCB.astype(in_dtype)
        dC_acc += jax.lax.dot_general(
            dCB_mm, Bc_mm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + w_out[:, None] * dy_hin
        dB_acc += jax.lax.dot_general(
            dCB_mm, Cc_mm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + w_st[:, None] * xdt_dh

        # dxdt[j] = Σ_i M[i,j] dy_i + w_st[j] (B_j · dh)
        Mm = jnp.where(keep2d, CB * Lh, 0.0)
        dxdt = jax.lax.dot_general(
            Mm.astype(in_dtype), dy_mm[h], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + w_st[:, None] * jax.lax.dot_general(
            Bc_mm, dh_mm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (cs, P)

        # gradient wrt the cumsum Acs (then suffix-sum -> per-position dA)
        rowE = _rsum(E)                         # (cs,) Σ_j E[i,j]
        colE = _csum(E)                         # (cs,) Σ_i E[i,j]
        t = w_out * _rsum(dy_hin * Cc)
        u = w_st * _rsum(xdt_dh * Bc)
        v = cdecay * _tot(_csum(dh_h * h_in))   # Σ_{p,n} dh·h_in
        da = rowE - colE + t - u + last_onehot * (_tot(u) + v)
        da8 = jnp.broadcast_to(da[None, :], (8, cs))
        ddA = jax.lax.dot_general(
            da8, sfx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[0]  # (cs,) suffix sum: ddA_j = Σ_{i>=j} da_i

        dx_h = dxdt * dtp[h][:, None] + D_ref[g, h] * dyf[h]
        ddt_proc = _rsum(dxdt * xf[h]) + ddA * A[h]
        ddt_raw = ddt_proc * sig[h]
        if clipmask is not None:
            ddt_raw = ddt_raw * clipmask[h]
        dx_ref[h] = dx_h.astype(dx_ref.dtype)
        ddt_ref[h] = ddt_raw.astype(ddt_ref.dtype)

        vals = (_tot(ddA * dtp[h]),             # dA
                _tot(ddt_raw),                  # d dt_bias
                _tot(_rsum(dyf[h] * xf[h])))    # dD
        for row, val in enumerate(vals):
            acc_delta += jnp.where(
                (acc_row == row) & (acc_col == h), val, 0.0)

        # cotangent of the INBOUND state -> carried to previous chunk
        dy_w = (dyf[h] * w_out[:, None]).astype(in_dtype)  # (cs, P)
        dh[h] = cdecay * dh_h + jax.lax.dot_general(
            dy_w, Cc_mm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, N)

    dB_ref[...] = dB_acc
    dC_ref[...] = dC_acc
    acc[...] += acc_delta

    @pl.when(c == nc - 1)
    def _():
        dacc_ref[...] = acc[...]


def _ssd_pallas_bwd(
    x, dt, A, B_, C, D, dt_bias, seq_idx, hin,
    gy, gstate, chunk_size, dt_softplus, dt_limit,
    interpret: bool = False,
):
    """Run the backward kernel; returns grads matching ssd_chunked's args.

    hin: (B, G, nc, R, P, N) f32 per-chunk inbound states from the forward.
    gy: (B, L, H, P) cotangent of y; gstate: (B, H, P, N) of the final state.
    """
    Bsz, L, H, P = x.shape
    G, N = B_.shape[-2], B_.shape[-1]
    R = H // G
    cs = chunk_size
    pad = (cs - L % cs) % cs
    Lp = L + pad
    nc = Lp // cs

    if seq_idx is None:
        seq_idx = jnp.zeros((Bsz, L), jnp.int32)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B_ = jnp.pad(B_, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
        gy = jnp.pad(gy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        padmask = jnp.arange(Lp) >= L
        # same pad rule as the forward: effective dt must be 0 at pads
        dt = jnp.where(padmask[None, :, None],
                       -jnp.inf if dt_softplus else 0.0, dt)
        seq_idx = jnp.pad(seq_idx, ((0, 0), (0, pad)), mode="edge")

    xb = jnp.transpose(x, (0, 2, 1, 3)).reshape(Bsz, G, R, Lp, P)
    dtb = jnp.transpose(dt, (0, 2, 1)).reshape(Bsz, G, R, Lp)
    Bb = jnp.transpose(B_, (0, 2, 1, 3))
    Cb = jnp.transpose(C, (0, 2, 1, 3))
    gyb = jnp.transpose(gy, (0, 2, 1, 3)).reshape(Bsz, G, R, Lp, P)
    gstb = gstate.astype(jnp.float32).reshape(Bsz, G, R, P, N)
    Ab = A.astype(jnp.float32).reshape(G, R)
    dtbias = (
        dt_bias if dt_bias is not None else jnp.zeros((H,), jnp.float32)
    ).reshape(G, R).astype(jnp.float32)
    Db = (
        D if D is not None else jnp.zeros((H,), jnp.float32)
    ).reshape(G, R).astype(jnp.float32)

    kernel = functools.partial(
        _ssd_bwd_kernel,
        R=R, cs=cs, P=P, N=N, nc=nc,
        dt_softplus=dt_softplus,
        dt_lo=float(dt_limit[0]), dt_hi=float(dt_limit[1]),
    )

    def rev(c):
        return nc - 1 - c

    grid = (Bsz, G, nc)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, R, cs, P),
                         lambda b, g, c: (b, g, 0, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, R, cs),
                         lambda b, g, c: (b, g, 0, rev(c)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cs, N),
                         lambda b, g, c: (b, g, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cs, N),
                         lambda b, g, c: (b, g, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda b, g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, cs), lambda b, g, c: (b, rev(c)),
                         memory_space=pltpu.VMEM),
            # previous chunk's segment ids (clamped at chunk 0)
            pl.BlockSpec(
                (None, cs),
                lambda b, g, c: (b, jnp.maximum(rev(c) - 1, 0)),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, None, R, P, N),
                         lambda b, g, c: (b, g, rev(c), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, R, cs, P),
                         lambda b, g, c: (b, g, 0, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, R, P, N),
                         lambda b, g, c: (b, g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, R, cs, P),
                         lambda b, g, c: (b, g, 0, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, R, cs),
                         lambda b, g, c: (b, g, 0, rev(c)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cs, N),
                         lambda b, g, c: (b, g, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, cs, N),
                         lambda b, g, c: (b, g, rev(c), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 3, R), lambda b, g, c: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bsz, G, R, Lp, P), x.dtype),
            jax.ShapeDtypeStruct((Bsz, G, R, Lp), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, Lp, N), jnp.float32),
            jax.ShapeDtypeStruct((Bsz, G, 3, R), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, P, N), jnp.float32),
            pltpu.VMEM((3, R), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, dtb, Ab, dtbias, Bb, Cb, Db, seq_idx,
      seq_idx, hin, gyb, gstb)

    dxb, ddtb_raw, dBb, dCb, daccb = outs
    dx = jnp.transpose(dxb.reshape(Bsz, H, Lp, P), (0, 2, 1, 3))[:, :L]
    ddt = jnp.transpose(ddtb_raw.reshape(Bsz, H, Lp), (0, 2, 1))[:, :L]
    dB = jnp.transpose(dBb, (0, 2, 1, 3))[:, :L]
    dC = jnp.transpose(dCb, (0, 2, 1, 3))[:, :L]
    dacc = jnp.sum(daccb, axis=0)  # (G, 3, R)
    dA = dacc[:, 0].reshape(H)
    ddt_bias = dacc[:, 1].reshape(H)
    dD = dacc[:, 2].reshape(H)
    return dx, ddt, dA, dB, dC, dD, ddt_bias


# ---------------------------------------------------------------------------
# custom_vjp: Pallas forward, Pallas backward (jnp-remat fallback via env)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 8, 9)
)
def _ssd_core(x, dt, A, B_, C, chunk_size, D, dt_bias, dt_softplus, dt_limit,
              seq_idx):
    return _ssd_pallas_fwd(
        x, dt, A, B_, C, chunk_size, D, dt_bias, dt_softplus, dt_limit,
        seq_idx,
    )


def _use_pallas_bwd() -> bool:
    import os

    return os.environ.get("TIMEVIPER_SSD_BWD", "pallas") != "jnp"


def _ssd_core_fwd(x, dt, A, B_, C, chunk_size, D, dt_bias, dt_softplus,
                  dt_limit, seq_idx):
    if _use_pallas_bwd():
        y, st, hin = _ssd_pallas_fwd(
            x, dt, A, B_, C, chunk_size, D, dt_bias, dt_softplus, dt_limit,
            seq_idx, save_prev=True,
        )
        return (y, st), (x, dt, A, B_, C, D, dt_bias, seq_idx, hin)
    out = _ssd_pallas_fwd(
        x, dt, A, B_, C, chunk_size, D, dt_bias, dt_softplus, dt_limit,
        seq_idx,
    )
    return out, (x, dt, A, B_, C, D, dt_bias, seq_idx, None)


def _ssd_core_bwd(chunk_size, dt_softplus, dt_limit, res, g):
    import numpy as _np

    x, dt, A, B_, C, D, dt_bias, seq_idx, hin = res
    gseq = _np.zeros(seq_idx.shape, jax.dtypes.float0)

    if hin is not None:
        gy, gstate = g
        gx, gdt, gA, gB, gC, gD, gdtb = _ssd_pallas_bwd(
            x, dt, A, B_, C, D, dt_bias, seq_idx, hin, gy, gstate,
            chunk_size, dt_softplus, dt_limit,
        )
        return (gx.astype(x.dtype), gdt.astype(dt.dtype), gA.astype(A.dtype),
                gB.astype(B_.dtype), gC.astype(C.dtype), gD, gdtb, gseq)

    def ref(x, dt, A, B_, C, D, dt_bias):
        return ssd_chunked(
            x, dt, A, B_, C, chunk_size=chunk_size, D=D, dt_bias=dt_bias,
            dt_softplus=dt_softplus, dt_limit=dt_limit, seq_idx=seq_idx,
            return_final_state=True,
        )

    _, vjp = jax.vjp(ref, x, dt, A, B_, C, D, dt_bias)
    gx, gdt, gA, gB, gC, gD, gdtb = vjp(g)
    return gx, gdt, gA, gB, gC, gD, gdtb, gseq


_ssd_core.defvjp(_ssd_core_fwd, _ssd_core_bwd)


def ssd_pallas(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B_: jax.Array,
    C: jax.Array,
    chunk_size: int = 256,
    D: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
    seq_idx: Optional[jax.Array] = None,
    return_final_state: bool = True,
    interpret: bool = False,
    initial_state: Optional[jax.Array] = None,
):
    """Drop-in replacement for :func:`ops.ssd.ssd_chunked` (Pallas TPU path).

    Same shapes/semantics; see module docstring for the kernel design.
    `initial_state` continues a previous span (chunked long-context
    prefill) — inference-only: it bypasses the custom_vjp, so don't
    differentiate through it.
    """
    if initial_state is not None:
        y, st = _ssd_pallas_fwd(
            x, dt, A, B_, C, chunk_size, D, dt_bias, dt_softplus, dt_limit,
            seq_idx, interpret=interpret, initial_state=initial_state,
        )
    elif interpret:
        y, st = _ssd_pallas_fwd(
            x, dt, A, B_, C, chunk_size, D, dt_bias, dt_softplus, dt_limit,
            seq_idx, interpret=True,
        )
    else:
        H = x.shape[2]
        Dc = D if D is not None else jnp.zeros((H,), jnp.float32)
        dtb = dt_bias if dt_bias is not None else jnp.zeros((H,), jnp.float32)
        seq = (
            seq_idx if seq_idx is not None
            else jnp.zeros(x.shape[:2], jnp.int32)
        )
        y, st = _ssd_core(
            x, dt, A, B_, C, chunk_size, Dc, dtb, dt_softplus, dt_limit, seq
        )
    if return_final_state:
        return y, st
    return y


def ssd_auto(x, dt, A, B_, C, chunk_size=256, **kwargs):
    """Dispatch: Pallas kernel on TPU (when shapes satisfy the Mosaic tile
    constraints — chunk_size % 128 == 0 so the (R, cs) dt block tiles),
    jnp chunked scan elsewhere."""
    platform = jax.default_backend()
    if platform in ("tpu", "axon") and chunk_size % 128 == 0:
        return ssd_pallas(x, dt, A, B_, C, chunk_size=chunk_size, **kwargs)
    return ssd_chunked(x, dt, A, B_, C, chunk_size=chunk_size, **kwargs)


def ssd_conv_scan_fused(
    x_raw: jax.Array,   # (B, L, H, P) PRE-conv projections
    dt: jax.Array,
    A: jax.Array,
    B_raw: jax.Array,   # (B, L, G, N) PRE-conv
    C_raw: jax.Array,
    conv_params: dict,  # {wx: (H*P, K), bx, wB: (G*N, K), bB, wC, bC}
    chunk_size: int = 256,
    D: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
    seq_idx: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """Fused depthwise-causal-conv + SiLU + SSD scan forward — the
    `mamba_split_conv1d_scan_combined` analog (modeling_nano.py:61-65).
    Convolution happens on the VMEM-resident chunk tiles (halo rows carried
    across the sequential chunk grid), eliminating two HBM round trips of
    the widest activations per Mamba layer. Inference-only (no vjp)."""
    H = x_raw.shape[2]
    cp = dict(conv_params)
    if cp.get("bx") is None:
        cp["bx"] = jnp.zeros((cp["wx"].shape[0],), jnp.float32)
    if cp.get("bB") is None:
        cp["bB"] = jnp.zeros((cp["wB"].shape[0],), jnp.float32)
    if cp.get("bC") is None:
        cp["bC"] = jnp.zeros((cp["wC"].shape[0],), jnp.float32)
    Dc = D if D is not None else jnp.zeros((H,), jnp.float32)
    dtb = dt_bias if dt_bias is not None else jnp.zeros((H,), jnp.float32)
    return _ssd_pallas_fwd(
        x_raw, dt, A, B_raw, C_raw, chunk_size, Dc, dtb, dt_softplus,
        dt_limit, seq_idx, interpret=interpret, conv_params=cp,
    )


def ssd_auto_continue(x, dt, A, B_, C, initial_state, chunk_size=256,
                      **kwargs):
    """`ssd_auto` with a carried initial state (chunked long-context
    prefill). Inference-only on the Pallas path."""
    platform = jax.default_backend()
    if platform in ("tpu", "axon") and chunk_size % 128 == 0:
        return ssd_pallas(x, dt, A, B_, C, chunk_size=chunk_size,
                          initial_state=initial_state, **kwargs)
    return ssd_chunked(x, dt, A, B_, C, chunk_size=chunk_size,
                       initial_state=initial_state, **kwargs)
