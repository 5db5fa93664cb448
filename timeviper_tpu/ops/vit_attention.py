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

# S+P in f32 must fit VMEM alongside q/k/v/o tiles; the head-batching loop
# in `vit_attention` budgets ~8 MB, so Tp=1280 (6.55 MB scores + one
# 1.31 MB head tile) is the ceiling. 1280 covers both SigLIP frames
# (729 tokens) and InternVideo2 clips (4·16·16+1 = 1025 tokens).
MAX_WHOLE_FRAME_T = 1280


def _use_fast_exp() -> bool:
    import os

    return os.environ.get("TIMEVIPER_VIT_FAST_EXP", "0") == "1"


def _softmax_exp(s, clamp_hi: float):
    """exp over the (rows, T) score tile.

    TIMEVIPER_VIT_FAST_EXP=1 swaps the hardware exp for the
    exponent-bitcast exp2 split
        exp(s) = 2^(s·log2e) = 2^i · 2^f,  i = floor, f ∈ [0, 1)
    with 2^i built by integer insertion into the f32 exponent field and
    2^f a degree-4 Taylor polynomial (max rel err 6.7e-4 — below the
    kernels' own bf16 probability cast). Measured SLOWER on-chip
    (encode 19.08 s vs 17.3 s at the 5k-frame bench; e2e 189.0 vs
    202.9 f/s): Mosaic's native exp outruns the ~11-op fma/convert/
    shift chain on the v5e VPU, so this ships default OFF — recorded
    A/B, same discipline as the fused conv+scan and fused-LN kernels.
    The lower clamp keeps i+127 >= 1 so the bitcast never denormalizes
    (exp(-86) ≈ 4e-38 ≈ 0 is exact enough for a softmax numerator) —
    with the caveat that a row whose every logit underflows then sums
    to ~T·4e-38 > the PV row-sum floor (1e-30), so such a degenerate
    row returns ~the mean of V instead of the exact-path's 0. No real
    ViT hits all-(-87) logit rows; noted because the kernels' own
    comments promise the 0 behavior for the exact path.
    """
    if not _use_fast_exp():
        return jnp.exp(jnp.minimum(s, clamp_hi))
    x = jnp.clip(s, -86.0, clamp_hi) * 1.4426950408889634
    i = jnp.floor(x)
    f = x - i
    p = 1.0 + f * (0.6931471805599453 + f * (
        0.2402265069591007 + f * (
            0.05550410866482158 + f * 0.009618129107628477)))
    e = jax.lax.bitcast_convert_type(
        (i.astype(jnp.int32) + 127) << 23, jnp.float32)
    return e * p


def _vit_attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int,
                     heads: int):
    # refs: (heads, T, D). Several heads per program: a single-head program
    # is ~0.3 GFLOP (microseconds of MXU) and the per-program grid overhead
    # dominated — batching heads amortizes it ~4x.
    #
    # The program is VPU-bound (softmax over the (T, T) scores), so the
    # elementwise pass count over T·T is what matters (measured 45% of the
    # whole SigLIP encode before this layout):
    #   * column masking is a broadcast ADD of a (1, T) -inf row, not a
    #     (T, T) select;
    #   * the row sum rides the MXU (dot with a ones matrix — vector lane
    #     reductions are the slow path on Mosaic);
    #   * normalization happens AFTER the PV matmul: a (T, D) multiply is
    #     T/D times cheaper than scaling the (T, T) probabilities.
    # Softmax without the row max: vision attention logits are bounded
    # (|q·k|/√d ≪ 75 for any trained ViT), so exp(min(s, 75)) is exact in
    # f32 — e75·T ≈ 3e35 stays under f32/bf16 max — and the (T, T) scores
    # are traversed ONCE (clamp+exp+mask fuse into a single VPU pass)
    # instead of three times (bias add, row-max reduce, subtract+exp).
    # The kernel is VPU-bound at these shapes (ablation: attention was 51%
    # of the SigLIP encode with the 3-pass layout), so traversal count is
    # the metric that matters. Column masking multiplies by a (1, T) 0/1
    # row (folds into the same pass); an all-underflow row (every logit
    # < -87) yields 0/eps ≈ 0 rather than NaN via the 1e-30 floor.
    T = q_ref.shape[1]
    D = v_ref.shape[2]
    # column masking only when columns are actually padded. In THIS
    # kernel the wrapper pads T to a 128 multiple (729 -> 768), so the
    # mask is live for SigLIP; the skip fires only for naturally-aligned
    # token counts. (On-chip A/B of the skip: neutral — Mosaic fuses
    # the mask multiply into the exp traversal — kept as the cleaner
    # formulation.)
    masked = t_valid < T
    if masked:
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        colmask = (jj < t_valid).astype(jnp.float32)
    ones8 = jnp.ones((T, 8), q_ref.dtype)
    for h in range(heads):
        s = jax.lax.dot_general(
            q_ref[h], k_ref[h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, T)
        p = _softmax_exp(s, 75.0)
        if masked:
            p = p * colmask
        p = p.astype(q_ref.dtype)
        # fold the row sum into the PV matmul: appending a ones column to
        # v makes column D of the product the row sum l, for free — the
        # MXU pads N to a 128 multiple either way. A separate p@ones dot
        # costs as many MXU passes as PV itself (measured 3.5 ms/layer of
        # a 15.3 ms SigLIP attention share; scripts/microbench_vit_attn.py)
        vv = jnp.concatenate([v_ref[h], ones8], axis=1)
        o = jax.lax.dot_general(
            p, vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = o[:, D:D + 1]  # (T, 1) row sums
        o_ref[h] = (o[:, :D] * (1.0 / jnp.maximum(l, 1e-30))).astype(
            o_ref.dtype)


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

    # heads per program: largest divisor of H keeping q/k/v/o tiles + the
    # (Tp, Tp) f32 score matrix inside the VMEM budget (~16 MB/core total;
    # leave headroom for double-buffered DMA of the next program's tiles)
    import os

    budget = int(os.environ.get("TIMEVIPER_VIT_VMEM_MB", "8")) * 2**20
    hb = 1
    tile = Tp * Dp * q.dtype.itemsize * 4  # q+k+v+o per head
    for cand in range(H, 0, -1):
        if H % cand == 0 and cand * tile + Tp * Tp * 4 <= budget:
            hb = cand
            break
    assert hb * tile + Tp * Tp * 4 <= budget, (
        f"T={T} overruns the whole-frame VMEM budget; raise block math or "
        f"route through the flash kernel (MAX_WHOLE_FRAME_T={MAX_WHOLE_FRAME_T})")

    kernel = functools.partial(_vit_attn_kernel, t_valid=T, heads=hb)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // hb),
        in_specs=[
            pl.BlockSpec((None, hb, Tp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_specs=pl.BlockSpec((None, hb, Tp, Dp),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qk, kk, vk)
    return jnp.transpose(out, (0, 2, 1, 3))[:, :T, :, :hd]


def _vit_attn_qkv_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int,
                         heads: int, head_dim: int, scale: float):
    # q_ref/o_ref: (TR, H*hd) row block; k_ref/v_ref: (T, H*hd) full.
    # Heads live in contiguous hd-wide column bands of the qkv projection
    # output; each is attended independently. Same one-pass clamped
    # softmax as _vit_attn_kernel (see that kernel's comment).
    T = k_ref.shape[0]
    # in THIS kernel T is the caller's true token count (no T padding),
    # so t_valid == T today and the mask branch is defensive only — it
    # becomes live if a future caller routes a padded layout through
    masked = t_valid < T
    if masked:
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        colmask = (jj < t_valid).astype(jnp.float32)
    ones8 = jnp.ones((T, 8), q_ref.dtype)
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[:, sl] * jnp.asarray(scale, q_ref.dtype)
        s = jax.lax.dot_general(
            qh, k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TR, T)
        p = _softmax_exp(s, 75.0)
        if masked:
            p = p * colmask
        p = p.astype(q_ref.dtype)
        # row sum folded into the PV matmul via a ones column (see
        # _vit_attn_kernel): 15.3 -> 11.8 ms/layer at SigLIP clip shapes
        vv = jnp.concatenate([v_ref[:, sl], ones8], axis=1)
        o = jax.lax.dot_general(
            p, vv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = o[:, head_dim:head_dim + 1]
        o_ref[:, sl] = (o[:, :head_dim] * (1.0 / jnp.maximum(l, 1e-30))
                        ).astype(o_ref.dtype)


def vit_attention_qkv(
    qkv: jax.Array,  # (B, T, 3*H*hd) — column order (3, H, hd)
    num_heads: int,
    head_dim: int,
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Whole-frame attention reading directly from the fused qkv layout.

    The padded per-head (B, H, Tp, 128) tensors of `vit_attention` cost
    ~1.5 GB/layer of pure relayout HBM traffic at SigLIP shapes (measured:
    attention was 51% of the encode while the kernel itself was only 29%
    of that). Here each program DMAs the q/k/v column sections of the qkv
    matmul's natural output and writes the (B, T, H*hd) layout that the
    out-projection consumes — no relayout ever hits HBM. Mosaic requires
    minor block dims to be 128-multiples, so all H heads ride in one
    program (H*hd is 128-aligned for supported towers) and VMEM is kept
    in budget by row-blocking the queries; k/v stay whole so every score
    column is resident. Returns (B, T, H*hd).

    Callers must check `qkv_kernel_supported` first.
    """
    B, T, D3 = qkv.shape
    H, hd = num_heads, head_dim
    cols = H * hd
    assert D3 == 3 * cols and cols % 128 == 0
    if scale is None:
        scale = 1.0 / (hd ** 0.5)

    TR = _qkv_row_block(T, cols, qkv.dtype.itemsize)
    assert TR is not None
    nr = -(-T // TR)

    kernel = functools.partial(
        _vit_attn_qkv_kernel, t_valid=T, heads=H, head_dim=hd, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, nr),
        in_specs=[
            pl.BlockSpec((None, TR, cols), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, cols), lambda b, r: (b, 0, 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, cols), lambda b, r: (b, 0, 2),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, TR, cols), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, cols), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def _qkv_row_block(T: int, cols: int, itemsize: int) -> int | None:
    """Largest query row block keeping double-buffered tiles + one (TR, T)
    f32 score matrix + its bf16 probabilities under the ~16 MB VMEM scope.
    None if even TR=8 does not fit (caller falls back)."""
    Ts = -(-T // 8) * 8
    kv = 2 * Ts * cols * itemsize          # k + v (revisited, single copy)
    for nr in (1, 2, 4, 8, 16):
        TR = -(-T // nr // 8) * 8
        qo = 2 * TR * cols * itemsize
        total = 2 * (kv + qo) + TR * Ts * 6  # x2 double-buffer; s f32 + p bf16
        # Mosaic's true scoped reservation runs ~1.5x this estimate
        # (verified against its vmem-oom accounting at SigLIP shapes), so
        # 10 MB here keeps the real allocation inside the 16 MB scope.
        if total <= 10 * 2**20:
            return TR
    return None


def qkv_kernel_supported(T: int, num_heads: int, head_dim: int,
                         itemsize: int = 2) -> bool:
    cols = num_heads * head_dim
    return (cols % 128 == 0 and T <= MAX_WHOLE_FRAME_T
            and _qkv_row_block(T, cols, itemsize) is not None)


def encoder_attention_qkv(
    qkv: jax.Array, num_heads: int, head_dim: int
) -> jax.Array:
    """Backend-dispatched attention from the fused qkv layout.

    (B, T, 3*H*hd) -> (B, T, H*hd). TPU + T ≤ MAX_WHOLE_FRAME_T takes the
    zero-relayout kernel above; everything else splits heads and reuses
    `encoder_attention`.
    """
    B, T, _ = qkv.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (on_tpu and T >= 256
            and qkv_kernel_supported(T, num_heads, head_dim,
                                     qkv.dtype.itemsize)):
        return vit_attention_qkv(qkv, num_heads, head_dim)
    q, k, v = jnp.split(
        qkv.reshape(B, T, 3, num_heads, head_dim), 3, axis=2)
    out = encoder_attention(q[:, :, 0], k[:, :, 0], v[:, :, 0])
    return out.reshape(B, T, num_heads * head_dim)


def encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Backend-dispatched exact non-causal attention for vision encoders.

    (B, T, H, hd) -> (B, T, H, hd). On TPU, T ≤ MAX_WHOLE_FRAME_T uses the
    whole-frame kernel above; longer sequences pad and stream through the
    flash kernel; CPU (and tiny T) fall back to the jnp oracle. Shared by
    the ViT towers (models/vit.py) and InternVideo2 (1025-token clips).
    """
    B, T, H, hd = q.shape
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu or T < 256:
        from timeviper_tpu.ops.attention import attention

        return attention(q, k, v)
    if T <= MAX_WHOLE_FRAME_T:
        return vit_attention(q, k, v)
    from timeviper_tpu.ops.flash_pallas import flash_attention

    # long-sequence fallback: pad T to a 256 multiple + head_dim to 128 and
    # stream through the flash kernel, pad tokens masked into a segment of
    # their own
    Tp = -(-T // 256) * 256
    hp = -(-hd // 128) * 128
    pad_t, pad_d = Tp - T, hp - hd
    scale = 1.0 / (hd ** 0.5)  # scale by the TRUE head_dim
    qp = jnp.pad(q * jnp.asarray(scale, q.dtype),
                 ((0, 0), (0, pad_t), (0, 0), (0, pad_d)))
    kp = jnp.pad(k, ((0, 0), (0, pad_t), (0, 0), (0, pad_d)))
    vp = jnp.pad(v, ((0, 0), (0, pad_t), (0, 0), (0, pad_d)))
    seg = jnp.concatenate(
        [jnp.zeros((T,), jnp.int32), jnp.ones((pad_t,), jnp.int32)]
    )[None].repeat(B, axis=0)
    # conservative blocks: this fallback can sit under a training grad
    # (finetuned towers), where the save-residuals forward at the big
    # inference blocks exceeds VMEM (see flash_pallas.flash_attention)
    out = flash_attention(qp, kp, vp, segment_ids=seg, causal=False,
                          scale=1.0, conservative_blocks=True)
    return out[:, :T, :, :hd]
