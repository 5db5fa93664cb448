"""Normalization ops.

TPU notes: RMSNorm runs on the VPU and XLA fuses it into neighbouring
elementwise/matmul ops, so plain jnp is speed-of-light here — a Pallas kernel
would only add launch overhead. Statistics are computed in float32 regardless
of input dtype (matching reference NemotronHRMSNorm, modeling_nano.py:898-903,
and MambaRMSNormGated, modeling_nano.py:363-380).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """RMSNorm with float32 statistics; returns input dtype.

    y = weight * x / sqrt(mean(x^2) + eps), mean over the last axis.

    Like `gated_rms_norm` below, the low-precision path keeps only the
    variance REDUCTION in f32 (the cast fuses into the reduce) and the
    elementwise apply in the input dtype: the f32-everything version made
    XLA materialize full-width f32 temporaries — measured 202 ms of a
    1195 ms 52-layer W8A8 prefill at L=16k (scripts/ablate_prefill.py),
    ~5x the HBM floor for what is two reads and a write. The reference
    norm (modeling_nano.py:898-903) upcasts everything, but its output is
    cast straight back to bf16, so the extra f32 elementwise precision is
    rounded away; parity suites hold unchanged.
    """
    if x.dtype == jnp.float32:
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return weight.astype(jnp.float32) * (x * jax.lax.rsqrt(var + eps))
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jax.lax.rsqrt(var + eps).astype(x.dtype)
    return (x * scale) * weight.astype(x.dtype)


def gated_rms_norm(
    x: jax.Array,
    gate: jax.Array,
    weight: jax.Array,
    eps: float = 1e-5,
    group_size: int | None = None,
    impl: str = "auto",
) -> jax.Array:
    """Gated group RMSNorm: ``rmsnorm(x * silu(gate))`` with per-group stats.

    Matches mamba_ssm's ``rmsnorm_fn(..., norm_before_gate=False)`` as used by
    MambaRMSNormGated (reference modeling_nano.py:363-380): the gate is applied
    *before* normalization, and the RMS statistic is computed per group of
    ``group_size`` channels (d_inner / n_groups).
    """
    dtype = x.dtype
    d = x.shape[-1]
    if group_size is None:
        group_size = d
    assert d % group_size == 0, (d, group_size)

    if dtype == jnp.float32:
        # exact float32 path (CPU tests / f32 runs)
        xf = x
        if gate is not None:
            xf = xf * (gate * jax.nn.sigmoid(gate))
        xg = xf.reshape(*x.shape[:-1], d // group_size, group_size)
        var = jnp.mean(jnp.square(xg), axis=-1, keepdims=True)
        y = (xg * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        return y * weight.astype(jnp.float32)

    # Low-precision inputs: only the variance REDUCTION runs in f32 (cast
    # fuses into the reduce); the elementwise chain stays in the input
    # dtype. The f32-everything version materialized three full-width f32
    # temporaries — 7.4 GB at L=80k on the 9B config, the difference
    # between the 5k-frame prefill fitting in 16 GB HBM or not. The
    # reference Triton kernel (layernorm_gated.py) likewise loads bf16 and
    # keeps only accumulators in f32.
    xz = x
    if gate is not None:
        xz = x * (gate * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(dtype))

    n_groups = d // group_size
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    # auto: the matmul grouping pays off when there are enough rows to
    # fill MXU tiles; single-token decode (rows ~ batch) keeps the
    # reshape path, whose relayout is trivial at one sublane of data.
    use_mm = ((jax.default_backend() in ("tpu", "axon") and rows >= 64)
              if impl == "auto" else impl == "mm")
    if n_groups > 1 and use_mm:
        # Grouped statistics WITHOUT reshaping: splitting the minor
        # (lane) dim (L, d) -> (L, G, d/G) relayouts every tile, and the
        # round-trip dominated the op — measured 7.56 ms/op at
        # (16k, 8192, G=8) vs 2.96 ms for this one-hot-matmul form (60x
        # the plain-RMSNorm HBM floor, ~200 ms of a 1.2 s 52-layer W8A8
        # prefill at L=16k; /tmp-probe recorded in scripts/ablate_prefill
        # docstring). Same trick as the ToMe one-hot merge (ops/tome.py):
        # group-sum = matmul by a constant selector, which rides the MXU
        # and keeps the array in its native layout. bf16 products enter a
        # f32 accumulator (MXU multiplies are exact in f32), so accuracy
        # matches the reshape path bit-for-bit-close (identical rms error
        # vs the exact-f32 oracle at the 9B shape).
        sel = (jnp.arange(d)[:, None] // group_size
               == jnp.arange(n_groups)[None, :]).astype(dtype)
        sq = xz * xz
        var = jax.lax.dot_general(
            sq, sel, (((xz.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / group_size
        scale = jax.lax.rsqrt(var + eps).astype(dtype)
        scale_full = jax.lax.dot_general(
            scale, sel.T, (((xz.ndim - 1,), (0,)), ((), ())))
        return (xz * scale_full) * weight.astype(dtype)

    xg = xz.reshape(*x.shape[:-1], n_groups, group_size)
    var = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jax.lax.rsqrt(var + eps)
    y = (xg * scale.astype(dtype)).reshape(x.shape)
    return y * weight.astype(dtype)
