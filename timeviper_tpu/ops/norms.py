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
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (weight.astype(jnp.float32) * y).astype(dtype)


def gated_rms_norm(
    x: jax.Array,
    gate: jax.Array,
    weight: jax.Array,
    eps: float = 1e-5,
    group_size: int | None = None,
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
    xg = xz.reshape(*x.shape[:-1], d // group_size, group_size)
    var = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jax.lax.rsqrt(var + eps)
    y = (xg * scale.astype(dtype)).reshape(x.shape)
    return y * weight.astype(dtype)
