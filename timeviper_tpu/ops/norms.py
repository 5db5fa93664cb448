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
    xf = x.astype(jnp.float32)
    if gate is not None:
        gf = gate.astype(jnp.float32)
        xf = xf * (gf * jax.nn.sigmoid(gf))
    if group_size is None or group_size == x.shape[-1]:
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + eps)
    else:
        d = x.shape[-1]
        assert d % group_size == 0, (d, group_size)
        xg = xf.reshape(*x.shape[:-1], d // group_size, group_size)
        var = jnp.mean(jnp.square(xg), axis=-1, keepdims=True)
        y = (xg * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return (y * weight.astype(jnp.float32)).astype(dtype)
