"""Fused residual-add + LayerNorm (+ int8 activation quantize) for encoders.

XLA lowers the ViT's LayerNorm as two passes over the activation (one
reduction fusion for mean/variance, one normalize pass) and keeps the
preceding residual add a third pass; measured together they are ~9% of the
int8 SigLIP encode (ablation: 229.9 -> 208.3 ms per 64 frames with LN
elided). One Pallas program holds a row block in VMEM and does all of it
with a single HBM read per input and a single write per output:

    x_new = res + out                   (residual, optional)
    y     = (x_new - mean) / sqrt(var + eps) * w + b
    emit  x_new (bf16, feeds the next residual)
    emit  y  as bf16 — or as int8 rows  clip(round(y * act_inv))  when the
          consumer is a W8A8 matmul (ops/int8_linear.py), skipping the
          bf16 materialization of the normalized activation entirely.

Row statistics ride the MXU as dots with a ones matrix: lane-wise
multi_reductions to (R, 1) vectors are the slow/unsupported path on Mosaic
(see ops/ssd_pallas.py notes); an (R, D) x (D, 8) f32 dot is not.

Replaces nothing in the reference (torch LayerNorm is cuDNN-fused there);
this exists because the v5e encode is HBM/VPU-bound between its matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_ln", "fused_ln_supported"]


def _ln_kernel(x_ref, w_ref, b_ref, inv_ref, y_ref, *, eps: float,
               quant: bool):
    xf = x_ref[...].astype(jnp.float32)  # (R, D)
    _ln_emit(xf, w_ref, b_ref, inv_ref, y_ref, eps=eps, quant=quant)


def _ln_res_kernel(res_ref, out_ref, w_ref, b_ref, inv_ref, x_ref, y_ref, *,
                   eps: float, quant: bool):
    xf = res_ref[...].astype(jnp.float32) + out_ref[...].astype(jnp.float32)
    x_ref[...] = xf.astype(x_ref.dtype)
    _ln_emit(xf, w_ref, b_ref, inv_ref, y_ref, eps=eps, quant=quant)


def _ln_emit(xf, w_ref, b_ref, inv_ref, y_ref, *, eps, quant):
    R, D = xf.shape
    ones8 = jnp.ones((D, 8), jnp.float32)
    s = jax.lax.dot_general(xf, ones8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)[:, :1]
    sq = jax.lax.dot_general(xf * xf, ones8, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[:, :1]
    mean = s * (1.0 / D)
    var = sq * (1.0 / D) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * w_ref[...].astype(jnp.float32) \
        + b_ref[...].astype(jnp.float32)
    if quant:
        y_ref[...] = jnp.clip(jnp.round(y * inv_ref[0, 0]), -127, 127).astype(
            jnp.int8)
    else:
        y_ref[...] = y.astype(y_ref.dtype)


def fused_ln_supported(D: int) -> bool:
    return D % 128 == 0


# --- reverse-mode support -------------------------------------------------
# The Pallas forward is wrapped in a custom VJP whose backward is the
# standard LayerNorm gradient in jnp (XLA fuses it well; the backward is
# not on the inference hot path this kernel exists for). The int8-quant
# variant stays non-differentiable by construction — it only ever runs
# against frozen W8A8 weights.

def _ln_bwd_math(x, w, dy, eps):
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    g = dyf * wf
    dx = rstd * (g - g.mean(-1, keepdims=True)
                 - xhat * (g * xhat).mean(-1, keepdims=True))
    red = tuple(range(x.ndim - 1))
    dw = (dyf * xhat).sum(red)
    db = dyf.sum(red)
    return dx.astype(x.dtype), dw.astype(w.dtype), db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_ln_diff(x, weight, bias, eps):
    return _fused_ln_pallas(x, weight, bias, eps=eps)


def _fused_ln_diff_fwd(x, weight, bias, eps):
    return _fused_ln_pallas(x, weight, bias, eps=eps), (x, weight)


def _fused_ln_diff_bwd(eps, resids, dy):
    x, w = resids
    dx, dw, db = _ln_bwd_math(x, w, dy, eps)
    return dx, dw, db.astype(w.dtype)


_fused_ln_diff.defvjp(_fused_ln_diff_fwd, _fused_ln_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_ln_res_diff(res, out, weight, bias, eps):
    return _fused_ln_res_pallas(res, out, weight, bias, eps=eps)


def _fused_ln_res_diff_fwd(res, out, weight, bias, eps):
    x_new, y = _fused_ln_res_pallas(res, out, weight, bias, eps=eps)
    return (x_new, y), (res, out, weight)


def _fused_ln_res_diff_bwd(eps, resids, cts):
    res, out, w = resids
    d_xnew, dy = cts
    x = res + out
    dx, dw, db = _ln_bwd_math(x, w, dy, eps)
    dtot = dx + d_xnew.astype(dx.dtype)
    return dtot, dtot, dw, db.astype(w.dtype)


_fused_ln_res_diff.defvjp(_fused_ln_res_diff_fwd, _fused_ln_res_diff_bwd)


def fused_ln(
    x: jax.Array,                     # (..., D) — or `out` when res given
    weight: jax.Array,                # (D,)
    bias: jax.Array,                  # (D,)
    *,
    eps: float = 1e-6,
    residual: jax.Array | None = None,  # (..., D): emit x_new = residual + x
    act_inv: jax.Array | None = None,   # () f32 static scale -> int8 output
    rows_per_block: int = 512,
    interpret: bool | None = None,
):
    """LayerNorm with the residual add and W8A8 quantize fused in.

    Returns `y` — normalized in x.dtype, or int8 `clip(round(y * act_inv))`
    when `act_inv` is given (the calibrated per-tensor scale from
    train/quantize.py, a traced scalar fed to the kernel via SMEM). With
    `residual`, returns `(x_new, y)` where `x_new = residual + x` (the
    tensor the next residual consumes). D must be a 128-multiple
    (`fused_ln_supported`).

    The bf16/f32 variants are reverse-mode differentiable (Pallas forward,
    jnp LayerNorm-gradient backward); the int8 variant is inference-only.
    """
    if act_inv is None and interpret is None:
        if residual is None:
            return _fused_ln_diff(x, weight, bias, eps)
        return _fused_ln_res_diff(residual, x, weight, bias, eps)
    if residual is None:
        return _fused_ln_pallas(x, weight, bias, eps=eps, act_inv=act_inv,
                                rows_per_block=rows_per_block,
                                interpret=interpret)
    return _fused_ln_res_pallas(residual, x, weight, bias, eps=eps,
                                act_inv=act_inv,
                                rows_per_block=rows_per_block,
                                interpret=interpret)


def _fused_ln_pallas(x, weight, bias, *, eps, act_inv=None,
                     rows_per_block=512, interpret=None):
    D = x.shape[-1]
    assert fused_ln_supported(D)
    assert weight.shape == (D,) and bias.shape == (D,)
    if interpret is None:  # off-TPU there is no Mosaic: emulate
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, D)
    R = min(rows_per_block, -(-rows // 8) * 8)
    nr = -(-rows // R)

    w2 = weight.reshape(1, D)
    b2 = bias.reshape(1, D)
    quant = act_inv is not None
    inv2 = (jnp.asarray(act_inv, jnp.float32) if quant
            else jnp.ones((), jnp.float32)).reshape(1, 1)
    ydtype = jnp.int8 if quant else x.dtype
    row_spec = pl.BlockSpec((R, D), lambda r: (r, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, 1), lambda r: (0, 0),
                            memory_space=pltpu.SMEM)

    kernel = functools.partial(_ln_kernel, eps=eps, quant=quant)
    y = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[row_spec, vec_spec, vec_spec, inv_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, D), ydtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, w2, b2, inv2)
    return y.reshape(*lead, D)


def _fused_ln_res_pallas(residual, x, weight, bias, *, eps, act_inv=None,
                         rows_per_block=512, interpret=None):
    D = x.shape[-1]
    assert fused_ln_supported(D)
    assert weight.shape == (D,) and bias.shape == (D,)
    if interpret is None:  # off-TPU there is no Mosaic: emulate
        interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    x2 = x.reshape(rows, D)
    res2 = residual.reshape(rows, D)
    R = min(rows_per_block, -(-rows // 8) * 8)
    nr = -(-rows // R)

    w2 = weight.reshape(1, D)
    b2 = bias.reshape(1, D)
    quant = act_inv is not None
    inv2 = (jnp.asarray(act_inv, jnp.float32) if quant
            else jnp.ones((), jnp.float32)).reshape(1, 1)
    ydtype = jnp.int8 if quant else x.dtype
    row_spec = pl.BlockSpec((R, D), lambda r: (r, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, D), lambda r: (0, 0), memory_space=pltpu.VMEM)
    inv_spec = pl.BlockSpec((1, 1), lambda r: (0, 0),
                            memory_space=pltpu.SMEM)

    kernel = functools.partial(_ln_res_kernel, eps=eps, quant=quant)
    x_new, y = pl.pallas_call(
        kernel,
        grid=(nr,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, inv_spec],
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, D), x.dtype),
            jax.ShapeDtypeStruct((rows, D), ydtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(res2, x2, w2, b2, inv2)
    return x_new.reshape(*lead, D), y.reshape(*lead, D)
