"""Fused single-token Mamba decode: x-conv update + SSD state update +
gated RMSNorm in ONE Pallas kernel per layer.

Decode at batch 1 is HBM-bound on the weight stream (the in/out
projections), but the reference-shaped decode step spends a further
~3-5 ms/token on ~15 small XLA kernels per Mamba layer (conv rolls,
state update, norm — measured 13.9 ms/token at 52L int8 W8A8 vs a ~9 ms
weight-stream floor). The reference leans on two fused CUDA/Triton
kernels for exactly this (`causal_conv1d_update` +
`selective_state_update`, modeling_nano.py:484-546); this kernel fuses
the large-state work (the x conv roll, the (H, P, N) state update — the
biggest non-weight HBM traffic — and the gated norm). The tiny B/C
convs and dt softplus stay in XLA where they fuse into ~2 kernels.

The math decomposes exactly per B/C group g (head block, channel block
of d_inner/G, state slice, and — because group_size = d_inner/G — the
gated RMSNorm group), so the grid is (B, G). Every operand arrives
pre-shaped as (…, G, rows, cols) with 128-aligned rows, and the kernel
body is reshape-free (Mosaic rejects lane-width shape casts): per-head
scalars come in as per-CHANNEL columns (XLA repeats are free), and the
two reductions (y over N, the norm mean-square) ride MXU dots with the
contraction on the stored axis.

Matches `mamba_mixer_decode`'s unfused path (the jnp oracle) to f32
tolerance; dispatched via `fused_mamba_decode_supported`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xr_ref, bv_ref, cv_ref, dtf_ref, da_ref, gate_ref,
            csx_ref, ssm_ref, wx_ref, bx_ref, d_ref, nw_ref,
            y_ref, ncsx_ref, nssm_ref,
            *, N: int, eps: float):
    # refs (group-sliced): xr (1, CpG, 1); bv/cv (1, 1, N); dtf/da/gate/
    # D/norm (…, CpG, 1); csx (1, CpG, K); ssm (1, CpG, N)
    cs = csx_ref[0].astype(jnp.float32)               # (CpG, K)
    new_cs = jnp.concatenate(
        [cs[:, 1:], xr_ref[0].astype(jnp.float32)], axis=1)
    ncsx_ref[0] = new_cs.astype(ncsx_ref.dtype)
    xs = jnp.sum(new_cs * wx_ref[0].astype(jnp.float32), axis=1,
                 keepdims=True)                       # (CpG, 1)
    xs = xs + bx_ref[0].astype(jnp.float32)
    xs = xs * jax.nn.sigmoid(xs)                      # silu

    Bv = bv_ref[0].astype(jnp.float32)                # (1, N)
    Cv = cv_ref[0].astype(jnp.float32)                # (1, N)
    dtf = dtf_ref[0].astype(jnp.float32)              # (CpG, 1)
    dA = da_ref[0].astype(jnp.float32)                # (CpG, 1)

    s = ssm_ref[0].astype(jnp.float32)                # (CpG, N)
    new_s = s * dA + (dtf * xs) * Bv                  # (CpG, N)
    nssm_ref[0] = new_s.astype(nssm_ref.dtype)

    # y_c = sum_n new_s[c, n] · C_n — a (CpG, N) lane reduction; the MXU
    # dot forms Mosaic accepts here all need layout casts, and at 128
    # lanes the VPU reduce is tiny
    y = jnp.sum(new_s * Cv, axis=1, keepdims=True)    # (CpG, 1)
    y = y + d_ref[0].astype(jnp.float32) * xs

    # gated RMSNorm over THIS group's CpG channels (group_size == CpG)
    z = gate_ref[0].astype(jnp.float32)               # (CpG, 1)
    v = y * (z * jax.nn.sigmoid(z))                   # (CpG, 1)
    ms = jnp.sum(v * v) / v.shape[0]
    y_ref[0] = (v * jax.lax.rsqrt(ms + eps)
                * nw_ref[0].astype(jnp.float32)).astype(y_ref.dtype)


def fused_mamba_decode(
    xr: jax.Array,     # (B, d_inner) raw in-proj x (pre-conv)
    Bv: jax.Array,     # (B, G*N) POST-conv B (XLA causal_conv1d_update)
    Cv: jax.Array,     # (B, G*N) POST-conv C
    dtf: jax.Array,    # (B, H) PROCESSED dt (softplus+bias+clamp)
    gate: jax.Array,   # (B, d_inner)
    conv_state_x: jax.Array,  # (B, d_inner, K) x rolling window
    ssm_state: jax.Array,     # (B, H, P, N) float32
    params: dict,      # mixer params: conv1d.x{weight,bias}, A_log, D,
                       # norm{weight}
    *,
    n_groups: int,
    head_dim: int,
    eps: float,
    interpret: bool = False,
):
    """Returns (y_normed (B, d_inner), new_conv_state_x, new_ssm_state)."""
    B, H = dtf.shape
    G, P = n_groups, head_dim
    N = Bv.shape[1] // G
    HpG = H // G
    CpG = HpG * P
    d_inner = G * CpG
    K = conv_state_x.shape[-1]
    cvx = params["conv1d"]["x"]
    A = -jnp.exp(params["A_log"].astype(jnp.float32))

    # per-head scalars -> per-channel columns (XLA broadcast, fuses away)
    def cols(v_bh):  # (B, H) f32 -> (B, G, CpG, 1)
        r = jnp.repeat(v_bh.astype(jnp.float32), P, axis=1)
        return r.reshape(B, G, CpG, 1)

    dtf_c = cols(dtf)
    dA_c = cols(jnp.exp(dtf.astype(jnp.float32) * A[None]))
    d_col = jnp.repeat(params["D"].astype(jnp.float32), P).reshape(
        G, CpG, 1)
    nw_col = jnp.asarray(params["norm"]["weight"],
                         jnp.float32).reshape(G, CpG, 1)
    bx_col = jnp.asarray(cvx["bias"], jnp.float32).reshape(G, CpG, 1)

    kernel = functools.partial(_kernel, N=N, eps=eps)

    def spec(block, index):
        return pl.BlockSpec(block, index, memory_space=pltpu.VMEM)

    bg = lambda b, g: (b, g, 0, 0)  # noqa: E731
    gg = lambda b, g: (g, 0, 0)     # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B, G),
        in_specs=[
            spec((None, 1, CpG, 1), bg),              # xr column
            spec((None, 1, 1, N), bg),                # Bv row
            spec((None, 1, 1, N), bg),                # Cv row
            spec((None, 1, CpG, 1), bg),              # dtf column
            spec((None, 1, CpG, 1), bg),              # dA column
            spec((None, 1, CpG, 1), bg),              # gate column
            spec((None, 1, CpG, K), bg),              # conv_state x
            spec((None, 1, CpG, N), bg),              # ssm (rows=h*P+p)
            spec((1, CpG, K), gg),                    # conv w x
            spec((1, CpG, 1), gg),                    # conv b x column
            spec((1, CpG, 1), gg),                    # D column
            spec((1, CpG, 1), gg),                    # norm w column
        ],
        out_specs=[
            spec((None, 1, CpG, 1), bg),              # y column
            spec((None, 1, CpG, K), bg),
            spec((None, 1, CpG, N), bg),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, CpG, 1), xr.dtype),
            jax.ShapeDtypeStruct((B, G, CpG, K), conv_state_x.dtype),
            jax.ShapeDtypeStruct((B, G, CpG, N), ssm_state.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(xr.reshape(B, G, CpG, 1), Bv.reshape(B, G, 1, N),
      Cv.reshape(B, G, 1, N), dtf_c, dA_c, gate.reshape(B, G, CpG, 1),
      conv_state_x.reshape(B, G, CpG, K),
      ssm_state.reshape(B, G, CpG, N),
      cvx["weight"].reshape(G, CpG, K), bx_col, d_col, nw_col)
    y, ncx, nssm = out
    return (y.reshape(B, d_inner),
            ncx.reshape(B, d_inner, K),
            nssm.reshape(B, H, P, N))


def fused_mamba_decode_supported(cfg) -> bool:
    """Shape gates for the fused kernel: the per-group channel block must
    be 128-aligned (it is both the sublane row count and the norm group),
    the state lane dim 128-aligned; silu activation; groups tile heads."""
    d_inner = cfg.mamba_intermediate_size
    G, H, N = cfg.mamba_n_groups, cfg.mamba_num_heads, cfg.ssm_state_size
    return (jax.default_backend() in ("tpu", "axon")
            and cfg.mamba_hidden_act == "silu"
            and H % G == 0
            and (d_inner // G) % 128 == 0
            and N % 128 == 0)
