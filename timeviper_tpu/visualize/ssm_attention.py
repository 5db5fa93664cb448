"""Mamba-2 "attention" visualization: materialize the SSD mixing matrix.

The reference ships a forked Triton stack whose forward reconstructs the
implicit attention of Mamba-2 from chunked intermediates
(visualize/nano/my_ssd_combined.py:618-737: attn[i,j] = C_i · B_j ·
exp(Σ_{k=j+1..i} dA_k) for j <= i). In JAX this is a direct expression —
no kernel fork needed; the same `_process_dt`/segsum helpers the compute
path uses produce the matrix exactly.

For analysis only: the matrix is O(L²·H) — slice heads/layers and keep L
modest (the reference notebook samples a handful of layers the same way).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.models.nano import _apply_linear
from timeviper_tpu.ops.conv import causal_conv1d
from timeviper_tpu.ops.norms import rms_norm
from timeviper_tpu.ops.ssd import _expand_groups, _process_dt, _segsum


def ssd_attention_matrix(
    dt: jax.Array,     # (B, L, H) raw dt
    A: jax.Array,      # (H,)
    B_: jax.Array,     # (B, L, G, N)
    C: jax.Array,      # (B, L, G, N)
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
    include_dt: bool = True,
    heads: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Materialized mixing matrix (B, H', L, L), lower-triangular.

    attn[b,h,i,j] = C_i · B_j · exp(Acs_i − Acs_j) · dt_j (j <= i), the
    exact linear operator the SSD scan applies to x
    (my_ssd_combined.py:650-737 semantics, whole-sequence version of the
    chunk reconstruction).
    """
    Bsz, L, H = dt.shape
    dtf = _process_dt(dt, dt_bias, dt_softplus, dt_limit)  # (B, L, H)
    dA = dtf * A.astype(jnp.float32)[None, None, :]
    Acs = jnp.cumsum(dA, axis=1)  # (B, L, H)

    Bf = _expand_groups(B_.astype(jnp.float32), H)  # (B, L, H, N)
    Cf = _expand_groups(C.astype(jnp.float32), H)
    if heads is not None:
        idx = jnp.asarray(list(heads))
        Bf, Cf = Bf[:, :, idx], Cf[:, :, idx]
        Acs = Acs[..., idx]
        dtf = dtf[..., idx]

    CB = jnp.einsum("bihn,bjhn->bhij", Cf, Bf)  # (B, H', L, L)
    decay = jnp.exp(
        _segsum(jnp.moveaxis(dA if heads is None else dA[..., jnp.asarray(list(heads))], 1, -1))
    )  # (B, H', L, L) via segsum over the time axis
    attn = CB * decay
    if include_dt:
        attn = attn * jnp.moveaxis(dtf, 1, -1)[:, :, None, :]
    i = jnp.arange(L)
    return jnp.where((i[:, None] >= i[None, :])[None, None], attn, 0.0)


def collect_ssm_attention(
    params: Dict,
    cfg: NanoConfig,
    inputs_embeds: jax.Array,  # (B, L, D)
    layer_indices: Optional[Sequence[int]] = None,
    heads: Optional[Sequence[int]] = None,
) -> Dict[int, jax.Array]:
    """Run the backbone and materialize SSD attention for chosen Mamba
    layers (default: all). Mirrors the reference cookbook's per-layer
    collection (nano_attention_visualization_cookbook.ipynb)."""
    if layer_indices is None:
        layer_indices = list(cfg.mamba_layer_indices)
    want = set(layer_indices)

    hidden = inputs_embeds
    B, L, _ = hidden.shape
    G, N, H, P = (cfg.mamba_n_groups, cfg.ssm_state_size,
                  cfg.mamba_num_heads, cfg.mamba_head_dim)
    out: Dict[int, jax.Array] = {}

    from timeviper_tpu.models.nano import _block_forward

    for idx, block_type in enumerate(cfg.layers_block_type):
        lp = params["layers"][idx]
        if block_type == "mamba" and idx in want:
            normed = rms_norm(hidden, lp["norm"]["weight"],
                              eps=cfg.layer_norm_epsilon)
            p = lp["mixer"]
            Br = _apply_linear(p["in_proj"]["B"], normed)
            Cr = _apply_linear(p["in_proj"]["C"], normed)
            dtr = _apply_linear(p["in_proj"]["dt"], normed)
            cv = p["conv1d"]
            Bc = causal_conv1d(Br, cv["B"]["weight"], cv["B"]["bias"],
                               activation=cfg.mamba_hidden_act)
            Cc = causal_conv1d(Cr, cv["C"]["weight"], cv["C"]["bias"],
                               activation=cfg.mamba_hidden_act)
            out[idx] = ssd_attention_matrix(
                dtr, -jnp.exp(p["A_log"]),
                Bc.reshape(B, L, G, N), Cc.reshape(B, L, G, N),
                dt_bias=p["dt_bias"], dt_limit=cfg.time_step_limit,
                heads=heads,
            )
        hidden, _ = _block_forward(
            lp, cfg, block_type, hidden, seq_idx=None, attn_mask=None,
            cache_layer=None, fill_cache=False, max_len=0,
        )
    return out
