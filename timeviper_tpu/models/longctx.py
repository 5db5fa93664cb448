"""Memory-bounded long-context prefill: per-layer sequence chunking.

The 9B hybrid's wide per-layer intermediates are what cap single-chip
context length: at L=160k (the 10k-frame workload) one Mamba layer's
in_proj output alone is (L, 18560) bf16 ≈ 5.9 GB and an MLP layer's
up-projection 6.9 GB — they cannot coexist with 8.6 GB of int8 weights in
16 GB HBM. The reference never solves this (it caps at 5k frames without
TransV and relies on GPU fleets beyond that, README.md:59-62).

This forward computes EXACTLY the same function as `nano_forward` but
streams each Mamba/MLP layer over sequence chunks with a `lax.scan`:

* Mamba chunks carry (conv tails of the raw [x|B|C] projections, SSM
  state) — the conv is causal with K=4 so K-1 raw inputs suffice, and the
  Pallas SSD kernel continues from a carried initial state
  (ops/ssd_pallas.py `initial_state`).
* MLP chunks carry nothing (pointwise).
* Attention layers (4 of 52) run full-length through the flash kernel —
  already O(L) memory — since chunking causal attention would need
  cross-chunk KV anyway.
* pdrop/TransV stages hook between layers exactly as in `nano_forward`
  (the (L, D) hidden IS materialized between layers, so ranking sees the
  full sequence), which is how 10k-frame inputs compress mid-network.

Peak activation memory becomes O(chunk_tokens · widest) + O(L · D)
instead of O(L · widest). Inference-only (no custom_vjp through the
carried-state path).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.models.nano import (
    _apply_linear,
    compute_logits,
    mlp_mixer_forward,
)
from timeviper_tpu.ops.conv import causal_conv1d
from timeviper_tpu.ops.norms import gated_rms_norm, rms_norm
from timeviper_tpu.ops.ssd_pallas import ssd_auto_continue


def _mamba_layer_chunked(lp, cfg: NanoConfig, hidden, chunk_tokens: int):
    """Stream one Mamba layer over sequence chunks. hidden: (B, L, D).

    Any L: a non-multiple pads the TAIL and slices it back off — the scan
    is causal and the carried state dies with the scan, so trailing pads
    only produce discarded output rows (no divisor hunting, which could
    pick a pathologically small chunk for near-prime post-pdrop lengths)."""
    B, L, D = hidden.shape
    pad = (-L) % chunk_tokens
    if pad:
        out = _mamba_layer_chunked(
            lp, cfg, jnp.pad(hidden, ((0, 0), (0, pad), (0, 0))),
            chunk_tokens)
        return out[:, :L]
    nc = L // chunk_tokens
    K = cfg.mamba_d_conv
    d_inner = cfg.mamba_intermediate_size
    G, N, H, P = (cfg.mamba_n_groups, cfg.ssm_state_size,
                  cfg.mamba_num_heads, cfg.mamba_head_dim)
    gn = G * N
    p = lp["mixer"]
    cv = p["conv1d"]

    xs = jnp.moveaxis(hidden.reshape(B, nc, chunk_tokens, D), 1, 0)

    def body(carry, chunk):
        tail_x, tail_B, tail_C, ssm = carry
        normed = rms_norm(chunk, lp["norm"]["weight"],
                          eps=cfg.layer_norm_epsilon)
        from timeviper_tpu.models.nano import mamba_in_proj

        gate, xr, Br, Cr, dtr = mamba_in_proj(p["in_proj"], cfg, normed)

        def conv_cont(raw, tail, part):
            ext = jnp.concatenate([tail.astype(raw.dtype), raw], axis=1)
            out = causal_conv1d(ext, part["weight"], part["bias"],
                                activation=cfg.mamba_hidden_act)
            return out[:, K - 1:], raw[:, -(K - 1):]

        xsv, tail_x = conv_cont(xr, tail_x, cv["x"])
        Bc, tail_B = conv_cont(Br, tail_B, cv["B"])
        Cc, tail_C = conv_cont(Cr, tail_C, cv["C"])

        y, ssm = ssd_auto_continue(
            xsv.reshape(B, chunk_tokens, H, P), dtr,
            -jnp.exp(p["A_log"]),
            Bc.reshape(B, chunk_tokens, G, N),
            Cc.reshape(B, chunk_tokens, G, N),
            initial_state=ssm,
            chunk_size=cfg.chunk_size,
            D=p["D"], dt_bias=p["dt_bias"],
            dt_limit=cfg.time_step_limit,
            return_final_state=True,
        )
        y = y.reshape(B, chunk_tokens, d_inner)
        y = gated_rms_norm(y, gate, p["norm"]["weight"],
                           eps=cfg.layer_norm_epsilon,
                           group_size=d_inner // G)
        out = chunk + _apply_linear(p["out_proj"], y)
        return (tail_x, tail_B, tail_C, ssm), out

    init = (
        jnp.zeros((B, K - 1, d_inner), hidden.dtype),
        jnp.zeros((B, K - 1, gn), hidden.dtype),
        jnp.zeros((B, K - 1, gn), hidden.dtype),
        jnp.zeros((B, H, P, N), jnp.float32),
    )
    _, ys = jax.lax.scan(body, init, xs)
    return jnp.moveaxis(ys, 0, 1).reshape(B, L, D)


def _mlp_layer_chunked(lp, cfg: NanoConfig, hidden, chunk_tokens: int):
    B, L, D = hidden.shape
    pad = (-L) % chunk_tokens
    if pad:  # pointwise layer: pad rows are independent, slice them off
        out = _mlp_layer_chunked(
            lp, cfg, jnp.pad(hidden, ((0, 0), (0, pad), (0, 0))),
            chunk_tokens)
        return out[:, :L]
    nc = L // chunk_tokens
    xs = jnp.moveaxis(hidden.reshape(B, nc, chunk_tokens, D), 1, 0)

    def body(_, chunk):
        normed = rms_norm(chunk, lp["norm"]["weight"],
                          eps=cfg.layer_norm_epsilon)
        return None, chunk + mlp_mixer_forward(lp["mixer"], cfg, normed)

    _, ys = jax.lax.scan(body, None, xs)
    return jnp.moveaxis(ys, 0, 1).reshape(B, L, D)


def nano_forward_longctx(
    params: Dict[str, Any],
    cfg: NanoConfig,
    inputs_embeds: jax.Array,  # (B, L, D); L % chunk_tokens == 0
    *,
    chunk_tokens: int = 16384,
    logits_to_keep: int = 1,
    pdrop_spec=None,
    pdrop_params=None,
):
    """Full-sequence prefill with O(chunk) wide-intermediate memory.

    Same math as `nano_forward(inputs_embeds=...)`; returns
    {"logits", "hidden_states"}. After a pdrop stage shrinks L below
    chunk_tokens the remaining layers run unchunked.
    """
    hidden = inputs_embeds
    B = hidden.shape[0]

    from timeviper_tpu.models.pdrop import apply_pdrop_stage
    from timeviper_tpu.ops.flash_pallas import flash_attention

    stages = cfg.pdrop_stages if pdrop_spec is not None else ()
    stage_by_layer = {s.layer: (i, s) for i, s in enumerate(stages)}
    labels = None
    seq_idx = None

    for idx, block_type in enumerate(cfg.layers_block_type):
        if idx in stage_by_layer and pdrop_spec is not None:
            stage_idx, stage = stage_by_layer[idx]
            hidden, labels, seq_idx, pdrop_spec = apply_pdrop_stage(
                hidden, labels, seq_idx, pdrop_spec, stage, stage_idx,
                cfg=cfg,
                attn_params=params["layers"][idx]["mixer"]
                if stage.compress_type == "attn" else None,
                merge_params=pdrop_params,
            )
        lp = params["layers"][idx]
        L = hidden.shape[1]
        # after a pdrop stage L may stop dividing chunk_tokens; the
        # chunked helpers pad the tail internally (slicing it back off),
        # so the chunk size never shrinks
        ct = chunk_tokens
        chunked = L > ct
        if block_type == "mamba":
            if chunked:
                hidden = _mamba_layer_chunked(lp, cfg, hidden, ct)
            else:
                from timeviper_tpu.models.nano import mamba_mixer_forward

                normed = rms_norm(hidden, lp["norm"]["weight"],
                                  eps=cfg.layer_norm_epsilon)
                out, _ = mamba_mixer_forward(lp["mixer"], cfg, normed)
                hidden = hidden + out
        elif block_type == "attention":
            # flash attention is already O(L) memory; the qkv projections
            # are narrow (Hq*hd + 2*Hkv*hd wide). Pad L to the kernel's
            # block multiple with a TRAILING zero tail — causal masking
            # means real queries never see it — so a post-pdrop odd L
            # doesn't fall back to the dense O(L²) oracle.
            normed = rms_norm(hidden, lp["norm"]["weight"],
                              eps=cfg.layer_norm_epsilon)
            Hq, Hkv, hd = (cfg.num_attention_heads,
                           cfg.num_key_value_heads, cfg.head_dim)
            p = lp["mixer"]
            q = _apply_linear(p["q_proj"], normed).reshape(B, L, Hq, hd)
            k = _apply_linear(p["k_proj"], normed).reshape(B, L, Hkv, hd)
            v = _apply_linear(p["v_proj"], normed).reshape(B, L, Hkv, hd)
            Lpad = -(-L // 256) * 256 if L >= 512 else L
            if Lpad != L:
                padw = ((0, 0), (0, Lpad - L), (0, 0), (0, 0))
                q = jnp.pad(q, padw)
                k = jnp.pad(k, padw)
                v = jnp.pad(v, padw)
            o = flash_attention(q, k, v, causal=True)[:, :L]
            hidden = hidden + _apply_linear(
                p["o_proj"], o.reshape(B, L, Hq * hd))
        else:
            if chunked:
                hidden = _mlp_layer_chunked(lp, cfg, hidden, ct)
            else:
                normed = rms_norm(hidden, lp["norm"]["weight"],
                                  eps=cfg.layer_norm_epsilon)
                hidden = hidden + mlp_mixer_forward(lp["mixer"], cfg, normed)

    hidden = rms_norm(hidden, params["norm_f"]["weight"],
                      eps=cfg.layer_norm_epsilon)
    tail = hidden[:, -logits_to_keep:] if logits_to_keep else hidden
    return {"hidden_states": hidden, "logits": compute_logits(params, tail)}
