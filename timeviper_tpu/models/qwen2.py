"""Qwen2/Qwen2.5 transformer backbone — TPU-native functional implementation.

Re-design of the reference's grafted Qwen2 (timeviper/model/llm/llm_repo/
qwen2/modeling_qwen2.py): pre-norm decoder blocks, GQA with QKV bias, RoPE
(theta from config), SiLU gate/up/down MLP, RMSNorm, logits in float32.
pdrop/TransV hooks mirror the nano layer loop (modeling_qwen2.py:388-1226)
via the shared models/pdrop.py machinery.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from timeviper_tpu.config import Qwen2Config
from timeviper_tpu.ops.attention import attention, make_attention_mask
from timeviper_tpu.ops.int8_linear import apply_linear_w8a8
from timeviper_tpu.ops.norms import rms_norm
from timeviper_tpu.ops.rope import apply_rope, rope_cos_sin


def _linear(key, d_in, d_out, dtype, std=0.02, bias=False):
    p = {"kernel": (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _apply_linear(p, x):
    if "kernel_q" in p:  # int8 leaves (train/quantize.py)
        # W8A8 on the int8 MXU when calibrated (see models/nano.py
        # _apply_linear and ops/int8_linear.py); weight-only otherwise.
        import os

        mode = os.environ.get("TIMEVIPER_LLM_INT8_MXU", "auto")
        use_mxu = (jax.default_backend() in ("tpu", "axon")
                   if mode == "auto" else mode == "1")
        y = apply_linear_w8a8(p, x, use_int8_mxu=use_mxu)
    else:
        y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
        if p.get("bias") is not None:
            y = y + p["bias"].astype(y.dtype)
    if "lora_a" in p:  # LoRA delta (train/lora.py)
        delta = jnp.einsum(
            "...i,ir,ro->...o", x,
            p["lora_a"].astype(x.dtype), p["lora_b"].astype(x.dtype),
        )
        y = y + delta * p["lora_scale"].astype(y.dtype)
    return y


def init_qwen2_params(key, cfg: Qwen2Config, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    layers: List[Dict[str, Any]] = []
    d, hd = cfg.hidden_size, cfg.head_dim
    for i in range(cfg.num_hidden_layers):
        ks = jax.random.split(keys[i], 7)
        layers.append({
            "input_layernorm": {"weight": jnp.ones((d,), jnp.float32)},
            "self_attn": {
                "q_proj": _linear(ks[0], d, cfg.num_attention_heads * hd, dtype,
                                  bias=cfg.attention_bias),
                "k_proj": _linear(ks[1], d, cfg.num_key_value_heads * hd, dtype,
                                  bias=cfg.attention_bias),
                "v_proj": _linear(ks[2], d, cfg.num_key_value_heads * hd, dtype,
                                  bias=cfg.attention_bias),
                "o_proj": _linear(ks[3], cfg.num_attention_heads * hd, d, dtype),
            },
            "post_attention_layernorm": {"weight": jnp.ones((d,), jnp.float32)},
            "mlp": {
                "gate_proj": _linear(ks[4], d, cfg.intermediate_size, dtype),
                "up_proj": _linear(ks[5], d, cfg.intermediate_size, dtype),
                "down_proj": _linear(
                    ks[6], cfg.intermediate_size, d, dtype,
                    std=0.02 / math.sqrt(cfg.num_hidden_layers)),
            },
        })
    params = {
        "embeddings": (
            jax.random.normal(keys[-3], (cfg.vocab_size, d)) * 0.02
        ).astype(dtype),
        "layers": layers,
        "norm_f": {"weight": jnp.ones((d,), jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _linear(keys[-2], d, cfg.vocab_size, dtype)
    return params


def _attn_forward(p, cfg, x, cos, sin, attn_mask, fill_cache, max_len):
    B, L, _ = x.shape
    Hq, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = _apply_linear(p["q_proj"], x).reshape(B, L, Hq, hd)
    k = _apply_linear(p["k_proj"], x).reshape(B, L, Hkv, hd)
    v = _apply_linear(p["v_proj"], x).reshape(B, L, Hkv, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    out = attention(q, k, v, attn_mask)
    # named for the "scan"/"dots_scan" remat policies (models/nano.py)
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "attn_out")
    out = _apply_linear(p["o_proj"], out.reshape(B, L, Hq * hd))
    new_cache = None
    if fill_cache:
        pad = max_len - L
        new_cache = {
            "k": jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))),
            "v": jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))),
        }
    return out, new_cache


def _mlp_forward(p, x):
    return _apply_linear(
        p["down_proj"],
        jax.nn.silu(_apply_linear(p["gate_proj"], x))
        * _apply_linear(p["up_proj"], x),
    )


def qwen2_forward(
    params: Dict[str, Any],
    cfg: Qwen2Config,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    seq_idx: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    fill_cache: bool = False,
    cache_max_len: int = 0,
    remat: bool = False,
    pdrop_spec=None,
    pdrop_params=None,
    labels: Optional[jax.Array] = None,
    logits_to_keep: int = 0,
    valid_from: int = 0,
):
    """Full-sequence forward (training / prefill); mirrors nano_forward."""
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embeddings"], input_ids, axis=0)
    hidden = inputs_embeds
    B, L, _ = hidden.shape

    def build_positions(seq_idx_, length):
        if position_ids is not None and length == position_ids.shape[1]:
            return position_ids
        if seq_idx_ is not None:
            # restart positions at each packed segment boundary
            start = jnp.concatenate(
                [jnp.zeros((B, 1), bool), seq_idx_[:, 1:] != seq_idx_[:, :-1]],
                axis=1)
            seg_start_pos = jnp.where(start, jnp.arange(length)[None], 0)
            seg_base = jax.lax.cummax(seg_start_pos, axis=1)
            return jnp.arange(length)[None] - seg_base
        return jnp.broadcast_to(jnp.arange(length)[None], (B, length))

    def build_mask(seq_idx_, length):
        if seq_idx_ is not None:
            return make_attention_mask(length, length, causal=True,
                                       q_segment_ids=seq_idx_,
                                       kv_segment_ids=seq_idx_)
        if attention_mask is not None:
            return make_attention_mask(length, length, causal=True,
                                       kv_valid=attention_mask.astype(bool))
        return make_attention_mask(length, length, causal=True)

    pos = build_positions(seq_idx, L)
    attn_mask = build_mask(seq_idx, L)
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)

    from timeviper_tpu.models.pdrop import apply_pdrop_stage

    stages = cfg.pdrop_stages if pdrop_spec is not None else ()
    stage_by_layer = {s.layer: (i, s) for i, s in enumerate(stages)}

    new_layers = []
    ca_kvs = []
    for idx in range(cfg.num_hidden_layers):
        lp = params["layers"][idx]
        if idx in stage_by_layer and pdrop_spec is not None:
            stage_idx, stage = stage_by_layer[idx]
            res_pd = apply_pdrop_stage(
                hidden, labels, seq_idx, pdrop_spec, stage, stage_idx,
                cfg=cfg,
                attn_params=lp["self_attn"]
                if stage.compress_type == "attn" else None,
                merge_params=pdrop_params,
                return_ca_kv=fill_cache,
            )
            if fill_cache:
                hidden, labels, seq_idx, pdrop_spec, ca_kv = res_pd
                ca_kvs.append(ca_kv if ca_kv is not None else {})
            else:
                hidden, labels, seq_idx, pdrop_spec = res_pd
            L = hidden.shape[1]
            pos = build_positions(seq_idx, L)
            attn_mask = build_mask(seq_idx, L)
            cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)

        def block(lp_, h):
            res = h
            n = rms_norm(h, lp_["input_layernorm"]["weight"], cfg.rms_norm_eps)
            a, lc = _attn_forward(lp_["self_attn"], cfg, n, cos, sin, attn_mask,
                                  fill_cache, cache_max_len)
            h = res + a
            res = h
            n = rms_norm(h, lp_["post_attention_layernorm"]["weight"],
                         cfg.rms_norm_eps)
            return res + _mlp_forward(lp_["mlp"], n), lc

        if remat and not fill_cache:
            from timeviper_tpu.models.nano import _remat_wrap

            block = _remat_wrap(
                block, remat if isinstance(remat, str) else "full")
        hidden, lc = block(lp, hidden)
        new_layers.append(lc if lc is not None else {})

    hidden = rms_norm(hidden, params["norm_f"]["weight"], cfg.rms_norm_eps)
    if logits_to_keep:
        hidden_for_logits = hidden[:, -logits_to_keep:]
    else:
        hidden_for_logits = hidden
    logits = compute_logits(params, hidden_for_logits)
    out = {"hidden_states": hidden, "logits": logits, "labels": labels}
    if fill_cache:
        out["cache"] = {
            "layers": new_layers,
            "length": jnp.asarray(L, jnp.int32),
            "valid_from": jnp.asarray(valid_from, jnp.int32),
        }
        if ca_kvs:
            out["cache"]["ca_kv"] = ca_kvs
    return out


def compute_logits(params, hidden):
    lm = params.get("lm_head")
    if lm is not None and "kernel_q" in lm:
        kernel = lm["kernel_q"].astype(jnp.float32) * lm["kernel_scale"]
    elif lm is not None:
        kernel = lm["kernel"]
    else:
        kernel = params["embeddings"].T
    return jnp.einsum("...d,dv->...v", hidden.astype(jnp.float32),
                      kernel.astype(jnp.float32),
                      preferred_element_type=jnp.float32)


def qwen2_decode_step(
    params: Dict[str, Any],
    cfg: Qwen2Config,
    input_ids: jax.Array,
    cache: Dict[str, Any],
    position_offset: Optional[jax.Array] = None,
    pdrop_params=None,
):
    """One decode step.

    RoPE position is LOGICAL: `length - valid_from`. The prefill is
    left-padded to a bucket (pad slots [0, valid_from) hold masked junk)
    and applies segment-relative positions, so real tokens sit at physical
    slots [valid_from, length) with RoPE positions [0, length-valid_from).
    The new token writes its KV at physical slot `length` but must rotate
    at the next logical position. (Optionally offset further for pdrop's
    position shift at decode, modeling_nano.py:1666-1689.)"""
    hidden = jnp.take(params["embeddings"], input_ids, axis=0)
    B = hidden.shape[0]
    length = cache["length"]
    vf = cache.get("valid_from", jnp.zeros((), jnp.int32))
    pos = jnp.broadcast_to((length - vf)[None, None], (B, 1))
    if position_offset is not None:
        pos = pos - position_offset
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    ca_by_layer = {}
    ca_kvs = cache.get("ca_kv")
    if ca_kvs is not None and pdrop_params is not None:
        for si, st in enumerate(cfg.pdrop_stages):
            if (si < len(ca_kvs) and ca_kvs[si]
                    and si < len(pdrop_params)
                    and pdrop_params[si] is not None):
                ca_by_layer[st.layer] = (ca_kvs[si], pdrop_params[si])
    new_layers = []
    Hq, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    for idx in range(cfg.num_hidden_layers):
        lp = params["layers"][idx]
        if idx in ca_by_layer:
            from timeviper_tpu.models.pdrop import merge_dropped_cached

            kv, mp = ca_by_layer[idx]
            hidden = merge_dropped_cached(hidden, kv, mp, cfg)
        res = hidden
        n = rms_norm(hidden, lp["input_layernorm"]["weight"], cfg.rms_norm_eps)
        q = _apply_linear(lp["self_attn"]["q_proj"], n).reshape(B, 1, Hq, hd)
        k_new = _apply_linear(lp["self_attn"]["k_proj"], n).reshape(B, 1, Hkv, hd)
        v_new = _apply_linear(lp["self_attn"]["v_proj"], n).reshape(B, 1, Hkv, hd)
        q = apply_rope(q, cos, sin)
        k_new = apply_rope(k_new, cos, sin)
        cl = cache["layers"][idx]
        k = jax.lax.dynamic_update_slice(
            cl["k"], k_new.astype(cl["k"].dtype), (0, length, 0, 0))
        v = jax.lax.dynamic_update_slice(
            cl["v"], v_new.astype(cl["v"].dtype), (0, length, 0, 0))
        slots = jnp.arange(k.shape[1])[None, :]
        kv_valid = (slots <= length) & (slots >= cache.get("valid_from", 0))
        a = attention(q, k, v, kv_valid[:, None, :])
        a = _apply_linear(lp["self_attn"]["o_proj"], a.reshape(B, 1, Hq * hd))
        hidden = res + a
        res = hidden
        n = rms_norm(hidden, lp["post_attention_layernorm"]["weight"],
                     cfg.rms_norm_eps)
        hidden = res + _mlp_forward(lp["mlp"], n)
        new_layers.append({"k": k, "v": v})
    hidden = rms_norm(hidden, params["norm_f"]["weight"], cfg.rms_norm_eps)
    logits = compute_logits(params, hidden[:, 0])
    new_cache = {
        "layers": new_layers,
        "length": length + 1,
        "valid_from": cache.get("valid_from", jnp.zeros((), jnp.int32)),
    }
    if ca_kvs is not None:
        new_cache["ca_kv"] = ca_kvs
    return logits, new_cache
