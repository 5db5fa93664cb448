"""Nemotron-H hybrid (Mamba-2 / attention / MLP) backbone — TPU-native.

Functional re-design of the reference NemotronHModel/NemotronHForCausalLM
(modeling_nano.py:383-2504): parameters are a pytree, the forward pass is a
pure function with three jit-stable modes:

* full-sequence (training / prefill): Mamba layers run the chunked SSD scan
  (ops/ssd.py, the `mamba_chunk_scan_combined` equivalent), attention layers
  run causal (optionally packed / segment-id) attention. Optionally fills a
  fixed-shape cache for generation.
* single-step decode: Mamba layers use the O(1) state update
  (`selective_state_update` equivalent), attention layers append to a
  fixed-capacity KV buffer.

Layer pattern `M-*-` follows `hybrid_override_pattern`
(configuration_nano.py:140). Attention has *no RoPE* (modeling_nano.py:1012).
MLP is up→relu²→down (modeling_nano.py:971-994). pdrop/TransV live in
models/pdrop.py and hook into the layer loop exactly as the reference does
(modeling_nano.py:1634-1689).

Weight layout notes (must byte-match the converter, SURVEY.md §7 hard part 5):
in_proj packs `[gate(d_inner) | x(d_inner) | B(G*N) | C(G*N) | dt(H)]` along
the output dim (modeling_nano.py:489-492: d_mlp==0 for this config).
Linear kernels are stored (in, out); the converter transposes torch's (out, in).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.ops.attention import attention, make_attention_mask
from timeviper_tpu.ops.conv import (
    causal_conv1d,
    causal_conv1d_update,
    init_conv_state,
)
from timeviper_tpu.ops.int8_linear import apply_linear_w8a8
from timeviper_tpu.ops.norms import gated_rms_norm, rms_norm
from timeviper_tpu.ops.ssd import ssd_update_step
from timeviper_tpu.ops.ssd_pallas import ssd_auto as ssd_chunked


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _linear(key, d_in, d_out, dtype, std=0.02, bias=False):
    p = {"kernel": (jax.random.normal(key, (d_in, d_out)) * std).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def init_mamba_mixer(key, cfg: NanoConfig, dtype) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    d = cfg.hidden_size
    d_inner = cfg.mamba_intermediate_size
    H = cfg.mamba_num_heads
    # dt_bias init: inverse-softplus of log-uniform dt (modeling_nano.py:1352-1366)
    u = jax.random.uniform(ks[2], (H,))
    dt = jnp.exp(
        u * (math.log(cfg.time_step_max) - math.log(cfg.time_step_min))
        + math.log(cfg.time_step_min)
    )
    dt = jnp.clip(dt, cfg.time_step_floor, None)
    inv_dt = dt + jnp.log(-jnp.expm1(-dt))
    kin = jax.random.split(ks[0], 5)
    kcv = jax.random.split(ks[1], 3)
    gn = cfg.mamba_n_groups * cfg.ssm_state_size

    def conv_part(k_, n):
        return {
            "weight": (jax.random.normal(k_, (n, cfg.mamba_d_conv)) * 0.1
                       ).astype(jnp.float32),
            "bias": jnp.zeros((n,), jnp.float32) if cfg.use_conv_bias else None,
        }

    return {
        # in_proj is stored SPLIT by logical role (fused layout
        # [gate|x|B|C|dt] in the torch checkpoint, modeling_nano.py:489-492;
        # the converter splits rows). Separate kernels let tensor parallelism
        # shard gate/x by Mamba heads and B/C by groups on aligned
        # boundaries — a fused kernel cannot shard cleanly under GSPMD.
        "in_proj": {
            "gate": _linear(kin[0], d, d_inner, dtype, bias=cfg.use_bias),
            "x": _linear(kin[1], d, d_inner, dtype, bias=cfg.use_bias),
            "B": _linear(kin[2], d, gn, dtype, bias=cfg.use_bias),
            "C": _linear(kin[3], d, gn, dtype, bias=cfg.use_bias),
            "dt": _linear(kin[4], d, H, dtype, bias=cfg.use_bias),
        },
        # depthwise conv over [x|B|C] == three independent depthwise convs
        "conv1d": {
            "x": conv_part(kcv[0], d_inner),
            "B": conv_part(kcv[1], gn),
            "C": conv_part(kcv[2], gn),
        },
        "dt_bias": inv_dt.astype(jnp.float32),
        "A_log": jnp.log(jnp.arange(1, H + 1, dtype=jnp.float32)),
        "D": jnp.ones((H,), jnp.float32),
        "norm": {"weight": jnp.ones((d_inner,), jnp.float32)},
        "out_proj": _linear(
            ks[3], d_inner, d, dtype,
            std=0.02 / math.sqrt(cfg.num_hidden_layers), bias=cfg.use_bias,
        ),
    }


def init_attention_mixer(key, cfg: NanoConfig, dtype) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    d = cfg.hidden_size
    hd = cfg.head_dim
    return {
        "q_proj": _linear(ks[0], d, cfg.num_attention_heads * hd, dtype,
                          bias=cfg.attention_bias),
        "k_proj": _linear(ks[1], d, cfg.num_key_value_heads * hd, dtype,
                          bias=cfg.attention_bias),
        "v_proj": _linear(ks[2], d, cfg.num_key_value_heads * hd, dtype,
                          bias=cfg.attention_bias),
        "o_proj": _linear(ks[3], cfg.num_attention_heads * hd, d, dtype,
                          bias=cfg.attention_bias),
    }


def init_mlp_mixer(key, cfg: NanoConfig, dtype) -> Dict[str, Any]:
    ks = jax.random.split(key, 2)
    return {
        "up_proj": _linear(ks[0], cfg.hidden_size, cfg.intermediate_size,
                           dtype, bias=cfg.mlp_bias),
        "down_proj": _linear(ks[1], cfg.intermediate_size, cfg.hidden_size,
                             dtype, bias=cfg.mlp_bias),
    }


def init_nano_params(key, cfg: NanoConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_hidden_layers + 3)
    layers: List[Dict[str, Any]] = []
    for i, block_type in enumerate(cfg.layers_block_type):
        init_fn = {
            "mamba": init_mamba_mixer,
            "attention": init_attention_mixer,
            "mlp": init_mlp_mixer,
        }[block_type]
        layers.append({
            "norm": {"weight": jnp.ones((cfg.hidden_size,), jnp.float32)},
            "mixer": init_fn(keys[i], cfg, dtype),
        })
    params = {
        "embeddings": (
            jax.random.normal(keys[-3], (cfg.vocab_size, cfg.hidden_size)) * 0.02
        ).astype(dtype),
        "layers": layers,
        "norm_f": {"weight": jnp.ones((cfg.hidden_size,), jnp.float32)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _linear(keys[-2], cfg.hidden_size, cfg.vocab_size, dtype)
    return params


# ---------------------------------------------------------------------------
# Layer applies
# ---------------------------------------------------------------------------


def _apply_linear(p, x, precision=None):
    if "kernel_q" in p:  # int8 leaves (train/quantize.py)
        # W8A8 on the int8 MXU when the leaf carries a calibrated static
        # activation scale (calibrate_act_scales — serving opt-in); exact
        # per-channel weight-only dequant otherwise. Measurements and
        # rationale: ops/int8_linear.py. Handles its own bias.
        import os

        mode = os.environ.get("TIMEVIPER_LLM_INT8_MXU", "auto")
        use_mxu = (jax.default_backend() in ("tpu", "axon")
                   if mode == "auto" else mode == "1")
        y = apply_linear_w8a8(p, x, use_int8_mxu=use_mxu)
    else:
        y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype),
                       precision=precision)
        if p.get("bias") is not None:
            y = y + p["bias"].astype(y.dtype)
    if "lora_a" in p:  # LoRA delta (train/lora.py)
        delta = jnp.einsum(
            "...i,ir,ro->...o", x,
            p["lora_a"].astype(x.dtype), p["lora_b"].astype(x.dtype),
        )
        y = y + delta * p["lora_scale"].astype(y.dtype)
    return y


def mamba_in_proj(ip: Dict[str, Any], cfg: NanoConfig, x: jax.Array):
    """The Mamba in-projection -> (gate, x, B, C, dt) raw streams.

    Accepts either the canonical split leaves (gate/x/B/C/dt — what TP
    sharding partitions) or a single `fused` leaf created by
    `train/quantize.fuse_decode_in_proj`: one (D, d_in_proj) matmul
    instead of five. The five splits share one input activation, so W8A8
    activation scales fuse exactly; fusing cuts 4 kernel dispatches per
    Mamba layer off the decode step (the reference gets this for free —
    its checkpoint stores in_proj as one matrix, modeling_nano.py:489)."""
    d_inner = cfg.mamba_intermediate_size
    gn = cfg.mamba_n_groups * cfg.ssm_state_size
    H = cfg.mamba_num_heads
    if "fused" in ip:
        out = _apply_linear(ip["fused"], x)
        gate = out[..., :d_inner]
        xr = out[..., d_inner:2 * d_inner]
        Br = out[..., 2 * d_inner:2 * d_inner + gn]
        Cr = out[..., 2 * d_inner + gn:2 * d_inner + 2 * gn]
        dt = out[..., 2 * d_inner + 2 * gn:2 * d_inner + 2 * gn + H]
        return gate, xr, Br, Cr, dt
    return (_apply_linear(ip["gate"], x), _apply_linear(ip["x"], x),
            _apply_linear(ip["B"], x), _apply_linear(ip["C"], x),
            _apply_linear(ip["dt"], x))


def mamba_mixer_forward(
    p: Dict[str, Any],
    cfg: NanoConfig,
    x: jax.Array,
    seq_idx: Optional[jax.Array] = None,
    cache_layer: Optional[Dict[str, Any]] = None,
    fill_cache: bool = False,
    fused_conv: bool = False,
) -> Tuple[jax.Array, Optional[Dict[str, Any]]]:
    """Full-sequence Mamba-2 mixer (training / prefill).

    x: (B, L, D). When `fill_cache`, also returns the decode cache entry.
    Mirrors cuda_kernels_forward's fused path (modeling_nano.py:560-667) with
    seq_idx honoured in prefill too (fixing the reference defect at :648).
    `fused_conv` routes the conv+SiLU+scan through one Pallas program
    (the mamba_split_conv1d_scan_combined analog) — inference-only.
    """
    B, L, _ = x.shape
    d_inner = cfg.mamba_intermediate_size
    G, N, H, P = (cfg.mamba_n_groups, cfg.ssm_state_size,
                  cfg.mamba_num_heads, cfg.mamba_head_dim)

    gate, xr, Br, Cr, dt = mamba_in_proj(p["in_proj"], cfg, x)

    new_cache = None
    if fill_cache:
        new_cache = {"conv_state": {
            "x": init_conv_state(xr, cfg.mamba_d_conv),
            "B": init_conv_state(Br, cfg.mamba_d_conv),
            "C": init_conv_state(Cr, cfg.mamba_d_conv),
        }}

    cv = p["conv1d"]
    use_fused = (
        fused_conv
        and cfg.mamba_d_conv == 4
        and cfg.chunk_size % 128 == 0
        and jax.default_backend() in ("tpu", "axon")
    )
    if use_fused:
        from timeviper_tpu.ops.ssd_pallas import ssd_conv_scan_fused

        y, final_state = ssd_conv_scan_fused(
            xr.reshape(B, L, H, P),
            dt,
            -jnp.exp(p["A_log"]),
            Br.reshape(B, L, G, N),
            Cr.reshape(B, L, G, N),
            {"wx": cv["x"]["weight"], "bx": cv["x"]["bias"],
             "wB": cv["B"]["weight"], "bB": cv["B"]["bias"],
             "wC": cv["C"]["weight"], "bC": cv["C"]["bias"]},
            chunk_size=cfg.chunk_size,
            D=p["D"],
            dt_bias=p["dt_bias"],
            dt_limit=cfg.time_step_limit,
            seq_idx=seq_idx,
        )
    else:
        xs = causal_conv1d(xr, cv["x"]["weight"], cv["x"]["bias"],
                           activation=cfg.mamba_hidden_act, seq_idx=seq_idx)
        B_ = causal_conv1d(Br, cv["B"]["weight"], cv["B"]["bias"],
                           activation=cfg.mamba_hidden_act, seq_idx=seq_idx)
        C = causal_conv1d(Cr, cv["C"]["weight"], cv["C"]["bias"],
                          activation=cfg.mamba_hidden_act, seq_idx=seq_idx)

        y, final_state = ssd_chunked(
            xs.reshape(B, L, H, P),
            dt,
            -jnp.exp(p["A_log"]),
            B_.reshape(B, L, G, N),
            C.reshape(B, L, G, N),
            chunk_size=cfg.chunk_size,
            D=p["D"],
            dt_bias=p["dt_bias"],
            dt_softplus=True,
            dt_limit=cfg.time_step_limit,
            seq_idx=seq_idx,
            return_final_state=True,
        )
    if fill_cache:
        new_cache["ssm_state"] = final_state
    y = y.reshape(B, L, d_inner)
    # named for the "scan" remat policy: saving the SSD output (the one
    # non-matmul heavyweight) lets the backward rebuild skip re-running
    # the chunked scan while wide matmul outputs stay rematerialized
    y = checkpoint_name(y, "ssd_out")
    y = gated_rms_norm(
        y, gate, p["norm"]["weight"], eps=cfg.layer_norm_epsilon,
        group_size=d_inner // G,
    )
    return _apply_linear(p["out_proj"], y), new_cache


def mamba_mixer_decode(
    p: Dict[str, Any],
    cfg: NanoConfig,
    x: jax.Array,
    cache_layer: Dict[str, Any],
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Single-token decode (modeling_nano.py:484-546). x: (B, 1, D)."""
    B = x.shape[0]
    d_inner = cfg.mamba_intermediate_size
    G, N, H, P = (cfg.mamba_n_groups, cfg.ssm_state_size,
                  cfg.mamba_num_heads, cfg.mamba_head_dim)

    ip = p["in_proj"]
    x0 = x[:, 0]
    gate, xr, Br, Cr, dt = mamba_in_proj(ip, cfg, x0)
    cv = p["conv1d"]
    cs = cache_layer["conv_state"]

    import os

    from timeviper_tpu.ops.decode_fused import (
        fused_mamba_decode,
        fused_mamba_decode_supported,
    )

    if (os.environ.get("TIMEVIPER_FUSED_DECODE", "0") == "1"
            and fused_mamba_decode_supported(cfg)
            and cv["x"].get("bias") is not None):
        # x-conv roll + SSD state update + gated norm in ONE Pallas
        # kernel per layer (the reference's causal_conv1d_update +
        # selective_state_update fusion, plus the norm); the tiny B/C
        # convs and dt softplus stay in XLA. Default OFF: the measured
        # A/B at 52L int8 W8A8 is 65.9 tok/s fused vs 72.2 unfused —
        # Mosaic's tiling forces the per-channel work into (CpG, 1)
        # columns that waste 127/128 lanes (same discipline as the
        # fused-LN kernel: unmeasured-or-losing fusions don't ship on)
        from timeviper_tpu.ops.ssd import _process_dt

        B_, cs_B = causal_conv1d_update(Br, cs["B"], cv["B"]["weight"],
                                        cv["B"]["bias"],
                                        cfg.mamba_hidden_act)
        C_, cs_C = causal_conv1d_update(Cr, cs["C"], cv["C"]["weight"],
                                        cv["C"]["bias"],
                                        cfg.mamba_hidden_act)
        dtf = _process_dt(dt, p["dt_bias"], True, cfg.time_step_limit)
        y, cs_x, ssm_state = fused_mamba_decode(
            xr, B_, C_, dtf, gate, cs["x"], cache_layer["ssm_state"], p,
            n_groups=G, head_dim=P, eps=cfg.layer_norm_epsilon)
        out = _apply_linear(p["out_proj"], y)
        return out[:, None, :], {
            "conv_state": {"x": cs_x, "B": cs_B, "C": cs_C},
            "ssm_state": ssm_state}

    xs, cs_x = causal_conv1d_update(xr, cs["x"], cv["x"]["weight"],
                                    cv["x"]["bias"], cfg.mamba_hidden_act)
    B_, cs_B = causal_conv1d_update(Br, cs["B"], cv["B"]["weight"],
                                    cv["B"]["bias"], cfg.mamba_hidden_act)
    C, cs_C = causal_conv1d_update(Cr, cs["C"], cv["C"]["weight"],
                                   cv["C"]["bias"], cfg.mamba_hidden_act)
    conv_state = {"x": cs_x, "B": cs_B, "C": cs_C}
    y, ssm_state = ssd_update_step(
        cache_layer["ssm_state"],
        xs.reshape(B, H, P),
        dt,
        -jnp.exp(p["A_log"]),
        B_.reshape(B, G, N),
        C.reshape(B, G, N),
        D=p["D"],
        dt_bias=p["dt_bias"],
        dt_softplus=True,
        dt_limit=cfg.time_step_limit,
    )
    y = y.reshape(B, d_inner)
    y = gated_rms_norm(
        y, gate, p["norm"]["weight"], eps=cfg.layer_norm_epsilon,
        group_size=d_inner // G,
    )
    out = _apply_linear(p["out_proj"], y)
    return out[:, None, :], {"conv_state": conv_state, "ssm_state": ssm_state}


def attention_mixer_forward(
    p: Dict[str, Any],
    cfg: NanoConfig,
    x: jax.Array,
    segment_ids: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    cache_layer: Optional[Dict[str, Any]] = None,
    fill_cache: bool = False,
    max_len: int = 0,
    training: bool = False,
) -> Tuple[jax.Array, Optional[Dict[str, Any]]]:
    """Prefill/training attention; optionally writes the KV cache.

    With no precomputed dense mask, the O(L)-memory Pallas flash kernel
    handles the causal(+packed) case — required for 16k+ prefill where a
    dense (L, L) logits tensor would not fit HBM. `training` selects the
    flash kernel's conservative forward blocks (the save-residuals
    forward AD uses does not fit VMEM at the big inference blocks).
    """
    B, L, _ = x.shape
    Hq, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = _apply_linear(p["q_proj"], x).reshape(B, L, Hq, hd)
    k = _apply_linear(p["k_proj"], x).reshape(B, L, Hkv, hd)
    v = _apply_linear(p["v_proj"], x).reshape(B, L, Hkv, hd)

    if attn_mask is None:
        from timeviper_tpu.ops.flash_pallas import flash_attention

        out = flash_attention(q, k, v, segment_ids=segment_ids, causal=True,
                              conservative_blocks=training)
    else:
        out = attention(q, k, v, attn_mask)
    # named for the "scan" remat policy (see mamba_mixer_forward)
    out = checkpoint_name(out, "attn_out")
    out = _apply_linear(p["o_proj"], out.reshape(B, L, Hq * hd))

    new_cache = None
    if fill_cache:
        assert max_len >= L, (max_len, L)
        pad = max_len - L
        new_cache = {
            "k": jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))),
            "v": jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))),
        }
    return out, new_cache


def attention_mixer_decode(
    p: Dict[str, Any],
    cfg: NanoConfig,
    x: jax.Array,
    cache_layer: Dict[str, Any],
    length: jax.Array,
    valid_from: jax.Array = 0,
    kv_valid_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    """Single-token decode against the fixed-capacity KV buffer.

    `kv_valid_mask` (max_len,) additionally masks slots the prefill marked
    invalid — the masked sharded-pdrop prefill keeps dropped tokens in
    their cache slots instead of compacting (parallel/seq_parallel.py),
    so decode must skip them.

    After a COMPACTING pdrop prefill, layers differ: an attention layer
    that ran BEFORE a drop stage cached the pre-drop rows (the reference's
    per-layer HybridCache has the same property, and its decode attends
    each layer's full cache, modeling_nano.py:1162-1165). Such caches
    carry a per-layer `kv_len` — the row count at that layer — and decode
    writes/masks at it instead of the global post-drop `length` (which
    would overwrite a live pre-drop row). A per-layer `kv_valid` plays
    the analogous role for the masked (non-compacting) sharded prefill."""
    B = x.shape[0]
    Hq, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = _apply_linear(p["q_proj"], x).reshape(B, 1, Hq, hd)
    k_new = _apply_linear(p["k_proj"], x).reshape(B, 1, Hkv, hd)
    v_new = _apply_linear(p["v_proj"], x).reshape(B, 1, Hkv, hd)
    kv_len_in = cache_layer.get("kv_len")
    # engine decode wraps slot caches with a leading batch dim; keep the
    # stored shape on return, compute with the scalar
    kv_len = (length if kv_len_in is None
              else jnp.asarray(kv_len_in).reshape(()))
    layer_valid = cache_layer.get("kv_valid")
    if layer_valid is not None and layer_valid.ndim > 1:
        layer_valid = layer_valid.reshape(layer_valid.shape[-1])
    zero = jnp.zeros((), kv_len.dtype) if hasattr(kv_len, "dtype") else 0
    k = jax.lax.dynamic_update_slice(
        cache_layer["k"], k_new.astype(cache_layer["k"].dtype),
        (zero, kv_len, zero, zero),
    )
    v = jax.lax.dynamic_update_slice(
        cache_layer["v"], v_new.astype(cache_layer["v"].dtype),
        (zero, kv_len, zero, zero),
    )
    max_len = k.shape[1]
    slots = jnp.arange(max_len)[None, :]
    kv_valid = (slots <= kv_len) & (slots >= valid_from)
    if layer_valid is not None:
        kv_valid = kv_valid & layer_valid.at[kv_len].set(True)[None, :]
    elif kv_valid_mask is not None:
        kv_valid = kv_valid & kv_valid_mask[None, :]
    out = attention(q, k, v, kv_valid[:, None, :])
    out = _apply_linear(p["o_proj"], out.reshape(B, 1, Hq * hd))
    lc = {"k": k, "v": v}
    if kv_len_in is not None:
        lc["kv_len"] = kv_len_in + 1
    if layer_valid is not None:
        lc["kv_valid"] = jnp.reshape(
            layer_valid.at[kv_len].set(True),
            cache_layer["kv_valid"].shape)
    return out, lc


def mlp_mixer_forward(p: Dict[str, Any], cfg: NanoConfig, x: jax.Array) -> jax.Array:
    """up → relu² → down (modeling_nano.py:971-994)."""
    h = _apply_linear(p["up_proj"], x)
    h = jnp.square(jax.nn.relu(h))
    return _apply_linear(p["down_proj"], h)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def _block_forward(
    layer_params, cfg, block_type, hidden, *, seq_idx, attn_mask,
    cache_layer, fill_cache, max_len, fused_conv=False, training=False,
):
    residual = hidden
    normed = rms_norm(hidden, layer_params["norm"]["weight"],
                      eps=cfg.layer_norm_epsilon)
    new_cache = None
    if block_type == "mamba":
        out, new_cache = mamba_mixer_forward(
            layer_params["mixer"], cfg, normed, seq_idx=seq_idx,
            fill_cache=fill_cache, fused_conv=fused_conv,
        )
    elif block_type == "attention":
        out, new_cache = attention_mixer_forward(
            layer_params["mixer"], cfg, normed, segment_ids=seq_idx,
            attn_mask=attn_mask, fill_cache=fill_cache, max_len=max_len,
            training=training,
        )
    else:
        out = mlp_mixer_forward(layer_params["mixer"], cfg, normed)
    return residual + out, new_cache


def _remat_wrap(fwd, remat_policy: str):
    cp = jax.checkpoint_policies
    if remat_policy == "dots":
        return jax.checkpoint(
            fwd, policy=cp.dots_with_no_batch_dims_saveable)
    if remat_policy == "scan":
        return jax.checkpoint(
            fwd, policy=cp.save_only_these_names("ssd_out", "attn_out"))
    if remat_policy == "dots_scan":
        return jax.checkpoint(
            fwd, policy=cp.save_from_both_policies(
                cp.dots_with_no_batch_dims_saveable,
                cp.save_only_these_names("ssd_out", "attn_out")))
    if remat_policy != "full":
        raise ValueError(f"unknown remat_policy {remat_policy!r}")
    return jax.checkpoint(fwd)


def nano_forward(
    params: Dict[str, Any],
    cfg: NanoConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
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
    fused_conv: bool = False,
    remat_policy: str = "full",
):
    """Full-sequence forward (training / prefill).

    `remat_policy` (with remat=True; `remat` may also BE the policy
    string, which threads it through the bool-typed call chains): "full"
    saves only block inputs — minimum memory, the whole block recomputes
    in backward; "scan" also saves each mixer's named output
    (ssd_out / attn_out), so the backward rebuild skips re-running the
    chunked SSD scan and flash attention; "dots" saves every
    no-batch-dim matmul output (XLA's checkpoint_dots); "dots_scan"
    both. Measured at 13L/hidden-4096/L=8192 on one v5e
    (BENCH_SUITE train_fwdbwd rows): full 9.87k tok/s, scan +1.7%,
    dots +14.5% — gradients identical across policies (bitwise on the CPU test). Reference seam:
    the gradient_checkpointing flag on the HF trainer
    (hf_mtask_trainer args), which only has the all-or-nothing mode.

    Returns dict with `hidden_states`, `logits`, and when `fill_cache` a
    `cache` pytree ready for decode; when `pdrop_spec` is given, also the
    pdrop-updated `labels` (reference returns updated labels the same way,
    modeling_nano.py:2425-2446).
    """
    if isinstance(remat, str):
        remat, remat_policy = True, remat
    if inputs_embeds is None:
        inputs_embeds = jnp.take(params["embeddings"], input_ids, axis=0)
    hidden = inputs_embeds
    B, L, _ = hidden.shape

    # seq_idx flows through as segment ids (flash kernel handles packing
    # with O(L) memory); only an explicit 2D padding mask goes dense
    attn_mask = None
    if attention_mask is not None:
        attn_mask = make_attention_mask(L, L, causal=True,
                                        kv_valid=attention_mask.astype(bool))

    new_layers = []
    from timeviper_tpu.models.pdrop import apply_pdrop_stage  # lazy, avoids cycle

    stages = cfg.pdrop_stages if pdrop_spec is not None else ()
    stage_by_layer = {s.layer: (i, s) for i, s in enumerate(stages)}

    ca_kvs: List[Any] = []
    for idx, block_type in enumerate(cfg.layers_block_type):
        if idx in stage_by_layer and pdrop_spec is not None:
            stage_idx, stage = stage_by_layer[idx]
            res = apply_pdrop_stage(
                hidden, labels, seq_idx, pdrop_spec, stage, stage_idx,
                cfg=cfg,
                attn_params=params["layers"][idx]["mixer"]
                if stage.compress_type == "attn" else None,
                merge_params=pdrop_params,
                return_ca_kv=fill_cache,
            )
            if fill_cache:
                hidden, labels, seq_idx, pdrop_spec, ca_kv = res
                ca_kvs.append(ca_kv if ca_kv is not None else {})
            else:
                hidden, labels, seq_idx, pdrop_spec = res
            L = hidden.shape[1]
        layer_params = params["layers"][idx]

        def fwd(lp, h, s_idx, a_mask, _bt=block_type):
            return _block_forward(
                lp, cfg, _bt, h, seq_idx=s_idx, attn_mask=a_mask,
                cache_layer=None, fill_cache=fill_cache, max_len=cache_max_len,
                fused_conv=fused_conv, training=remat,
            )

        if remat and not fill_cache:
            fwd = _remat_wrap(fwd, remat_policy)
        hidden, layer_cache = fwd(layer_params, hidden, seq_idx, attn_mask)
        if (fill_cache and pdrop_spec is not None
                and block_type == "attention" and layer_cache is not None):
            # compacting pdrop: this layer's KV row count is ITS length,
            # not the post-drop global one — decode writes/masks per layer
            # (see attention_mixer_decode)
            layer_cache["kv_len"] = jnp.asarray(hidden.shape[1], jnp.int32)
        new_layers.append(layer_cache if layer_cache is not None else {})

    hidden = rms_norm(hidden, params["norm_f"]["weight"],
                      eps=cfg.layer_norm_epsilon)

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
            # TransV cross-attn K/V of the dropped tokens, per pdrop stage
            # — decode steps re-merge against these (cross_attention.py
            # past_key_value_ca semantics)
            out["cache"]["ca_kv"] = ca_kvs
    return out


def compute_logits(params, hidden):
    """lm_head in float32 (modeling_nano.py:2428-2433)."""
    lm = params.get("lm_head")
    if lm is not None and "kernel_q" in lm:
        kernel = lm["kernel_q"].astype(jnp.float32) * lm["kernel_scale"]
    elif lm is not None:
        kernel = lm["kernel"]
    else:
        kernel = params["embeddings"].T
    return jnp.einsum(
        "...d,dv->...v", hidden.astype(jnp.float32),
        kernel.astype(jnp.float32),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def nano_decode_step(
    params: Dict[str, Any],
    cfg: NanoConfig,
    input_ids: jax.Array,
    cache: Dict[str, Any],
    pdrop_params=None,
):
    """One decode step. input_ids: (B, 1). Returns (logits (B, V), cache).

    When the prefill ran pdrop+TransV with `fill_cache`, `cache["ca_kv"]`
    holds the dropped tokens' cross-attn K/V per stage; with the merge
    params passed, each new token re-merges the dropped information at the
    stage's layer (decode-time TransV, cross_attention.py:218-324)."""
    hidden = jnp.take(params["embeddings"], input_ids, axis=0)
    length = cache["length"]
    # slot-validity mask from a masked (sharded-pdrop) prefill: mark the
    # slot this step writes as valid, then mask attention with it
    kv_valid_mask = cache.get("kv_valid")
    if kv_valid_mask is not None:
        kv_valid_mask = kv_valid_mask.at[length].set(True)
    ca_by_layer = {}
    ca_kvs = cache.get("ca_kv")
    if ca_kvs is not None and pdrop_params is not None:
        from timeviper_tpu.models.pdrop import merge_dropped_cached

        for si, st in enumerate(cfg.pdrop_stages):
            if (si < len(ca_kvs) and ca_kvs[si]
                    and si < len(pdrop_params)
                    and pdrop_params[si] is not None):
                ca_by_layer[st.layer] = (ca_kvs[si], pdrop_params[si])
    new_layers = []
    for idx, block_type in enumerate(cfg.layers_block_type):
        if idx in ca_by_layer:
            from timeviper_tpu.models.pdrop import merge_dropped_cached

            kv, mp = ca_by_layer[idx]
            hidden = merge_dropped_cached(hidden, kv, mp, cfg)
        layer_params = params["layers"][idx]
        residual = hidden
        normed = rms_norm(hidden, layer_params["norm"]["weight"],
                          eps=cfg.layer_norm_epsilon)
        if block_type == "mamba":
            out, lc = mamba_mixer_decode(
                layer_params["mixer"], cfg, normed, cache["layers"][idx]
            )
        elif block_type == "attention":
            out, lc = attention_mixer_decode(
                layer_params["mixer"], cfg, normed, cache["layers"][idx],
                length, cache.get("valid_from", 0),
                kv_valid_mask=kv_valid_mask,
            )
        else:
            out = mlp_mixer_forward(layer_params["mixer"], cfg, normed)
            lc = {}
        hidden = residual + out
        new_layers.append(lc)
    hidden = rms_norm(hidden, params["norm_f"]["weight"],
                      eps=cfg.layer_norm_epsilon)
    logits = compute_logits(params, hidden[:, 0])
    new_cache = {
        "layers": new_layers,
        "length": length + 1,
        "valid_from": cache.get("valid_from", jnp.zeros((), jnp.int32)),
    }
    if kv_valid_mask is not None:
        new_cache["kv_valid"] = kv_valid_mask
    if ca_kvs is not None:
        new_cache["ca_kv"] = ca_kvs
    return logits, new_cache
