"""Video prefix caching: multi-token continuation on a filled decode cache.

Multi-question video benchmarks ask several questions about the SAME video
(VideoMME ships 3 questions per video, LVBench/MLVU similar). The reference
re-runs the full vision encode + LLM prefill for every question
(evaluate.py:359-679 loops items independently; its vLLM path cannot help —
vLLM disables prefix caching for mamba-family models because the SSM state
is not block-addressable). The hybrid backbone makes prefix reuse *cheap*
in a way transformers never get: 46 of 52 layers carry O(1) state
(conv_state + ssm_state, ~4 MB/layer), so a cached video prefix is a small
pytree plus the 4 attention layers' KV rows.

`nano_forward_continue` runs S suffix tokens (the question) on top of a
cache holding `length` already-processed tokens:

* Mamba layers continue exactly: the conv tail is the cache's rolling
  raw-input window (ops/conv.py init_conv_state layout) and the SSD scan
  starts from the cached `ssm_state` (the same `initial_state` mechanism
  the chunked long-context forward uses, models/longctx.py).
* Attention layers append S KV rows at [length, length+S) and the suffix
  queries attend over the whole prefix with a kv-chunked online-softmax
  (flash-style accumulation in jnp — S is tiny, the prefix is long).
* Suffix padding is TRAILING and *exactly inert*: dt is activated
  (softplus + bias + time_step_limit clamp) on the host side of the
  kernel and set to exactly 0.0 at pad positions, so exp(dt·A) == 1 and
  the dt·B·x contribution is 0 — the SSM state is frozen through pads and
  the final state equals the state at the real suffix end (this holds for
  ANY time_step_limit, unlike masking the raw dt, which the kernel clamp
  would raise back to dt_lo). The conv state is sliced at the real
  length; pad KV rows are masked and then overwritten by subsequent
  decode steps. One executable therefore serves every suffix length in a
  bucket.

Because the nano backbone has no RoPE (SURVEY.md §5.7: NemotronHAttention
is position-embedding-free), a continuation from a cached prefix computes
exactly the same function as one fused prefill — tested token-identical in
tests/test_prefix_cache.py.

`qwen2_forward_continue` is the attention-only-family analog: suffix
tokens rotate at logical positions continuing the prefix (RoPE positions
are segment-relative, so a continuation at a different physical offset is
still the same function), K/V rows append at [length, length+S), and the
same online-softmax suffix attention serves the long cached prefix.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

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



def _mamba_continue(
    p: Dict[str, Any],
    cfg: NanoConfig,
    x: jax.Array,          # (B, S, D) normed suffix (trailing pads)
    cache_layer: Dict[str, Any],
    real_mask: jax.Array,  # (S,) bool, True at real positions
    real_len: jax.Array,   # int32 scalar
    chunk_size: Optional[int] = None,  # override cfg.chunk_size (a tiny,
                                       # non-128-multiple chunk routes the
                                       # few-token speculative verify pass
                                       # through the XLA scan instead of
                                       # spinning up the Pallas grid)
) -> Tuple[jax.Array, Dict[str, Any]]:
    B, S, _ = x.shape
    d_inner = cfg.mamba_intermediate_size
    G, N, H, P = (cfg.mamba_n_groups, cfg.ssm_state_size,
                  cfg.mamba_num_heads, cfg.mamba_head_dim)
    K = cfg.mamba_d_conv

    from timeviper_tpu.models.nano import mamba_in_proj

    gate, xr, Br, Cr, dt = mamba_in_proj(p["in_proj"], cfg, x)
    # inert pads: apply the FULL dt activation (softplus + bias + clamp)
    # here and zero it at pad positions, passing the kernel pre-activated
    # dt. Zeroing the RAW dt instead would break under a config with
    # time_step_limit[0] > 0 — the kernel's clamp would raise pad dt back
    # to dt_lo and the state would decay through pads.
    dt = jax.nn.softplus(
        dt.astype(jnp.float32) + p["dt_bias"].astype(jnp.float32))
    lo, hi = cfg.time_step_limit
    if lo > 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)
    dt = jnp.where(real_mask[None, :, None], dt, 0.0)

    cs = cache_layer["conv_state"]
    new_conv = {}

    def conv_cont(raw, state, part, name):
        # state: (B, C, K) rolling raw window, oldest first — the last K-1
        # raw prefix inputs are state[..., 1:]
        tail = jnp.swapaxes(state[..., 1:], 1, 2).astype(raw.dtype)
        ext = jnp.concatenate([tail, raw], axis=1)  # (B, K-1+S, C)
        out = causal_conv1d(ext, part["weight"], part["bias"],
                            activation=cfg.mamba_hidden_act)[:, K - 1:]
        # new rolling window: last K raw inputs ending at real_len-1 sit at
        # ext columns [real_len-1, real_len+K-1)
        win = jax.lax.dynamic_slice_in_dim(ext, real_len - 1, K, axis=1)
        new_conv[name] = jnp.swapaxes(win, 1, 2).astype(state.dtype)
        return out

    xsv = conv_cont(xr, cs["x"], p["conv1d"]["x"], "x")
    Bc = conv_cont(Br, cs["B"], p["conv1d"]["B"], "B")
    Cc = conv_cont(Cr, cs["C"], p["conv1d"]["C"], "C")

    y, final_state = ssd_auto_continue(
        xsv.reshape(B, S, H, P),
        dt,
        -jnp.exp(p["A_log"]),
        Bc.reshape(B, S, G, N),
        Cc.reshape(B, S, G, N),
        initial_state=cache_layer["ssm_state"],
        chunk_size=chunk_size or cfg.chunk_size,
        D=p["D"],
        dt_bias=None,               # dt arrives pre-activated (above)
        dt_softplus=False,
        dt_limit=(0.0, float("inf")),
        return_final_state=True,
    )
    y = y.reshape(B, S, d_inner)
    y = gated_rms_norm(y, gate, p["norm"]["weight"],
                       eps=cfg.layer_norm_epsilon, group_size=d_inner // G)
    out = _apply_linear(p["out_proj"], y)
    return out, {"conv_state": new_conv, "ssm_state": final_state}


def attention_suffix(
    q: jax.Array,          # (B, S, Hq, hd)
    k: jax.Array,          # (B, M, Hkv, hd) cache buffer incl. suffix rows
    v: jax.Array,
    length: jax.Array,     # prefix rows filled: suffix row i is at length+i
    valid_from: jax.Array,
    kv_valid_mask: Optional[jax.Array] = None,  # (M,) extra slot validity
    kv_chunk: int = 2048,
) -> jax.Array:
    """Online-softmax attention of a short suffix over a long cached prefix.

    Validity for query i: slot j iff valid_from <= j < length + i + 1 (the
    prefix plus the causal part of the suffix). Scans the KV buffer in
    chunks so peak memory is O(S · kv_chunk) instead of O(S · M).

    Large suffixes (S ≥ 256, streaming chunked prefill: bench.py
    BENCH_STREAM, serving engine chunked prompts) take a two-part flash
    path instead: a rectangular NON-causal flash of the suffix against
    the prefix slots (segment-masked to [valid_from, length) ∧ extra) and
    a causal flash of the suffix against itself, merged by the (l, m)
    streaming-softmax invariant — the jnp scan would run the score
    matmuls out of VMEM at these sizes (measured 4.1k tok/s vs 10.9k for
    the batch prefill at the 5k-frame stream)."""
    B, S, Hq, hd = q.shape
    M, Hkv = k.shape[1], k.shape[2]
    rep = Hq // Hkv
    scale = 1.0 / (hd ** 0.5)

    if (jax.default_backend() in ("tpu", "axon") and S >= 256
            and S % 256 == 0 and M % 256 == 0 and hd % 128 == 0):
        return _attention_suffix_flash(q, k, v, length, valid_from,
                                       kv_valid_mask, scale)

    Mpad = -(-M // kv_chunk) * kv_chunk
    if Mpad != M:
        padw = ((0, 0), (0, Mpad - M), (0, 0), (0, 0))
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)
    nchunks = Mpad // kv_chunk

    qf = (q * scale).reshape(B, S, Hkv, rep, hd).astype(jnp.float32)
    kc = jnp.moveaxis(k.reshape(B, nchunks, kv_chunk, Hkv, hd), 1, 0)
    vc = jnp.moveaxis(v.reshape(B, nchunks, kv_chunk, Hkv, hd), 1, 0)
    qpos = jnp.arange(S, dtype=jnp.int32)  # suffix row i -> cache row length+i

    base = jnp.arange(kv_chunk, dtype=jnp.int32)
    mask_extra = None
    if kv_valid_mask is not None:
        mask_extra = jnp.pad(
            kv_valid_mask, (0, Mpad - M)).reshape(nchunks, kv_chunk)

    def body(carry, inp):
        m, l, acc = carry
        if mask_extra is not None:
            ci, kch, vch, extra = inp
        else:
            ci, kch, vch = inp
            extra = None
        slots = ci * kv_chunk + base  # (C,)
        # (S, C): slot valid for query i
        ok = (slots[None, :] >= valid_from) & (
            slots[None, :] < length + qpos[:, None] + 1)
        if extra is not None:
            # extra mask applies to prefix slots only; suffix rows the
            # continuation itself wrote are always valid
            ok = ok & (extra[None, :] | (slots[None, :] >= length))
        s = jnp.einsum("bshrd,bchd->bhrsc", qf, kch.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        s = jnp.where(ok[None, None, None], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        # guard fully-masked rows: keep m finite so exp() stays 0, not nan
        m_safe = jnp.where(jnp.isneginf(m_new), 0.0, m_new)
        p = jnp.exp(s - m_safe[..., None])
        corr = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - m_safe))
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhrsc,bchd->bhrsd", p, vch.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return (m_new, l, acc), None

    m0 = jnp.full((B, Hkv, rep, S), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, Hkv, rep, S), jnp.float32)
    a0 = jnp.zeros((B, Hkv, rep, S, hd), jnp.float32)
    xs = (jnp.arange(nchunks, dtype=jnp.int32), kc, vc)
    if mask_extra is not None:
        xs = xs + (mask_extra,)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, a0), xs)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    # (B, Hkv, rep, S, hd) -> (B, S, Hq, hd)
    out = jnp.moveaxis(out.reshape(B, Hq, S, hd), 1, 2)
    return out.astype(q.dtype)


def _attention_suffix_flash(q, k, v, length, valid_from, kv_valid_mask,
                            scale):
    """Two-part flash suffix attention (see `attention_suffix`).

    The suffix K/V rows already sit in the buffer at [length, length+S);
    they are re-sliced out for the causal part (trailing pads are safe:
    pads only follow real tokens, so any query that could see a pad key
    is itself a pad — its output is discarded by contract)."""
    from timeviper_tpu.parallel.seq_parallel import _block_attn_lse

    B, S = q.shape[:2]
    M = k.shape[1]
    slots = jnp.arange(M, dtype=jnp.int32)
    ok = (slots >= valid_from) & (slots < length)
    if kv_valid_mask is not None:
        ok = ok & kv_valid_mask
    seg_kv = jnp.broadcast_to(
        jnp.where(ok, 0, 1).astype(jnp.int32)[None], (B, M))
    seg_q = jnp.zeros((B, S), jnp.int32)
    o_p, l_p, m_p = _block_attn_lse(q, k, v, causal=False,
                                    seg_q=seg_q, seg_kv=seg_kv, scale=scale)

    zero = jnp.zeros((), length.dtype)
    ks = jax.lax.dynamic_slice(k, (zero, length, zero, zero),
                               (B, S, k.shape[2], k.shape[3]))
    vs = jax.lax.dynamic_slice(v, (zero, length, zero, zero),
                               (B, S, v.shape[2], v.shape[3]))
    o_s, l_s, m_s = _block_attn_lse(q, ks.astype(q.dtype),
                                    vs.astype(q.dtype), causal=True,
                                    scale=scale)

    # (l, m) merge with zero-l guards: the prefix part is fully masked on
    # an empty prefix (length == valid_from) and its o rows are then NaN
    m_new = jnp.maximum(m_p, m_s)  # (B, Hq, S)
    a = jnp.where(l_p > 0, l_p * jnp.exp(m_p - m_new), 0.0)
    b = jnp.where(l_s > 0, l_s * jnp.exp(m_s - m_new), 0.0)
    denom = jnp.maximum(a + b, 1e-30)
    wa = jnp.moveaxis(a / denom, 1, 2)[..., None]  # (B, S, Hq, 1)
    wb = jnp.moveaxis(b / denom, 1, 2)[..., None]
    out = (jnp.where(wa > 0, o_p.astype(jnp.float32) * wa, 0.0)
           + jnp.where(wb > 0, o_s.astype(jnp.float32) * wb, 0.0))
    return out.astype(q.dtype)


def _attention_continue(
    p: Dict[str, Any],
    cfg: NanoConfig,
    x: jax.Array,          # (B, S, D) normed suffix
    cache_layer: Dict[str, Any],
    length: jax.Array,
    valid_from: jax.Array,
    kv_valid_mask: Optional[jax.Array],
    kv_bucket: Optional[int] = None,
    real_len: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, Any]]:
    B, S, _ = x.shape
    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    q = _apply_linear(p["q_proj"], x).reshape(B, S, Hq, hd)
    k_new = _apply_linear(p["k_proj"], x).reshape(B, S, Hkv, hd)
    v_new = _apply_linear(p["v_proj"], x).reshape(B, S, Hkv, hd)
    # per-layer row count/validity after a pdrop prefill (a pre-stage
    # layer's cache holds MORE rows than the global post-drop length —
    # see attention_mixer_decode's kv_len note)
    length = cache_layer.get("kv_len", length)
    layer_valid = cache_layer.get("kv_valid")
    rl = S if real_len is None else real_len
    if layer_valid is not None:
        ext = (jnp.arange(layer_valid.shape[0]) >= length) & (
            jnp.arange(layer_valid.shape[0]) < length + rl)
        layer_valid = layer_valid | ext  # real suffix rows this call writes
        kv_valid_mask = (layer_valid if kv_valid_mask is None
                         else kv_valid_mask & layer_valid)
    zero = jnp.zeros((), length.dtype)
    k = jax.lax.dynamic_update_slice(
        cache_layer["k"], k_new.astype(cache_layer["k"].dtype),
        (zero, length, zero, zero))
    v = jax.lax.dynamic_update_slice(
        cache_layer["v"], v_new.astype(cache_layer["v"].dtype),
        (zero, length, zero, zero))
    # kv_bucket (STATIC) bounds the attention to the buffer's first rows —
    # a streaming caller whose early chunks see a short prefix picks a
    # bucket ≥ length+S instead of paying the full capacity every chunk
    # (the buffers themselves stay full-size; only attention is sliced)
    ka, va = ((k[:, :kv_bucket], v[:, :kv_bucket])
              if kv_bucket is not None and kv_bucket < k.shape[1]
              else (k, v))
    mask_a = (kv_valid_mask[:ka.shape[1]]
              if kv_valid_mask is not None else None)
    out = attention_suffix(q, ka, va, length, valid_from,
                           kv_valid_mask=mask_a)
    out = _apply_linear(p["o_proj"], out.reshape(B, S, Hq * hd))
    lc = {"k": k, "v": v}
    if "kv_len" in cache_layer:
        lc["kv_len"] = length + rl
    if "kv_valid" in cache_layer:
        lc["kv_valid"] = layer_valid
    return out, lc


def qwen2_forward_continue(
    params: Dict[str, Any],
    cfg,  # Qwen2Config
    inputs_embeds: jax.Array,  # (B, S, D), trailing pads beyond real_len
    cache: Dict[str, Any],
    real_len: jax.Array,       # int32: real (unpadded) suffix length
    pdrop_params=None,
    logits_all: bool = False,  # (B, S, V) logits for speculative verify
):
    """qwen2-family continuation on a filled cache (attention-only + RoPE).

    Suffix token i rotates at LOGICAL position (length - valid_from) + i —
    the same convention as qwen2_decode_step (the prefill is left-padded,
    so logical position 0 sits at physical slot valid_from). Trailing pad
    rows get garbage K at slots >= length + real_len, which every real
    query excludes causally and later decode steps overwrite in order.
    Returns (last_logits, new_cache) exactly like nano_forward_continue.
    """
    from timeviper_tpu.models.qwen2 import (
        _apply_linear as _q_linear,
        _mlp_forward,
        compute_logits as q_logits,
    )
    from timeviper_tpu.ops.rope import apply_rope, rope_cos_sin

    B, S, _ = inputs_embeds.shape
    length = cache["length"]
    valid_from = cache.get("valid_from", jnp.zeros((), jnp.int32))
    pos = (length - valid_from) + jnp.arange(S, dtype=jnp.int32)[None]
    pos = jnp.broadcast_to(pos, (B, S))
    cos, sin = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)

    ca_by_layer = {}
    ca_kvs = cache.get("ca_kv")
    if ca_kvs is not None and pdrop_params is not None:
        for si, st in enumerate(cfg.pdrop_stages):
            if (si < len(ca_kvs) and ca_kvs[si]
                    and si < len(pdrop_params)
                    and pdrop_params[si] is not None):
                ca_by_layer[st.layer] = (ca_kvs[si], pdrop_params[si])

    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    hidden = inputs_embeds
    new_layers = []
    for idx in range(cfg.num_hidden_layers):
        lp = params["layers"][idx]
        if idx in ca_by_layer:
            from timeviper_tpu.models.pdrop import merge_dropped_cached

            kv, mp = ca_by_layer[idx]
            hidden = merge_dropped_cached(hidden, kv, mp, cfg)
        res = hidden
        n = rms_norm(hidden, lp["input_layernorm"]["weight"],
                     cfg.rms_norm_eps)
        ap = lp["self_attn"]
        q = _q_linear(ap["q_proj"], n).reshape(B, S, Hq, hd)
        k_new = _q_linear(ap["k_proj"], n).reshape(B, S, Hkv, hd)
        v_new = _q_linear(ap["v_proj"], n).reshape(B, S, Hkv, hd)
        q = apply_rope(q, cos, sin)
        k_new = apply_rope(k_new, cos, sin)
        cl = cache["layers"][idx]
        zero = jnp.zeros((), length.dtype)
        k = jax.lax.dynamic_update_slice(
            cl["k"], k_new.astype(cl["k"].dtype), (zero, length, zero, zero))
        v = jax.lax.dynamic_update_slice(
            cl["v"], v_new.astype(cl["v"].dtype), (zero, length, zero, zero))
        a = attention_suffix(q, k, v, length, valid_from)
        hidden = res + _q_linear(ap["o_proj"], a.reshape(B, S, Hq * hd))
        res = hidden
        n = rms_norm(hidden, lp["post_attention_layernorm"]["weight"],
                     cfg.rms_norm_eps)
        hidden = res + _mlp_forward(lp["mlp"], n)
        new_layers.append({"k": k, "v": v})

    hidden = rms_norm(hidden, params["norm_f"]["weight"], cfg.rms_norm_eps)
    if logits_all:
        logits = q_logits(params, hidden)  # (B, S, V)
    else:
        last = jax.lax.dynamic_slice_in_dim(hidden, real_len - 1, 1, axis=1)
        logits = q_logits(params, last[:, 0])
    new_cache: Dict[str, Any] = {
        "layers": new_layers,
        "length": length + real_len,
        "valid_from": valid_from,
    }
    if ca_kvs is not None:
        new_cache["ca_kv"] = ca_kvs
    return logits, new_cache


def nano_forward_continue(
    params: Dict[str, Any],
    cfg: NanoConfig,
    inputs_embeds: jax.Array,  # (B, S, D), trailing pads beyond real_len
    cache: Dict[str, Any],
    real_len: jax.Array,       # int32: real (unpadded) suffix length
    pdrop_params=None,
    kv_bucket: Optional[int] = None,  # STATIC cap on attended KV rows;
                                      # caller guarantees length + S <= it
    logits_all: bool = False,  # return logits at EVERY suffix position
                               # (B, S, V) — the speculative-decoding
                               # verify pass checks each drafted token
    chunk_size: Optional[int] = None,
):
    """Run a suffix on top of a filled cache; return (last_logits, cache).

    `last_logits`: (B, vocab) at suffix position real_len-1 — feed the
    decode loop exactly like a prefill's first logits. The updated cache
    has length += real_len; the INPUT cache pytree is untouched (jax
    arrays are immutable), so one video prefix serves many questions.
    """
    B, S, _ = inputs_embeds.shape
    length = cache["length"]
    valid_from = cache.get("valid_from", jnp.zeros((), jnp.int32))
    real_mask = jnp.arange(S, dtype=jnp.int32) < real_len

    kv_valid_mask = cache.get("kv_valid")

    # decode-time TransV re-merge (nano_decode_step semantics) generalizes
    # to multi-token suffixes: every suffix token cross-attends the cached
    # dropped-token K/V at the stage's layer
    ca_by_layer = {}
    ca_kvs = cache.get("ca_kv")
    if ca_kvs is not None and pdrop_params is not None:
        for si, st in enumerate(cfg.pdrop_stages):
            if (si < len(ca_kvs) and ca_kvs[si]
                    and si < len(pdrop_params)
                    and pdrop_params[si] is not None):
                ca_by_layer[st.layer] = (ca_kvs[si], pdrop_params[si])

    hidden = inputs_embeds
    new_layers = []
    for idx, block_type in enumerate(cfg.layers_block_type):
        if idx in ca_by_layer:
            from timeviper_tpu.models.pdrop import merge_dropped_cached

            kv, mp = ca_by_layer[idx]
            hidden = merge_dropped_cached(hidden, kv, mp, cfg)
        lp = params["layers"][idx]
        residual = hidden
        normed = rms_norm(hidden, lp["norm"]["weight"],
                          eps=cfg.layer_norm_epsilon)
        if block_type == "mamba":
            out, lc = _mamba_continue(
                lp["mixer"], cfg, normed, cache["layers"][idx],
                real_mask, real_len, chunk_size=chunk_size)
        elif block_type == "attention":
            out, lc = _attention_continue(
                lp["mixer"], cfg, normed, cache["layers"][idx],
                length, valid_from, kv_valid_mask, kv_bucket=kv_bucket,
                real_len=real_len)
        else:
            out = mlp_mixer_forward(lp["mixer"], cfg, normed)
            lc = {}
        hidden = residual + out
        new_layers.append(lc)

    hidden = rms_norm(hidden, params["norm_f"]["weight"],
                      eps=cfg.layer_norm_epsilon)
    if logits_all:
        logits = compute_logits(params, hidden)  # (B, S, V)
    else:
        last = jax.lax.dynamic_slice_in_dim(hidden, real_len - 1, 1, axis=1)
        logits = compute_logits(params, last[:, 0])

    new_cache: Dict[str, Any] = {
        "layers": new_layers,
        "length": length + real_len,
        "valid_from": valid_from,
    }
    if kv_valid_mask is not None:
        # suffix rows [length, length+real_len) become valid prefix slots
        slots = jnp.arange(kv_valid_mask.shape[0], dtype=jnp.int32)
        new_cache["kv_valid"] = kv_valid_mask | (
            (slots >= length) & (slots < length + real_len))
    if ca_kvs is not None:
        new_cache["ca_kv"] = ca_kvs
    return logits, new_cache
