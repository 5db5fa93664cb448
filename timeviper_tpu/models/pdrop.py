"""pdrop (PyramidDrop) + TransV token transfer — in-graph, static shapes.

TPU redesign of the reference's mid-network visual-token dropping
(modeling_nano.py:1634-1689, flash_rank_drop :2156-2204, pdrop_no_pack
:1779-2095, merge_dropped_information :1748-1777) and the TransV
cross-attention merge (merge_modules/cross_attention.py:218-324).

The reference rebuilds python lists of tensors per layer (dynamic shapes).
Here the key observation (SURVEY.md §7 hard part 3) is that drop ratios are
*static config*, so every pdrop stage has a fixed output length: keep counts
are `int(num_vision * ratio)` computed in Python, and each stage is a
`top_k` + `gather` producing a new static sequence length. The sample layout
(`vision_start`, `num_vision`, `text_suffix`) is trace-time static; XLA
compiles one executable per layout bucket.

Sequence layout per sample: [prefix text | visual tokens | suffix text].
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import PdropStage
from timeviper_tpu.ops.attention import cross_attention


def _proj(pp, x):
    # the shared linear apply: handles plain, int8-quantized (kernel_q),
    # and LoRA leaves — pdrop/TransV must run on int8 serving params
    from timeviper_tpu.models.nano import _apply_linear

    return _apply_linear(pp, x)


@dataclass(frozen=True)
class PdropSampleSpec:
    """Static layout of one (possibly packed) sample at the CURRENT stage."""

    vision_start: int  # tokens before the visual block
    num_vision: int  # visual tokens at the current stage
    text_suffix: int  # tokens after the visual block
    # static query position for "attn" ranking at inference: index of the last
    # prompt token within the sample (reference modeling_nano.py:1906-1917).
    # None => derive from labels (training; last token before first answer
    # span, :1886-1905).
    query_pos: Optional[int] = None

    @property
    def length(self) -> int:
        return self.vision_start + self.num_vision + self.text_suffix


@dataclass(frozen=True)
class PdropSpec:
    samples: Tuple[PdropSampleSpec, ...]
    # original vision counts (ratio 1.0) per sample — keep counts derive from
    # these so cumulative ratios match the reference (pdrop_ratios[cur] vs
    # [cur+1], modeling_nano.py:1789-1802)
    orig_num_vision: Tuple[int, ...]
    ratios: Tuple[float, ...]  # [1.0, r1, r2, ...]

    @property
    def total_length(self) -> int:
        return sum(s.length for s in self.samples)


def make_pdrop_spec(
    samples: List[Tuple[int, int, int]],
    stages: Tuple[PdropStage, ...],
    query_positions: Optional[List[Optional[int]]] = None,
) -> PdropSpec:
    """samples: list of (vision_start, num_vision, text_suffix)."""
    qp = query_positions or [None] * len(samples)
    return PdropSpec(
        samples=tuple(
            PdropSampleSpec(vs, nv, ts, q)
            for (vs, nv, ts), q in zip(samples, qp)
        ),
        orig_num_vision=tuple(nv for _, nv, _ in samples),
        ratios=(1.0,) + tuple(s.ratio for s in stages),
    )


def _rank_scores_attn(
    sample_hidden: jax.Array,  # (Ls, D) — this sample's hidden states
    attn_params: Dict[str, Any],
    cfg,
    query_pos,  # scalar int (static or traced)
    vision_start: int,
    num_vision: int,
) -> jax.Array:
    """Attention ranking: mean over heads of the last instruction token's
    attention to each visual token (modeling_nano.py:1820-1945).

    Uses the *current layer's* q/k projections on stop-gradient features.
    """
    h = jax.lax.stop_gradient(sample_hidden)
    Hq, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    Ls = h.shape[0]

    proj = _proj

    qh = proj(attn_params["q_proj"], h[None, query_pos])  # (1, Hq*hd)
    k = proj(attn_params["k_proj"], h)  # (Ls, Hkv*hd)
    qh = qh.reshape(Hq, hd).astype(jnp.float32)
    k = k.reshape(Ls, Hkv, hd).astype(jnp.float32)
    k = jnp.repeat(k, Hq // Hkv, axis=1)  # (Ls, Hq, hd)
    logits = jnp.einsum("hd,lhd->hl", qh, k) / jnp.sqrt(float(hd))
    causal = jnp.arange(Ls) <= query_pos
    logits = jnp.where(causal[None, :], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)  # (Hq, Ls)
    scores = probs.mean(axis=0)  # mean over heads
    return jax.lax.dynamic_slice(scores, (vision_start,), (num_vision,))


def _training_query_pos(sample_labels: jax.Array) -> jax.Array:
    """Last token whose label is IGNORE and whose successor is a real label
    (the token right before the final answer span, modeling_nano.py:1886-1905).
    """
    L = sample_labels.shape[0]
    is_ans = sample_labels != -100
    prev_ign = jnp.concatenate([jnp.array([True]), ~is_ans[:-1]])
    starts = is_ans & prev_ign  # positions where an answer span starts
    idx = jnp.arange(L)
    last_start = jnp.max(jnp.where(starts, idx, -1))
    return jnp.maximum(last_start - 1, 0)


def _merge_dropped(
    text_feats: jax.Array,  # (T, D)
    dropped_feats: jax.Array,  # (Nd, D)
    merge_stage_params: Dict[str, Any],
    cfg,
) -> jax.Array:
    """TransV: text queries cross-attend onto dropped visual tokens, gated by
    alpha.tanh() (modeling_nano.py:1748-1777)."""
    p = merge_stage_params["cross_attn"]
    Hq, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    proj = _proj

    T = text_feats.shape[0]
    Nd = dropped_feats.shape[0]
    q = proj(p["q_proj"], text_feats).reshape(1, T, Hq, hd)
    k = proj(p["k_proj"], dropped_feats).reshape(1, Nd, Hkv, hd)
    v = proj(p["v_proj"], dropped_feats).reshape(1, Nd, Hkv, hd)
    out = cross_attention(q, k, v)
    out = proj(p["o_proj"], out.reshape(T, Hq * hd))
    alpha = merge_stage_params["alpha"].astype(text_feats.dtype)
    return text_feats + jnp.tanh(alpha) * out


def _ca_kv(dropped_feats: jax.Array, merge_stage_params, cfg):
    """Project the dropped tokens' cross-attention K/V once at prefill;
    decode steps reuse them (the reference's `past_key_value_ca.check`
    cache, merge_modules/cross_attention.py:261-279)."""
    p = merge_stage_params["cross_attn"]
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim

    proj = _proj

    Nd = dropped_feats.shape[0]
    return {"k": proj(p["k_proj"], dropped_feats).reshape(Nd, Hkv, hd),
            "v": proj(p["v_proj"], dropped_feats).reshape(Nd, Hkv, hd)}


def merge_dropped_cached(hidden: jax.Array, ca_kv, merge_stage_params, cfg):
    """Decode-time TransV: newly generated tokens (B, S, D) cross-attend
    onto the CACHED dropped-token K/V with the same alpha.tanh() gate the
    prefill merge used (cross_attention.py:218-324 decode reuse). S is 1
    at decode; the prefix-cache continuation passes whole suffixes."""
    p = merge_stage_params["cross_attn"]
    Hq, hd = cfg.num_attention_heads, cfg.head_dim
    B, S = hidden.shape[0], hidden.shape[1]

    proj = _proj

    q = proj(p["q_proj"], hidden).reshape(B, S, Hq, hd)
    k = jnp.broadcast_to(ca_kv["k"][None].astype(hidden.dtype),
                         (B, *ca_kv["k"].shape))
    v = jnp.broadcast_to(ca_kv["v"][None].astype(hidden.dtype),
                         (B, *ca_kv["v"].shape))
    out = cross_attention(q, k, v)
    out = proj(p["o_proj"], out.reshape(B, S, Hq * hd))
    alpha = merge_stage_params["alpha"].astype(hidden.dtype)
    return hidden + jnp.tanh(alpha) * out


def _keep_indices(stage, spec, samp, sample_hidden, sample_labels, keep,
                  cur_nv, *, cfg, attn_params):
    """Ranked keep indices (sorted, static count `keep`) for one sample."""
    if stage.compress_type == "uni":
        lin = jnp.linspace(0, cur_nv - 1, keep)
        return jnp.asarray(lin, jnp.int32)
    if stage.compress_type == "attn":
        if samp.query_pos is not None:
            qpos = samp.query_pos
        else:
            assert sample_labels is not None, "training attn-pdrop needs labels"
            qpos = _training_query_pos(sample_labels)
        scores = _rank_scores_attn(
            sample_hidden, attn_params, cfg, qpos, samp.vision_start, cur_nv
        )
        _, keep_idx = jax.lax.top_k(scores, keep)
        return jnp.sort(keep_idx)
    raise NotImplementedError(stage.compress_type)


def _apply_stage_dynamic(
    hidden, labels, seq_idx, spec, stage, stage_idx, *, cfg, attn_params,
    stage_merge, return_ca_kv=False,
):
    """Single-sample pdrop stage where the layout is TRACED data.

    Backs *bucketed* pdrop prefill: `vision_start`/`query_pos` are scalar
    arrays, only `num_vision`/keep counts are static — one compiled program
    per (bucket, frame-count) instead of one per exact prompt layout
    (the eval-recompile problem, reference modeling_nano.py:1876-1958).
    Compaction is a single gather with a computed source map: positions
    inside the (traced-start, static-size) vision window pull the kept
    tokens, positions after it shift left by the static drop count.
    """
    samp = spec.samples[0]
    L = hidden.shape[1]
    cur_nv = samp.num_vision
    keep = min(int(spec.orig_num_vision[0] * spec.ratios[stage_idx + 1]),
               cur_nv)
    vs = samp.vision_start  # traced scalar
    h = hidden[0]
    sl = labels[0] if labels is not None else None

    keep_idx = _keep_indices(stage, spec, samp, h, sl, keep, cur_nv,
                             cfg=cfg, attn_params=attn_params)
    n_drop = cur_nv - keep
    L_new = L - n_drop

    idx = jnp.arange(L_new)
    rel = idx - vs
    in_vis = (rel >= 0) & (rel < keep)
    kept_src = vs + jnp.take(keep_idx, jnp.clip(rel, 0, max(keep - 1, 0)))
    src = jnp.where(in_vis, kept_src,
                    jnp.where(rel >= keep, idx + n_drop, idx))

    new_h = jnp.take(h, src, axis=0)
    new_labels = (jnp.take(labels[0], src, axis=0)[None]
                  if labels is not None else None)
    new_seq = (jnp.take(seq_idx[0], src, axis=0)[None]
               if seq_idx is not None else None)

    ca_kv = None
    if stage_merge is not None and n_drop > 0:
        vision = jax.lax.dynamic_slice_in_dim(h, vs, cur_nv, axis=0)
        kept_mask = jnp.zeros((cur_nv,), jnp.int32).at[keep_idx].set(1)
        dropped_idx = jnp.argsort(kept_mask, stable=True)[:n_drop]
        dropped = jnp.take(vision, jnp.sort(dropped_idx), axis=0)
        # cross-attend ALL positions, then blend only the text suffix
        merged = _merge_dropped(new_h, dropped, stage_merge, cfg)
        suffix = (jnp.arange(L_new) >= vs + keep)[:, None]
        new_h = jnp.where(suffix, merged, new_h)
        if return_ca_kv:
            ca_kv = _ca_kv(dropped, stage_merge, cfg)

    new_qp = samp.query_pos - n_drop if samp.query_pos is not None else None
    new_spec = replace(
        spec,
        samples=(replace(samp, num_vision=keep, query_pos=new_qp),),
    )
    if return_ca_kv:
        return new_h[None], new_labels, new_seq, new_spec, ca_kv
    return new_h[None], new_labels, new_seq, new_spec


def apply_pdrop_stage(
    hidden: jax.Array,  # (1, L, D)
    labels: Optional[jax.Array],  # (1, L) or None
    seq_idx: Optional[jax.Array],  # (1, L) or None
    spec: PdropSpec,
    stage: PdropStage,
    stage_idx: int,
    *,
    cfg,
    attn_params: Optional[Dict[str, Any]],
    merge_params: Optional[List[Optional[Dict[str, Any]]]],
    return_ca_kv: bool = False,
):
    """Run one pdrop stage over every sample in the packed row.

    Returns (hidden, labels, seq_idx, new_spec) with the new static length.
    Batches of rows are handled by vmapping the caller (train/step.py) —
    this operates on one (possibly packed) row, like the reference's
    pdrop_pack; B>1 unpacked rows are vmapped rows here (the reference's
    pdrop_no_pack, modeling_nano.py:1779).
    """
    assert hidden.shape[0] == 1, "pdrop operates on packed batch=1 rows"
    stage_merge_shared = None
    if merge_params is not None and stage_idx < len(merge_params):
        stage_merge_shared = merge_params[stage_idx]
    if len(spec.samples) == 1 and not isinstance(
            spec.samples[0].vision_start, (int, np.integer)):
        return _apply_stage_dynamic(
            hidden, labels, seq_idx, spec, stage, stage_idx, cfg=cfg,
            attn_params=attn_params, stage_merge=stage_merge_shared,
            return_ca_kv=return_ca_kv,
        )
    D = hidden.shape[-1]
    ratios = spec.ratios
    new_samples = []
    h_parts, l_parts, s_parts = [], [], []
    offset = 0
    stage_merge = None
    if merge_params is not None and stage_idx < len(merge_params):
        stage_merge = merge_params[stage_idx]
    ca_kv_out = None  # single-sample only; packed rows are train-only

    for si, samp in enumerate(spec.samples):
        Ls = samp.length
        cur_nv = samp.num_vision
        keep = int(spec.orig_num_vision[si] * ratios[stage_idx + 1])
        keep = min(keep, cur_nv)
        sh = jax.lax.dynamic_slice_in_dim(hidden[0], offset, Ls, axis=0)
        sl = (
            jax.lax.dynamic_slice_in_dim(labels[0], offset, Ls, axis=0)
            if labels is not None else None
        )

        if stage.compress_type == "uni":
            lin = jnp.linspace(0, cur_nv - 1, keep)
            keep_idx = jnp.asarray(lin, jnp.int32)
        elif stage.compress_type == "attn":
            if samp.query_pos is not None:
                qpos = samp.query_pos
            else:
                assert sl is not None, "training attn-pdrop needs labels"
                qpos = _training_query_pos(sl)
            scores = _rank_scores_attn(
                sh, attn_params, cfg, qpos, samp.vision_start, cur_nv
            )
            _, keep_idx = jax.lax.top_k(scores, keep)
            keep_idx = jnp.sort(keep_idx)
        else:
            raise NotImplementedError(stage.compress_type)

        vision = jax.lax.dynamic_slice_in_dim(
            sh, samp.vision_start, cur_nv, axis=0
        )
        kept_vision = jnp.take(vision, keep_idx, axis=0)
        prefix = sh[: samp.vision_start]
        suffix = sh[samp.vision_start + cur_nv :]

        if stage_merge is not None and keep < cur_nv:
            # complement indices, static count (cur_nv - keep)
            kept_mask = jnp.zeros((cur_nv,), jnp.int32).at[keep_idx].set(1)
            dropped_idx = jnp.argsort(kept_mask, stable=True)[: cur_nv - keep]
            dropped_idx = jnp.sort(dropped_idx)
            dropped = jnp.take(vision, dropped_idx, axis=0)
            suffix = _merge_dropped(suffix, dropped, stage_merge, cfg)
            if return_ca_kv and len(spec.samples) == 1:
                ca_kv_out = _ca_kv(dropped, stage_merge, cfg)

        h_parts.append(jnp.concatenate([prefix, kept_vision, suffix], axis=0))
        if sl is not None:
            l_parts.append(
                jnp.concatenate(
                    [sl[: samp.vision_start],
                     jnp.take(sl, samp.vision_start + keep_idx, axis=0),
                     sl[samp.vision_start + cur_nv :]], axis=0)
            )
        new_len = samp.vision_start + keep + samp.text_suffix
        new_qp = samp.query_pos
        if new_qp is not None:
            new_qp = new_qp - (cur_nv - keep)
        new_samples.append(replace(samp, num_vision=keep, query_pos=new_qp))
        s_parts.append(jnp.full((new_len,), si, jnp.int32))
        offset += Ls

    new_hidden = jnp.concatenate(h_parts, axis=0)[None]
    new_labels = jnp.concatenate(l_parts, axis=0)[None] if l_parts else None
    new_seq_idx = (
        jnp.concatenate(s_parts, axis=0)[None] if seq_idx is not None else None
    )
    new_spec = replace(spec, samples=tuple(new_samples))
    if return_ca_kv:
        return new_hidden, new_labels, new_seq_idx, new_spec, ca_kv_out
    return new_hidden, new_labels, new_seq_idx, new_spec


def init_merge_modules(key, cfg, dtype=jnp.bfloat16):
    """TransV merge module params: one cross-attention + alpha gate per
    non-"drop" pdrop stage (modeling_nano.py:1481-1523)."""
    if cfg.merge_module != "CrossAttention":
        return None
    stages = cfg.pdrop_stages
    mods: List[Optional[Dict[str, Any]]] = []
    ks = jax.random.split(key, max(len(stages), 1))
    d = cfg.hidden_size
    hd = cfg.head_dim
    for i, stage in enumerate(stages):
        if "drop" in stage.compress_type:
            mods.append(None)
            continue
        kk = jax.random.split(ks[i], 4)

        def lin(k_, din, dout):
            p = {"kernel": (jax.random.normal(k_, (din, dout)) * 0.02).astype(dtype)}
            if cfg.attention_bias:
                p["bias"] = jnp.zeros((dout,), dtype)
            return p

        mods.append({
            "cross_attn": {
                "q_proj": lin(kk[0], d, cfg.num_attention_heads * hd),
                "k_proj": lin(kk[1], d, cfg.num_key_value_heads * hd),
                "v_proj": lin(kk[2], d, cfg.num_key_value_heads * hd),
                "o_proj": lin(kk[3], cfg.num_attention_heads * hd, d),
            },
            "alpha": jnp.zeros((), jnp.float32),
        })
    return mods


def pdrop_drop_counts(cfg, num_visual: int) -> List[int]:
    """Static per-stage dropped-token counts for `num_visual` original
    visual tokens — the same keep arithmetic as `_apply_stage_dynamic`
    (keep_i = min(int(num_visual · ratio_{i+1}), current); reference
    modeling_nano.py:1789-1802 cumulative-ratio semantics). Serving uses
    this to size slot-uniform ca_kv buffers and track post-drop lengths
    host-side."""
    ratios = (1.0,) + tuple(s.ratio for s in cfg.pdrop_stages)
    cur = num_visual
    drops: List[int] = []
    for i, _s in enumerate(cfg.pdrop_stages):
        keep = min(int(num_visual * ratios[i + 1]), cur)
        drops.append(cur - keep)
        cur = keep
    return drops
