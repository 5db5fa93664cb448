"""N-gram (prompt-lookup) speculative decoding for the hybrid backbone.

Batch-1 decode is weight-bandwidth-bound (~13 ms/step at 52L int8: every
step streams the full 9 GB of weights for ONE token). Verifying K drafted
tokens in a single multi-token pass costs nearly the same HBM traffic as
one step, so any accepted draft is almost-free throughput. Drafts come
from the prompt itself — the most recent occurrence of the last-k-gram in
the token history proposes its continuation (the vLLM "prompt lookup /
ngram" speculator; no draft model). Video QA output is copy-heavy:
timestamps, option strings, subtitle fragments, and entity names repeat
prompt text, where acceptance is high; when no n-gram matches, the loop
falls back to the plain single-token step, so speculation is strictly
opportunistic.

The hybrid (Mamba) cache is NOT rollback-able the way a pure-KV cache is:
the SSM state after a verify pass has absorbed all K drafts, accepted or
not (vLLM disables its speculators for mamba-family models for exactly
this reason). The two-pass design here sidesteps rollback:

  1. VERIFY: run `nano_forward_continue` ([pending, d_1..d_n], all real)
     from the committed cache — logits at every position (`logits_all`).
     Greedy-accept the longest matching draft prefix (a tokens) plus the
     model's own next token (the "bonus").
  2. COMMIT: if ALL drafts were accepted, the verify pass's cache is
     already exactly right (it advanced through [pending, d_1..d_n]).
     Otherwise re-run the same executable with `real_len = a+1` — the
     continuation's trailing-pad inertness (dt == 0 through pads, masked
     KV rows) makes the pads exact no-ops, so the cache lands precisely
     after the accepted prefix. jax pytrees are immutable, so the
     pre-verify cache is still on hand — "rollback" is just not using
     the speculative one.

Greedy-only (the eval operating point): acceptance compares argmax, so
output is TOKEN-IDENTICAL to the plain decode loop — verified by
tests/test_speculative.py. Sampling configs fall back to the plain loop.

The reference has no speculative path at all (its HF loop decodes one
token per forward; its vLLM path cannot speculate over mamba caches).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def ngram_propose(
    buf: jax.Array,      # (M,) int32 token history; slots >= buf_len are -1
    buf_len: jax.Array,  # int32: tokens filled (INCLUDING the pending token)
    n_draft: int,
    k: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """Propose `n_draft` tokens continuing the most recent match of the
    last k-gram. Returns (draft (n_draft,) int32, has_match bool). A draft
    position p is the index AFTER a k-gram match, i.e. candidate tokens
    are buf[p:p+n_draft]; the trivial self-match (p == buf_len) is
    excluded. O(M) elementwise — microseconds even at 80k-token buffers.
    """
    M = buf.shape[0]
    pos = jnp.arange(M, dtype=jnp.int32)
    ok = (pos >= k) & (pos <= buf_len - 1)
    for j in range(k):
        tj = jax.lax.dynamic_index_in_dim(buf, buf_len - 1 - j, keepdims=False)
        prev_j = jnp.concatenate(
            [jnp.full((1 + j,), -2, buf.dtype), buf[: M - 1 - j]])
        ok = ok & (prev_j == tj) & (tj >= 0)
    has = jnp.any(ok)
    p_star = jnp.max(jnp.where(ok, pos, -1))
    draft = jax.lax.dynamic_slice(
        buf, (jnp.maximum(p_star, 0),), (n_draft,))
    return draft, has


def make_spec_decode(
    arch,
    *,
    max_new_tokens: int,
    terminators: Sequence[int],
    n_draft: int = 7,
    ngram_k: int = 2,
    pad_token_id: int = 0,
):
    """Build the jittable speculative decode loop.

    spec_decode(params, first_logits, cache, buf, buf_len) ->
        (out (max_new,), count)

    `buf` is the text-token history (prompt text WITHOUT visual
    placeholders, sized with >= max_new + n_draft + 1 slack, -1 beyond
    buf_len); `first_logits` are the prefill's last-position logits.
    Greedy sampling only. Works for both LLM families: the continuation
    functions share signature and cache layout with the decode step.
    """
    from timeviper_tpu.models import prefix_cache as pc
    from timeviper_tpu.models.vlm import decode_step

    S = n_draft + 1
    terms = jnp.asarray(tuple(int(t) for t in terminators), jnp.int32)
    is_nano = arch.llm_family == "nano"
    cont_fn = pc.nano_forward_continue if is_nano else pc.qwen2_forward_continue
    # a tiny non-128-multiple chunk keeps the S-token SSD continuation on
    # the XLA path (exact; the Pallas grid is built for 128+ chunks)
    cont_kwargs = {"chunk_size": S} if is_nano else {}

    def is_term(t):
        return jnp.any(t[..., None] == terms, axis=-1)

    def spec_decode(params, first_logits, cache, buf, buf_len):
        lp = params["llm_backbone"]
        merge = params.get("merge_modules")

        def run_cont(c, seq, real_len):
            embeds = jnp.take(lp["embeddings"], seq, axis=0)[None]
            return cont_fn(lp, arch.llm, embeds, c, real_len,
                           pdrop_params=merge, logits_all=True,
                           **cont_kwargs)

        def spec_round(operand):
            c, tok, draft = operand
            seq = jnp.concatenate([tok.reshape(1), draft])
            logits, cache_v = run_cont(c, seq, jnp.asarray(S, jnp.int32))
            preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (S,)
            okm = (preds[:-1] == draft).astype(jnp.int32)
            a = jnp.sum(jnp.cumprod(okm))          # accepted drafts, 0..n
            bonus = jax.lax.dynamic_index_in_dim(preds, a, keepdims=False)
            idx = jnp.arange(S, dtype=jnp.int32)
            emit = jnp.where(
                idx < a, jnp.concatenate([draft, jnp.full((1,), -1, draft.dtype)]),
                jnp.where(idx == a, bonus, -1))

            def partial_commit(_):
                _, cc = run_cont(c, seq, a + 1)
                return cc

            cache_new = jax.lax.cond(
                a == n_draft, lambda _: cache_v, partial_commit, None)
            return emit, cache_new

        def plain_round(operand):
            c, tok, _ = operand
            logits, c2 = decode_step(params, arch, tok.reshape(1, 1), c)
            nxt = jnp.argmax(logits[0]).astype(jnp.int32)
            emit = jnp.full((S,), -1, jnp.int32).at[0].set(nxt)
            return emit, c2

        def cond(state):
            i, _, _, done, _, _, _ = state
            return (i < max_new_tokens) & (~done)

        def body(state):
            i, tok, cache, done, out, buf, buf_len = state
            draft, has = ngram_propose(buf, buf_len, n_draft, ngram_k)
            emit, cache = jax.lax.cond(
                has, spec_round, plain_round, (cache, tok, draft))
            navail = jnp.sum((emit >= 0).astype(jnp.int32))  # 1..S
            term_hit = is_term(emit) & (emit >= 0)
            has_t = jnp.any(term_hit)
            first_t = jnp.argmax(term_hit).astype(jnp.int32)
            c = jnp.where(has_t, first_t + 1, navail)
            done = has_t | (i + c >= max_new_tokens)
            c = jnp.minimum(c, max_new_tokens - i)
            # pending token for the next round: the model's own next token
            # (the bonus / the plain step's sample) — everything before it
            # is already in the committed cache
            tok = jax.lax.dynamic_index_in_dim(emit, navail - 1,
                                               keepdims=False)
            emit = jnp.where(jnp.arange(S, dtype=jnp.int32) < c, emit, -1)
            out = jax.lax.dynamic_update_slice(out, emit, (i,))
            buf = jax.lax.dynamic_update_slice(buf, emit, (buf_len,))
            return (i + c, tok, cache, done, out, buf, buf_len + c)

        first = jnp.argmax(first_logits[0]).astype(jnp.int32)
        out = jnp.full((max_new_tokens + S,), -1, jnp.int32).at[0].set(first)
        buf = jax.lax.dynamic_update_slice(
            buf, first.reshape(1), (buf_len,))
        done0 = is_term(first) | (max_new_tokens <= 1)
        state = (jnp.asarray(1, jnp.int32), first, cache, done0, out, buf,
                 buf_len + 1)
        i, _, _, _, out, _, _ = jax.lax.while_loop(cond, body, state)
        return out[:max_new_tokens], i

    return spec_decode


def text_history(ids: Sequence[int], image_token_id, pad_token_id: int,
                 max_new_tokens: int, n_draft: int):
    """Host-side n-gram buffer: prompt TEXT tokens (visual placeholders
    carry no draftable continuations) padded with -1 to a static size
    with room for everything the loop may append."""
    import numpy as np

    toks = [t for t in ids
            if t != image_token_id and t != pad_token_id]
    n = len(toks) + max_new_tokens + n_draft + 2
    size = max(128, 1 << (n - 1).bit_length())
    buf = np.full((size,), -1, np.int32)
    buf[: len(toks)] = toks
    return buf, len(toks)
