"""N-gram speculative decoding (models/speculative.py).

The invariant: speculative greedy decode is TOKEN-IDENTICAL to the plain
decode loop for any prompt and any acceptance pattern — speculation may
only change how many forward passes produce the tokens, never the tokens.

Coverage:
* ngram_propose unit behaviour (recency, self-match exclusion, no match);
* spec == plain on a random tiny nano model (drafts mostly REJECTED —
  exercises the a=0/partial-commit path and the no-match plain fallback);
* spec == plain on a rigged "successor" model whose greedy output is the
  token cycle i -> i+1 (drafts always ACCEPTED once the cycle recurs —
  exercises the full-accept fast path that reuses the verify cache) plus
  mid-round terminator truncation;
* spec == plain for the qwen2 family (RoPE positions through the
  multi-token verify pass);
* the verify/commit primitive directly: a multi-token continuation at the
  speculative call pattern (tiny chunk_size override + logits_all) equals
  running the same tokens through single decode steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import (
    NanoConfig,
    VLMConfig,
    tiny_nano_config,
    tiny_qwen2_config,
    tiny_vit_config,
)
from timeviper_tpu.models.generate import Generator
from timeviper_tpu.models.speculative import ngram_propose, text_history
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params


def test_ngram_propose():
    buf = jnp.asarray([5, 6, 9, 9, 5, 6, 7, 8, 5, 6, -1, -1, -1, -1],
                      jnp.int32)
    # last bigram (5, 6) at the end; most recent earlier match ends at
    # index 5 => proposal starts at p=6 -> [7, 8, 5]
    draft, has = ngram_propose(buf, jnp.asarray(10), n_draft=3, k=2)
    assert bool(has)
    assert list(np.asarray(draft)) == [7, 8, 5]
    # no match for the bigram (9, 5): [..., 9, 5] tail
    buf2 = jnp.asarray([1, 2, 3, 4, 9, 5, -1, -1], jnp.int32)
    _, has2 = ngram_propose(buf2, jnp.asarray(6), n_draft=3, k=2)
    assert not bool(has2)
    # self-match exclusion: the k-gram appearing ONLY at the very end must
    # not propose (p == buf_len is excluded)
    buf3 = jnp.asarray([1, 2, 3, 4, 5, 6, -1, -1], jnp.int32)
    _, has3 = ngram_propose(buf3, jnp.asarray(6), n_draft=2, k=2)
    assert not bool(has3)


def test_text_history_strips_placeholders():
    buf, n = text_history([5, 6, -200, -200, 7, 0, 8], image_token_id=-200,
                          pad_token_id=0, max_new_tokens=4, n_draft=3)
    assert n == 4 and list(buf[:4]) == [5, 6, 7, 8]
    assert (buf[4:] == -1).all()


def _nano_arch(**llm_kw):
    return VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(**llm_kw),
        llm_family="nano",
    )


def _gen_pair(arch, params, *, max_new, n_draft, terminators=(2,)):
    common = dict(terminator_ids=terminators, pad_token_id=0,
                  max_new_tokens=max_new, cache_dtype=jnp.float32)
    plain = Generator(params, arch, **common)
    spec = Generator(params, arch, speculative="ngram", n_draft=n_draft,
                     **common)
    return plain, spec


def test_spec_equals_plain_random_nano():
    arch = _nano_arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    plain, spec = _gen_pair(arch, params, max_new=12, n_draft=3)
    # repeated bigrams in the prompt so the proposer fires (and the random
    # model rejects most drafts — the partial-commit path)
    ids = [5, 6, 7, 8, 5, 6, 7, 9, 5, 6, 7, 8, 11]
    a = plain.generate(ids)
    b = spec.generate(ids)
    assert list(a.token_ids) == list(b.token_ids), (
        list(a.token_ids), list(b.token_ids))
    assert a.num_generated == b.num_generated


def _successor_params(arch, vocab: int):
    """Zero every mixer's output projection so hidden == embedding, with
    one-hot embeddings and a shifted lm_head: greedy argmax after token i
    is exactly (i+1) % vocab — a fully predictable model where n-gram
    drafts from a cyclic history are always correct."""
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    lp = params["llm_backbone"]
    D = arch.llm.hidden_size
    emb = jnp.zeros((vocab, D), jnp.float32).at[
        jnp.arange(vocab), jnp.arange(vocab)].set(1.0)
    lp["embeddings"] = emb
    shift = jnp.zeros((D, vocab), jnp.float32).at[
        jnp.arange(vocab), (jnp.arange(vocab) + 1) % vocab].set(1.0)
    lp["lm_head"] = {"kernel": shift}
    for layer in lp["layers"]:
        mix = layer["mixer"]
        for name in ("out_proj", "o_proj", "down_proj"):
            if name in mix:
                mix[name]["kernel"] = jnp.zeros_like(mix[name]["kernel"])
    return params


def test_spec_full_accept_successor_model():
    vocab = 16
    arch = _nano_arch(vocab_size=vocab)
    params = _successor_params(arch, vocab)
    # no terminator in range => runs to max_new; the cycle guarantees the
    # proposer's drafts are the true continuation once one period passed
    plain, spec = _gen_pair(arch, params, max_new=24, n_draft=4,
                            terminators=(99,))
    ids = [3, 4, 5, 6, 7, 8]
    a = plain.generate(ids)
    b = spec.generate(ids)
    expect = [(8 + 1 + t) % vocab for t in range(24)]
    assert list(a.token_ids) == expect
    assert list(b.token_ids) == expect
    assert b.num_generated == 24


def test_spec_terminator_inside_accepted_drafts():
    vocab = 16
    arch = _nano_arch(vocab_size=vocab)
    params = _successor_params(arch, vocab)
    # generation from 8: 9, 10, 11, 12, 13 — stop at 13; give the
    # proposer a full earlier cycle so drafts span the terminator
    plain, spec = _gen_pair(arch, params, max_new=24, n_draft=4,
                            terminators=(13,))
    ids = list(range(16)) + [3, 4, 5, 6, 7, 8]
    a = plain.generate(ids)
    b = spec.generate(ids)
    assert list(a.token_ids) == [9, 10, 11, 12, 13]
    assert list(b.token_ids) == list(a.token_ids)


def test_spec_equals_plain_qwen2():
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2",
                      llm_backbone_id="qwen2.5-7b-instruct"),
        vision=tiny_vit_config(),
        llm=tiny_qwen2_config(),
        llm_family="qwen2",
    )
    params = init_vlm_params(jax.random.PRNGKey(1), arch, dtype=jnp.float32)
    plain, spec = _gen_pair(arch, params, max_new=10, n_draft=3)
    ids = [5, 6, 7, 8, 5, 6, 7, 8, 9]
    a = plain.generate(ids)
    b = spec.generate(ids)
    assert list(a.token_ids) == list(b.token_ids)


def test_verify_commit_matches_decode_steps():
    """The speculative verify/commit calls (chunk_size=S, logits_all) must
    equal stepping the same tokens through nano_decode_step one by one —
    both the logits at every position and the committed cache."""
    from timeviper_tpu.models.nano import (
        init_nano_params,
        nano_decode_step,
        nano_forward,
    )
    from timeviper_tpu.models.prefix_cache import nano_forward_continue

    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    P, S, M = 24, 5, 64
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, P), 0,
                             cfg.vocab_size)
    pre = nano_forward(params, cfg, input_ids=ids, fill_cache=True,
                       cache_max_len=M)
    seq = jax.random.randint(jax.random.PRNGKey(2), (S,), 0, cfg.vocab_size)

    embeds = jnp.take(params["embeddings"], seq, axis=0)[None]
    logits_all, cache_v = nano_forward_continue(
        params, cfg, embeds, pre["cache"], jnp.asarray(S, jnp.int32),
        logits_all=True, chunk_size=S)

    cache = pre["cache"]
    step_logits = []
    for t in range(S):
        lg, cache = nano_decode_step(params, cfg, seq[t][None, None], cache)
        step_logits.append(lg[0])

    for t in range(S):
        a = np.asarray(logits_all[0, t], np.float32)
        b = np.asarray(step_logits[t], np.float32)
        err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        assert err < 2e-4, (t, err)

    # committed cache (full accept) == stepped cache
    flat_v, _ = jax.tree_util.tree_flatten(cache_v)
    flat_s, _ = jax.tree_util.tree_flatten(cache)
    for av, as_ in zip(flat_v, flat_s):
        av, as_ = np.asarray(av, np.float32), np.asarray(as_, np.float32)
        assert av.shape == as_.shape
        err = np.abs(av - as_).max() / max(np.abs(as_).max(), 1e-6)
        assert err < 2e-4, err

    # partial commit (real_len=2) == two decode steps
    _, cache_p = nano_forward_continue(
        params, cfg, embeds, pre["cache"], jnp.asarray(2, jnp.int32),
        logits_all=True, chunk_size=S)
    cache2 = pre["cache"]
    for t in range(2):
        _, cache2 = nano_decode_step(params, cfg, seq[t][None, None], cache2)
    # compare mamba states + length (attention junk rows beyond length+2
    # differ by design and are never attended)
    assert int(cache_p["length"]) == int(cache2["length"])
    for lp_, ls in zip(cache_p["layers"], cache2["layers"]):
        if "ssm_state" in lp_:
            for k in ("ssm_state",):
                a = np.asarray(lp_[k], np.float32)
                b = np.asarray(ls[k], np.float32)
                err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
                assert err < 2e-4, err
            for part in ("x", "B", "C"):
                a = np.asarray(lp_["conv_state"][part], np.float32)
                b = np.asarray(ls["conv_state"][part], np.float32)
                assert np.abs(a - b).max() < 2e-4
