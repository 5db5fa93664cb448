"""Video prefix caching (models/prefix_cache.py): a continuation on a
cached prefix must compute exactly the full-prefill function.

The reference re-prefills the whole video for every question on it
(evaluate.py:359-679); multi-question benchmarks (VideoMME: 3 q/video)
pay the 80k-token prefill 3x. The hybrid backbone's O(1) Mamba state
makes the cached-prefix continuation exact and cheap; nano attention has
no RoPE (modeling_nano.py:1012-1114), so a suffix continued at a
different cache offset computes the same function as one fused prefill.

Checks:
* continuation last-logits == full-prefill logits at the same position;
* the updated cache (ssm/conv states, KV rows, length) matches the cache
  a full prefill would have produced — so decode continues identically;
* trailing suffix pads are EXACTLY inert (dt == softplus(-1e9) == 0):
  padded and unpadded suffixes give identical states;
* one PrefixState serves many questions (input cache never mutated);
* Generator-level: prefix-path tokens are teacher-forced-valid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import NanoConfig, VLMConfig, tiny_vit_config
from timeviper_tpu.models.nano import (
    init_nano_params,
    nano_decode_step,
    nano_forward,
)
from timeviper_tpu.models.prefix_cache import nano_forward_continue


def _cfg(**kw):
    base = dict(
        vocab_size=256,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=6,
        hybrid_override_pattern="M-M*M-",
        num_attention_heads=2,
        head_dim=16,
        num_key_value_heads=1,
        ssm_state_size=16,
        mamba_num_heads=4,
        mamba_n_groups=2,
        mamba_head_dim=8,
        chunk_size=16,
    )
    base.update(kw)
    return NanoConfig(**base)


def _close(a, b, tol=2e-4, msg=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    denom = max(float(np.abs(b).max()), 1e-6)
    err = float(np.abs(a - b).max()) / denom
    assert err < tol, (msg, err)


def test_continuation_matches_full_prefill():
    cfg = _cfg()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    P, S_real, S_bucket = 48, 11, 16
    M = 96  # cache capacity
    key = jax.random.PRNGKey(1)
    emb_full = jax.random.normal(
        key, (1, P + S_real, cfg.hidden_size), jnp.float32)

    full = nano_forward(params, cfg, inputs_embeds=emb_full,
                        fill_cache=True, cache_max_len=M)
    full_logits_last = full["logits"][:, -1]

    pre = nano_forward(params, cfg, inputs_embeds=emb_full[:, :P],
                       fill_cache=True, cache_max_len=M)
    suffix = jnp.pad(emb_full[:, P:], ((0, 0), (0, S_bucket - S_real), (0, 0)))
    cont_logits, cont_cache = nano_forward_continue(
        params, cfg, suffix, pre["cache"], jnp.asarray(S_real, jnp.int32))

    _close(cont_logits, full_logits_last, msg="last logits")
    assert int(cont_cache["length"]) == P + S_real

    # cache parity layer by layer: decode would continue identically
    for i, (lc_full, lc_cont) in enumerate(
            zip(full["cache"]["layers"], cont_cache["layers"])):
        bt = cfg.layers_block_type[i]
        if bt == "mamba":
            _close(lc_cont["ssm_state"], lc_full["ssm_state"],
                   msg=f"ssm_state layer {i}")
            for n in ("x", "B", "C"):
                _close(lc_cont["conv_state"][n], lc_full["conv_state"][n],
                       msg=f"conv_state[{n}] layer {i}")
        elif bt == "attention":
            L = P + S_real
            _close(lc_cont["k"][:, :L], lc_full["k"][:, :L],
                   msg=f"kv rows layer {i}")
            _close(lc_cont["v"][:, :L], lc_full["v"][:, :L],
                   msg=f"kv rows layer {i}")

    # one decode step from each cache agrees
    tok = jnp.asarray([[7]], jnp.int32)
    lg_full, _ = nano_decode_step(params, cfg, tok, full["cache"])
    lg_cont, _ = nano_decode_step(params, cfg, tok, cont_cache)
    _close(lg_cont, lg_full, msg="decode step after continuation")


def test_trailing_pads_exactly_inert():
    """Padded vs exact-length suffix: identical logits and states — the
    pad positions' dt is softplus(-1e9) == 0 so the SSM state is frozen
    and conv windows are sliced at the real length."""
    cfg = _cfg()
    params = init_nano_params(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    P, S = 32, 8
    emb = jax.random.normal(jax.random.PRNGKey(3),
                            (1, P + S, cfg.hidden_size), jnp.float32)
    pre = nano_forward(params, cfg, inputs_embeds=emb[:, :P],
                       fill_cache=True, cache_max_len=80)

    lg_a, ca = nano_forward_continue(
        params, cfg, emb[:, P:], pre["cache"], jnp.asarray(S, jnp.int32))
    padded = jnp.pad(emb[:, P:], ((0, 0), (0, 24), (0, 0)),
                     constant_values=3.21)  # non-zero pads: must not matter
    lg_b, cb = nano_forward_continue(
        params, cfg, padded, pre["cache"], jnp.asarray(S, jnp.int32))

    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=0, atol=1e-5)
    for i, bt in enumerate(cfg.layers_block_type):
        if bt == "mamba":
            np.testing.assert_allclose(
                np.asarray(ca["layers"][i]["ssm_state"]),
                np.asarray(cb["layers"][i]["ssm_state"]), rtol=0, atol=1e-5)
            for n in ("x", "B", "C"):
                np.testing.assert_allclose(
                    np.asarray(ca["layers"][i]["conv_state"][n]),
                    np.asarray(cb["layers"][i]["conv_state"][n]),
                    rtol=0, atol=1e-5)
    assert int(ca["length"]) == int(cb["length"]) == P + S


def test_pads_inert_under_dt_clamp():
    """time_step_limit[0] > 0: the kernel clamps activated dt up to dt_lo,
    so masking the RAW dt would leave pads mutating the state (decay +
    dt_lo·B·x). The continuation activates dt host-side and zeroes pads
    AFTER the clamp — padded continuation must still match a full
    prefill exactly."""
    cfg = _cfg(time_step_limit=(0.01, 10.0))
    params = init_nano_params(jax.random.PRNGKey(8), cfg, dtype=jnp.float32)
    P, S_real, S_bucket = 32, 5, 16
    emb = jax.random.normal(jax.random.PRNGKey(9),
                            (1, P + S_real, cfg.hidden_size), jnp.float32)
    full = nano_forward(params, cfg, inputs_embeds=emb,
                        fill_cache=True, cache_max_len=80)
    pre = nano_forward(params, cfg, inputs_embeds=emb[:, :P],
                       fill_cache=True, cache_max_len=80)
    suffix = jnp.pad(emb[:, P:],
                     ((0, 0), (0, S_bucket - S_real), (0, 0)),
                     constant_values=2.5)
    lg, cc = nano_forward_continue(
        params, cfg, suffix, pre["cache"], jnp.asarray(S_real, jnp.int32))
    _close(lg, full["logits"][:, -1], msg="dt-clamped last logits")
    for i, bt in enumerate(cfg.layers_block_type):
        if bt == "mamba":
            _close(cc["layers"][i]["ssm_state"],
                   full["cache"]["layers"][i]["ssm_state"],
                   msg=f"dt-clamped ssm_state layer {i}")


def test_one_prefix_many_questions():
    """The input cache pytree is immutable: a second continuation from the
    same PrefixState is unaffected by the first."""
    cfg = _cfg()
    params = init_nano_params(jax.random.PRNGKey(4), cfg, dtype=jnp.float32)
    P, S = 32, 16
    pre_emb = jax.random.normal(jax.random.PRNGKey(5),
                                (1, P, cfg.hidden_size), jnp.float32)
    pre = nano_forward(params, cfg, inputs_embeds=pre_emb,
                       fill_cache=True, cache_max_len=96)
    q1 = jax.random.normal(jax.random.PRNGKey(6), (1, S, cfg.hidden_size))
    q2 = jax.random.normal(jax.random.PRNGKey(7), (1, S, cfg.hidden_size))

    lg2_first, _ = nano_forward_continue(
        params, cfg, q2, pre["cache"], jnp.asarray(S, jnp.int32))
    nano_forward_continue(params, cfg, q1, pre["cache"],
                          jnp.asarray(S, jnp.int32))
    lg2_again, _ = nano_forward_continue(
        params, cfg, q2, pre["cache"], jnp.asarray(S, jnp.int32))
    np.testing.assert_array_equal(np.asarray(lg2_first),
                                  np.asarray(lg2_again))


def test_qwen2_continuation_matches_full_prefill():
    """qwen2 family: RoPE positions are segment-relative, so a suffix
    continued on a cached prefix (logical positions P..P+S-1) computes
    the same function as one full prefill — logits, KV rows, and a decode
    step all match."""
    from timeviper_tpu.config import tiny_qwen2_config
    from timeviper_tpu.models.qwen2 import (
        init_qwen2_params,
        qwen2_decode_step,
        qwen2_forward,
    )
    from timeviper_tpu.models.prefix_cache import qwen2_forward_continue

    cfg = tiny_qwen2_config()
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.float32)
    P, S_real, S_bucket, M = 48, 11, 16, 96
    emb = jax.random.normal(jax.random.PRNGKey(1),
                            (1, P + S_real, cfg.hidden_size), jnp.float32)

    full = qwen2_forward(params, cfg, inputs_embeds=emb,
                         fill_cache=True, cache_max_len=M)
    pre = qwen2_forward(params, cfg, inputs_embeds=emb[:, :P],
                        fill_cache=True, cache_max_len=M)
    suffix = jnp.pad(emb[:, P:],
                     ((0, 0), (0, S_bucket - S_real), (0, 0)),
                     constant_values=1.5)  # non-zero pads: must be inert
    cont_logits, cont_cache = qwen2_forward_continue(
        params, cfg, suffix, pre["cache"], jnp.asarray(S_real, jnp.int32))

    _close(cont_logits, full["logits"][:, -1], msg="qwen2 last logits")
    assert int(cont_cache["length"]) == P + S_real
    L = P + S_real
    for i, (lf, lc) in enumerate(zip(full["cache"]["layers"],
                                     cont_cache["layers"])):
        _close(lc["k"][:, :L], lf["k"][:, :L], msg=f"k rows layer {i}")
        _close(lc["v"][:, :L], lf["v"][:, :L], msg=f"v rows layer {i}")

    tok = jnp.asarray([[7]], jnp.int32)
    lg_full, _ = qwen2_decode_step(params, cfg, tok, full["cache"])
    lg_cont, _ = qwen2_decode_step(params, cfg, tok, cont_cache)
    _close(lg_cont, lg_full, msg="qwen2 decode step after continuation")


def test_generator_prefix_qwen2_teacher_forced():
    """Generator-level qwen2 prefix path: prefill_prefix + continuations
    serve teacher-forced-valid tokens for two questions on one prefix."""
    from timeviper_tpu.config import tiny_qwen2_config
    from timeviper_tpu.models.generate import Generator
    from timeviper_tpu.models.qwen2 import qwen2_forward
    from timeviper_tpu.models.vlm import VLMArch, init_vlm_params

    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2",
                      llm_backbone_id="qwen2.5-7b-instruct"),
        vision=tiny_vit_config(),
        llm=tiny_qwen2_config(),
        llm_family="qwen2",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    gen = Generator(params, arch, terminator_ids=[2], max_new_tokens=4,
                    cache_dtype=jnp.float32)
    prefix_ids = [5, 6, 7, 8, 9, 10, 11, 12]
    state = gen.prefill_prefix(prefix_ids, suffix_budget=64)
    for suffix_ids in ([13, 14, 15], [16, 17]):
        out = gen.generate(suffix_ids, prefix=state)
        toks = [int(t) for t in out.token_ids]
        assert len(toks) >= 1
        seq = jnp.asarray([prefix_ids + suffix_ids + toks[:-1]], jnp.int32)
        logits = np.asarray(qwen2_forward(
            params["llm_backbone"], arch.llm, input_ids=seq)["logits"][0])
        start = len(prefix_ids) + len(suffix_ids) - 1
        for t, tok in enumerate(toks):
            row = logits[start + t]
            assert row[tok] >= row.max() - 5e-2, (
                t, tok, int(row.argmax()), float(row.max() - row[tok]))


def test_pdrop_prefix_matches_full_prefill_same_query():
    """prefill_prefix(use_pdrop=True) + continuation == one bucketed pdrop
    prefill of prefix+question with the SAME ranking query (the last
    prefix token). Exercises attn-ranked dropping, ca_kv re-merge on the
    suffix, and kv_valid masking across the two geometries (different
    buckets/pads — positions don't matter: nano attention has no RoPE)."""
    from timeviper_tpu.data.fusion import plan_fusion
    from timeviper_tpu.models.generate import Generator, pick_bucket
    from timeviper_tpu.models.vlm import VLMArch, init_vlm_params
    from timeviper_tpu.config import tiny_nano_config, tiny_vit_config

    llm = tiny_nano_config(
        use_pdrop=True, pdrop_type="attn_3_0.5",
        merge_module="CrossAttention",
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-4"),
        vision=tiny_vit_config(),
        llm=llm,
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    # make the TransV gate non-trivial (alpha inits to 0 => tanh == 0)
    params["merge_modules"] = [
        dict(m, alpha=jnp.asarray(0.5)) if m else m
        for m in params["merge_modules"]]
    gen = Generator(params, arch, terminator_ids=[2], max_new_tokens=4,
                    cache_dtype=jnp.float32)

    img = 500
    prefix_ids = [5, img, img, 9]
    question = [10, 11, 12]
    pixels = np.asarray(jax.random.normal(
        jax.random.PRNGKey(1), (2, 28, 28, 3), jnp.float32))

    # path A: cached prefix + continuation
    state = gen.prefill_prefix(prefix_ids, pixels=pixels,
                               image_token_id=img, suffix_budget=64,
                               use_pdrop=True)
    assert state.cache.get("ca_kv") is not None
    # dropped rows are COMPACTED out of the cache (device-side length
    # shrinks below the host bucket), not masked — no kv_valid needed
    sb = max(arch.llm.chunk_size,
             -(-len(question) // arch.llm.chunk_size)
             * arch.llm.chunk_size)
    ids_arr = np.full((sb,), gen.pad_token_id, np.int32)
    ids_arr[: len(question)] = question
    cont = gen._get_continue(sb, state.cache_len)
    logits_a, _ = cont(gen.params, jnp.asarray(ids_arr), state.cache,
                       jnp.asarray(len(question), jnp.int32))

    # path B: one bucketed pdrop prefill of prefix+question, query pinned
    # to the last prefix token
    full_ids = prefix_ids + question
    plan = plan_fusion(full_ids, img, arch.tokens_per_frame)
    bucket = pick_bucket(plan.fused_len)
    pad = bucket - plan.fused_len
    gather_idx = np.concatenate(
        [np.zeros((pad,), np.int32), plan.gather_idx])
    seq_idx = np.concatenate(
        [np.full((pad,), -1, np.int32),
         np.zeros((plan.fused_len,), np.int32)])
    ids_np = np.where(np.asarray(full_ids) == img, gen.pad_token_id,
                      full_ids).astype(np.int32)
    from timeviper_tpu.models.generate import pad_text_to_bucket

    ids_np, gather_idx = pad_text_to_bucket(ids_np, gather_idx, bucket,
                                            gen.pad_token_id)
    vs, _, _ = plan.sample_layouts[0]
    visual = gen.encode_frames(pixels)
    prefill = gen._get_prefill_pdrop(bucket, bucket + 8, plan.num_visual)
    # last prefix token in bucket coords: pad + fused prefix length - 1
    prefix_fused = plan.fused_len - len(question)
    logits_b, _ = prefill(
        gen.params, jnp.asarray(ids_np), jnp.asarray(gather_idx),
        jnp.asarray(seq_idx), visual, pad,
        jnp.asarray(pad + vs, jnp.int32),
        jnp.asarray(pad + prefix_fused - 1, jnp.int32))

    _close(logits_a, logits_b, msg="pdrop prefix continuation vs full")


def test_serving_engine_prefix_requests():
    """ServingEngine: Requests carrying a shared PrefixState (multi-
    question serving) complete alongside regular requests, and every
    served token is teacher-forced-valid over prefix+suffix."""
    from timeviper_tpu.config import tiny_nano_config, tiny_vit_config
    from timeviper_tpu.serving import Request, ServingEngine
    from timeviper_tpu.models.vlm import VLMArch, init_vlm_params

    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=4, cache_dtype=jnp.float32, steps_per_sync=2,
    )
    prefix_ids = [5, 6, 7, 8, 9, 10, 11, 12]
    state = eng.prefill_prefix(prefix_ids, suffix_budget=64)
    questions = [[13, 14, 15], [16, 17], [18, 19, 20, 21]]
    reqs = [Request(request_id=i, input_ids=q, prefix=state,
                    max_new_tokens=4)
            for i, q in enumerate(questions)]
    # a regular (no-prefix) request interleaved in the same batch
    reqs.append(Request(request_id=99, input_ids=[30, 31, 32, 33],
                        max_new_tokens=4))
    out = eng.run(reqs)
    assert all(r.done and not r.error for r in out)
    assert all(len(r.output_ids) == 4 for r in out)

    from timeviper_tpu.models.nano import nano_forward as _nf

    full_prompts = [prefix_ids + q for q in questions] + [[30, 31, 32, 33]]
    for p, r in zip(full_prompts, out):
        seq = jnp.asarray([p + r.output_ids[:-1]])
        logits = np.asarray(
            _nf(params["llm_backbone"], arch.llm,
                input_ids=seq)["logits"][0])
        for t, tok in enumerate(r.output_ids):
            row = logits[len(p) - 1 + t]
            assert row[tok] >= row.max() - 5e-2, (
                t, tok, int(row.argmax()), float(row.max() - row[tok]))

    # capacity guards are per-request, not batch-fatal
    bad = Request(request_id=7, input_ids=[40] * 80, prefix=state,
                  max_new_tokens=4)  # suffix > suffix_budget
    out_bad = eng.run([bad])
    assert out_bad[0].error and "suffix" in out_bad[0].error


def test_generator_prefix_path_teacher_forced():
    """End-to-end Generator: prefill_prefix + generate(prefix=...) serves
    teacher-forced-valid tokens (margin check — see test_serving.py's
    module docstring for why not bitwise)."""
    from timeviper_tpu.models.generate import Generator
    from timeviper_tpu.models.vlm import VLMArch, init_vlm_params

    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=_cfg(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    gen = Generator(params, arch, terminator_ids=[2], max_new_tokens=4,
                    cache_dtype=jnp.float32)

    prefix_ids = [5, 6, 7, 8, 9, 10, 11, 12]
    suffix_ids = [13, 14, 15]
    state = gen.prefill_prefix(prefix_ids, suffix_budget=64)
    assert state.bucket >= len(prefix_ids)
    out = gen.generate(suffix_ids, prefix=state)
    assert out.num_generated >= 1

    # teacher-forced margin vs the plain full forward
    toks = [int(t) for t in out.token_ids]
    seq = jnp.asarray([prefix_ids + suffix_ids + toks[:-1]], jnp.int32)
    logits = np.asarray(
        nano_forward(params["llm_backbone"], arch.llm,
                     input_ids=seq)["logits"][0])
    start = len(prefix_ids) + len(suffix_ids) - 1
    for t, tok in enumerate(toks):
        row = logits[start + t]
        assert row[tok] >= row.max() - 5e-2, (
            t, tok, int(row.argmax()), float(row.max() - row[tok]))
