"""pdrop (PyramidDrop) + TransV: static-shape in-graph token dropping."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import (
    VLMConfig,
    parse_pdrop_type,
    tiny_nano_config,
    tiny_vit_config,
)
from timeviper_tpu.data.fusion import plan_fusion
from timeviper_tpu.models.nano import init_nano_params, nano_forward
from timeviper_tpu.models.pdrop import (
    apply_pdrop_stage,
    init_merge_modules,
    make_pdrop_spec,
)
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params, vlm_forward


def test_parse_pdrop_dsl():
    stages = parse_pdrop_type("uni_2_0.5-attn_3_0.25")
    assert stages[0].compress_type == "uni"
    assert stages[0].layer == 2 and stages[0].ratio == 0.5
    assert stages[1].compress_type == "attn" and stages[1].layer == 3


def test_uni_stage_keeps_evenly_spaced_tokens():
    # layout: 3 text prefix, 8 visual, 4 text suffix
    D = 16
    L = 3 + 8 + 4
    hidden = jnp.arange(L, dtype=jnp.float32)[None, :, None] * jnp.ones((1, L, D))
    spec = make_pdrop_spec([(3, 8, 4)], parse_pdrop_type("uni_0_0.5"))
    stage = spec_stage = parse_pdrop_type("uni_0_0.5")[0]
    new_hidden, _, _, new_spec = apply_pdrop_stage(
        hidden, None, None, spec, stage, 0, cfg=tiny_nano_config(),
        attn_params=None, merge_params=None,
    )
    # 8 * 0.5 = 4 kept; linspace(0,7,4) -> indices 0,2,4,7
    assert new_hidden.shape == (1, 3 + 4 + 4, D)
    kept = np.asarray(new_hidden[0, 3:7, 0])
    np.testing.assert_array_equal(kept, [3 + 0, 3 + 2, 3 + 4, 3 + 7])
    assert new_spec.samples[0].num_vision == 4


def test_nano_forward_with_pdrop_shrinks_and_runs():
    # ratios are CUMULATIVE vs the original count (modeling_nano.py:1795-1802:
    # keep = int(orig * ratios[cur+1])) — 0.5 then 0.25 gives 8 -> 4 -> 2
    cfg = tiny_nano_config(
        use_pdrop=True, pdrop_type="uni_1_0.5-attn_3_0.25",
        merge_module="CrossAttention",
    )
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    merge = init_merge_modules(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)

    B, D = 1, cfg.hidden_size
    # 2 text + 8 visual + 6 text
    embeds = jax.random.normal(jax.random.PRNGKey(2), (B, 16, D))
    labels = jnp.asarray([[-100] * 12 + [7, 8, 9, 2]])
    spec = make_pdrop_spec([(2, 8, 6)], cfg.pdrop_stages)
    out = nano_forward(
        params, cfg, inputs_embeds=embeds, labels=labels,
        pdrop_spec=spec, pdrop_params=merge,
    )
    # after uni_1_0.5: 8->4; after attn_3_0.5: ->2 (ratios vs ORIGINAL count)
    assert out["logits"].shape[1] == 2 + 2 + 6
    assert out["labels"].shape[1] == 2 + 2 + 6
    # answer labels survive dropping (they're in the text suffix)
    assert np.asarray(out["labels"])[0, -4:].tolist() == [7, 8, 9, 2]
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_vlm_forward_pdrop_end_to_end():
    llm = tiny_nano_config(
        use_pdrop=True, pdrop_type="uni_2_0.5",
        merge_module="CrossAttention",
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-4"),
        vision=tiny_vit_config(),
        llm=llm,
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    img = 500
    ids = [5, img, img, 9, 10, 11]
    plan = plan_fusion(ids, img, arch.tokens_per_frame)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    ids_arr = jnp.asarray(np.where(np.asarray(ids) == img, 0, ids), jnp.int32)
    out = vlm_forward(
        params, arch, input_ids=ids_arr, plan=plan, pixels=pixels,
        use_pdrop=True, pdrop_query_positions=(plan.fused_len - 1,),
    )
    # 8 visual tokens -> 4 kept; fused 1 + 8 + 4 -> 1 + 4 + 4
    assert out["logits"].shape[1] == plan.fused_len - 4
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_transv_merge_changes_suffix_only():
    cfg = tiny_nano_config(
        use_pdrop=True, pdrop_type="uni_0_0.5", merge_module="CrossAttention",
    )
    merge = init_merge_modules(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    # alpha starts at 0 -> tanh(0) = 0 -> merge must be a no-op at init
    D = cfg.hidden_size
    hidden = jax.random.normal(jax.random.PRNGKey(2), (1, 12, D))
    spec = make_pdrop_spec([(2, 8, 2)], cfg.pdrop_stages)
    stage = cfg.pdrop_stages[0]
    h_merge, _, _, _ = apply_pdrop_stage(
        hidden, None, None, spec, stage, 0, cfg=cfg, attn_params=None,
        merge_params=merge,
    )
    h_plain, _, _, _ = apply_pdrop_stage(
        hidden, None, None, spec, stage, 0, cfg=cfg, attn_params=None,
        merge_params=None,
    )
    np.testing.assert_allclose(
        np.asarray(h_merge), np.asarray(h_plain), atol=1e-6
    )
    # with nonzero alpha the suffix must change, prefix+kept must not
    merge2 = [dict(m, alpha=jnp.asarray(1.0)) if m else m for m in merge]
    h2, _, _, _ = apply_pdrop_stage(
        hidden, None, None, spec, stage, 0, cfg=cfg, attn_params=None,
        merge_params=merge2,
    )
    np.testing.assert_allclose(
        np.asarray(h2[0, :6]), np.asarray(h_plain[0, :6]), atol=1e-6
    )
    assert not np.allclose(np.asarray(h2[0, 6:]), np.asarray(h_plain[0, 6:]))


def test_generation_with_pdrop():
    """Bucketless pdrop prefill through the Generator (inference path)."""
    from timeviper_tpu.models.generate import Generator

    llm = tiny_nano_config(
        use_pdrop=True, pdrop_type="uni_2_0.5", merge_module="CrossAttention",
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-4"),
        vision=tiny_vit_config(),
        llm=llm,
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    gen = Generator(params, arch, terminator_ids=[-2], pad_token_id=0,
                    max_new_tokens=4, cache_dtype=jnp.float32)
    img = 500
    pixels = np.random.default_rng(0).random((2, 28, 28, 3)).astype(np.float32)
    out = gen.generate([5, img, img, 9, 10, 11], pixels=pixels,
                       image_token_id=img, use_pdrop=True)
    assert out.num_generated == 4
    # and the same prompt without pdrop still works (separate compile)
    out2 = gen.generate([5, img, img, 9, 10, 11], pixels=pixels,
                        image_token_id=img, use_pdrop=False)
    assert out2.num_generated == 4


def _attn_cfg(pdrop="attn_0_0.5"):
    return tiny_nano_config(
        use_pdrop=True, pdrop_type=pdrop, merge_module="CrossAttention",
    )


def test_dynamic_stage_matches_static_uni_and_attn():
    """Traced-layout (bucketed-prefill) stage == static-layout stage."""
    from timeviper_tpu.models.nano import init_attention_mixer
    from timeviper_tpu.models.pdrop import PdropSampleSpec, PdropSpec

    for ptype, alpha in [("uni_0_0.5", 0.7), ("attn_0_0.5", 0.0),
                         ("attn_0_0.25", 1.3)]:
        cfg = _attn_cfg(ptype)
        stage = cfg.pdrop_stages[0]
        attn_params = init_attention_mixer(
            jax.random.PRNGKey(3), cfg, jnp.float32)
        merge = init_merge_modules(jax.random.PRNGKey(1), cfg, jnp.float32)
        merge = [dict(m, alpha=jnp.asarray(alpha)) if m else m for m in merge]
        D = cfg.hidden_size
        L = 3 + 8 + 4
        hidden = jax.random.normal(jax.random.PRNGKey(2), (1, L, D))
        labels = jnp.asarray([[-100] * (L - 3) + [7, 8, 2]])
        seq = jnp.zeros((1, L), jnp.int32)

        spec_s = make_pdrop_spec([(3, 8, 4)], cfg.pdrop_stages,
                                 query_positions=[L - 1])
        h_s, l_s, s_s, sp_s = apply_pdrop_stage(
            hidden, labels, seq, spec_s, stage, 0, cfg=cfg,
            attn_params=attn_params, merge_params=merge,
        )

        spec_d = PdropSpec(
            samples=(PdropSampleSpec(
                vision_start=jnp.asarray(3, jnp.int32), num_vision=8,
                text_suffix=-1, query_pos=jnp.asarray(L - 1, jnp.int32)),),
            orig_num_vision=(8,), ratios=spec_s.ratios,
        )
        h_d, l_d, s_d, sp_d = apply_pdrop_stage(
            hidden, labels, seq, spec_d, stage, 0, cfg=cfg,
            attn_params=attn_params, merge_params=merge,
        )
        np.testing.assert_allclose(
            np.asarray(h_d), np.asarray(h_s), rtol=1e-5, atol=1e-6,
            err_msg=ptype)
        np.testing.assert_array_equal(np.asarray(l_d), np.asarray(l_s))
        np.testing.assert_array_equal(np.asarray(s_d), np.asarray(s_s))
        assert sp_d.samples[0].num_vision == sp_s.samples[0].num_vision


def test_bucketed_pdrop_prefill_pad_invariant():
    """Left-padding to a bucket must not change pdrop prefill logits."""
    from timeviper_tpu.data.fusion import FusionPlan

    llm = tiny_nano_config(
        use_pdrop=True, pdrop_type="uni_2_0.5", merge_module="CrossAttention",
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-4"),
        vision=tiny_vit_config(), llm=llm, llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    img = 500
    ids = [5, img, img, 9, 10, 11]
    plan = plan_fusion(ids, img, arch.tokens_per_frame)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    ids_arr = jnp.asarray(np.where(np.asarray(ids) == img, 0, ids), jnp.int32)

    out_exact = vlm_forward(
        params, arch, input_ids=ids_arr, plan=plan, pixels=pixels,
        use_pdrop=True,
        pdrop_vision_start=jnp.asarray(1, jnp.int32),
        pdrop_query_pos=jnp.asarray(plan.fused_len - 1, jnp.int32),
    )
    pad = 5
    g = np.concatenate([np.zeros((pad,), np.int32), plan.gather_idx])
    seq = np.concatenate([np.full((pad,), -1, np.int32),
                          np.zeros((plan.fused_len,), np.int32)])
    plan_p = FusionPlan(
        fused_len=plan.fused_len + pad, text_len=plan.text_len,
        num_visual=plan.num_visual, gather_idx=g, is_visual=None,
        seq_idx=seq, position_ids=None, sample_layouts=(),
    )
    out_pad = vlm_forward(
        params, arch, input_ids=ids_arr, plan=plan_p, pixels=pixels,
        use_pdrop=True,
        pdrop_vision_start=jnp.asarray(1 + pad, jnp.int32),
        pdrop_query_pos=jnp.asarray(plan.fused_len + pad - 1, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(out_exact["logits"][:, -1]),
        np.asarray(out_pad["logits"][:, -1]),
        rtol=1e-4, atol=1e-4,
    )


def test_pdrop_vmapped_batch_rows():
    """B>1 pdrop training (the reference's pdrop_no_pack batched case,
    modeling_nano.py:1779): vmapped rows == mean of per-row losses."""
    from timeviper_tpu.models.vlm import vlm_loss
    from timeviper_tpu.train.step import _make_loss_fn

    llm = tiny_nano_config(
        use_pdrop=True, pdrop_type="attn_3_0.5", merge_module="CrossAttention",
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-4"),
        vision=tiny_vit_config(), llm=llm, llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    img = 500
    ids = [5, img, img, 9, 10, 11, 12]
    plan = plan_fusion(ids, img, arch.tokens_per_frame)
    ids_arr = np.where(np.asarray(ids) == img, 0, ids).astype(np.int32)
    from timeviper_tpu.data.fusion import fuse_labels

    labels = fuse_labels(plan, [-100] * 4 + [10, 11, 12]).astype(np.int32)
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 2, 28, 28, 3)).astype(np.float32)

    batch = {
        "input_ids": jnp.asarray(np.stack([ids_arr, ids_arr])),
        "labels": jnp.asarray(np.stack([labels, labels])),
        "pixels": jnp.asarray(pixels),
    }
    loss_fn = _make_loss_fn(arch, plan, use_pdrop=True, remat=False)
    batch_loss, _ = loss_fn(params, batch)

    per = []
    for b in range(2):
        row = {k: v[b] for k, v in batch.items()}
        loss, _ = vlm_loss(params, arch, row, plan, remat=False,
                           use_pdrop=True)
        per.append(float(loss))
    np.testing.assert_allclose(float(batch_loss), np.mean(per),
                               rtol=1e-5, atol=1e-6)


def test_bucketed_pdrop_generation_shares_executable():
    """Two pdrop prompts with different lengths (same frame count) must
    reuse ONE compiled prefill (the round-1 path recompiled per length)."""
    from timeviper_tpu.models.generate import _EXECUTABLE_CACHE, Generator

    llm = tiny_nano_config(
        use_pdrop=True, pdrop_type="uni_2_0.5", merge_module="CrossAttention",
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-4"),
        vision=tiny_vit_config(), llm=llm, llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    gen = Generator(params, arch, terminator_ids=[-2], pad_token_id=0,
                    max_new_tokens=2, cache_dtype=jnp.float32)
    img = 500
    pixels = np.random.default_rng(0).random((2, 28, 28, 3)).astype(np.float32)
    before = {k for k in _EXECUTABLE_CACHE if k[0] == "prefill_pdrop"}
    out1 = gen.generate([5, img, img, 9, 10, 11], pixels=pixels,
                        image_token_id=img, use_pdrop=True)
    out2 = gen.generate([5, 6, 7, 8, img, img, 9, 10, 11, 12, 13],
                        pixels=pixels, image_token_id=img, use_pdrop=True)
    after = {k for k in _EXECUTABLE_CACHE if k[0] == "prefill_pdrop"}
    assert out1.num_generated == 2 and out2.num_generated == 2
    assert len(after - before) == 1, (after - before)


def test_transv_decode_ca_kv_cache():
    """Decode-time TransV (reference past_key_value_ca semantics): the
    prefill caches the dropped tokens' cross-attn K/V; each decode step
    re-merges against them at the stage layer."""
    from timeviper_tpu.models.nano import (
        init_nano_params,
        nano_decode_step,
        nano_forward,
    )
    from timeviper_tpu.models.pdrop import (
        _ca_kv,
        _merge_dropped,
        merge_dropped_cached,
    )

    cfg = tiny_nano_config(
        use_pdrop=True, pdrop_type="uni_1_0.5", merge_module="CrossAttention",
    )
    merge = init_merge_modules(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    merge = [dict(m, alpha=jnp.asarray(0.7)) if m else m for m in merge]
    D = cfg.hidden_size

    # function-level parity: cached-KV merge == direct merge on one token
    text = jax.random.normal(jax.random.PRNGKey(2), (1, D))
    dropped = jax.random.normal(jax.random.PRNGKey(3), (4, D))
    want = _merge_dropped(text, dropped, merge[0], cfg)
    kv = _ca_kv(dropped, merge[0], cfg)
    got = merge_dropped_cached(text[None], kv, merge[0], cfg)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # end-to-end: prefill with fill_cache exposes ca_kv; decode with the
    # merge params differs from decode without (the merge has effect)
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    spec = make_pdrop_spec([(2, 8, 6)], cfg.pdrop_stages)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (1, 16, D))
    out = nano_forward(
        params, cfg, inputs_embeds=embeds, pdrop_spec=spec,
        pdrop_params=merge, fill_cache=True, cache_max_len=32)
    assert "ca_kv" in out["cache"], "prefill must cache cross-attn KV"
    assert out["cache"]["ca_kv"][0]["k"].shape[0] == 4  # 8 - keep(4)

    tok = jnp.asarray([[3]], jnp.int32)
    logits_merge, c2 = nano_decode_step(
        params, cfg, tok, out["cache"], pdrop_params=merge)
    logits_plain, _ = nano_decode_step(params, cfg, tok, out["cache"])
    assert np.isfinite(np.asarray(logits_merge)).all()
    assert not np.allclose(np.asarray(logits_merge),
                           np.asarray(logits_plain))
    assert "ca_kv" in c2  # carried for subsequent steps


def test_transv_decode_ca_kv_qwen2():
    """The shared ca_kv machinery through the qwen2 family decode step."""
    from timeviper_tpu.config import tiny_qwen2_config
    from timeviper_tpu.models.pdrop import make_pdrop_spec as _spec
    from timeviper_tpu.models.qwen2 import (
        init_qwen2_params,
        qwen2_decode_step,
        qwen2_forward,
    )

    cfg = tiny_qwen2_config(
        use_pdrop=True, pdrop_type="uni_1_0.5", merge_module="CrossAttention",
    )
    merge = init_merge_modules(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    merge = [dict(m, alpha=jnp.asarray(0.5)) if m else m for m in merge]
    params = init_qwen2_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    spec = _spec([(2, 8, 6)], cfg.pdrop_stages)
    D = cfg.hidden_size
    embeds = jax.random.normal(jax.random.PRNGKey(4), (1, 16, D))
    out = qwen2_forward(
        params, cfg, inputs_embeds=embeds, pdrop_spec=spec,
        pdrop_params=merge, fill_cache=True, cache_max_len=32)
    assert "ca_kv" in out["cache"]

    tok = jnp.asarray([[3]], jnp.int32)
    lg_m, c2 = qwen2_decode_step(params, cfg, tok, out["cache"],
                                 pdrop_params=merge)
    lg_p, _ = qwen2_decode_step(params, cfg, tok, out["cache"])
    assert np.isfinite(np.asarray(lg_m)).all()
    assert not np.allclose(np.asarray(lg_m), np.asarray(lg_p))
    assert "ca_kv" in c2


def test_pdrop_decode_with_attention_before_stage():
    """Decode after a compacting pdrop prefill must match teacher forcing
    when an attention layer PRECEDES the drop stage (the 9B layout:
    attention at layer 8, pdrop at 14+). That layer's cache holds the
    pre-drop rows; decode must append/mask at the per-layer kv_len, not
    the post-drop global length (regression: it used to overwrite a live
    pre-drop KV row and mask the tail)."""
    from timeviper_tpu.models.nano import nano_decode_step
    from timeviper_tpu.models.pdrop import make_pdrop_spec

    cfg = tiny_nano_config(
        num_hidden_layers=6, hybrid_override_pattern="M-*M-*",
        use_pdrop=True, pdrop_type="uni_4_0.5")
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L0, NV, VS = 24, 8, 4
    emb = jax.random.normal(
        jax.random.PRNGKey(1), (1, L0, cfg.hidden_size), jnp.float32)

    def spec_for(ts):
        return make_pdrop_spec([(VS, NV, ts)], cfg.pdrop_stages, [L0 - 1])

    out = nano_forward(params, cfg, inputs_embeds=emb,
                       pdrop_spec=spec_for(L0 - VS - NV),
                       fill_cache=True, cache_max_len=40, logits_to_keep=1)
    cache = out["cache"]
    toks = [7, 11, 13]
    emb_all = emb
    for t, tok in enumerate(toks):
        tok_a = jnp.asarray([[tok]], jnp.int32)
        emb_all = jnp.concatenate(
            [emb_all, jnp.take(params["embeddings"], tok_a[0], axis=0)[None]],
            axis=1)
        full = nano_forward(params, cfg, inputs_embeds=emb_all,
                            pdrop_spec=spec_for(L0 - VS - NV + t + 1),
                            logits_to_keep=1)
        lg, cache = nano_decode_step(params, cfg, tok_a, cache)
        np.testing.assert_allclose(
            np.asarray(lg).reshape(-1),
            np.asarray(full["logits"][:, -1]).reshape(-1),
            rtol=2e-4, atol=2e-4, err_msg=f"step {t}")
