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
