"""Qwen2 backbone: decode parity, packing isolation, converter round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_qwen2_config
from timeviper_tpu.models.cache import init_qwen2_cache
from timeviper_tpu.models.qwen2 import (
    init_qwen2_params,
    qwen2_decode_step,
    qwen2_forward,
)

CFG = tiny_qwen2_config()


def test_decode_matches_full_forward():
    params = init_qwen2_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 19), 0, CFG.vocab_size)
    full = qwen2_forward(params, CFG, input_ids=ids)
    out = qwen2_forward(params, CFG, input_ids=ids[:, :15],
                        fill_cache=True, cache_max_len=32)
    cache = out["cache"]
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(full["logits"][:, :15]),
        rtol=2e-3, atol=2e-3)
    for t in range(15, 19):
        logits_t, cache = qwen2_decode_step(params, CFG, ids[:, t:t + 1], cache)
        np.testing.assert_allclose(
            np.asarray(logits_t), np.asarray(full["logits"][:, t]),
            rtol=3e-3, atol=3e-3)


def test_packed_segments_isolated():
    params = init_qwen2_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    a = jax.random.randint(jax.random.PRNGKey(2), (1, 7), 0, CFG.vocab_size)
    b = jax.random.randint(jax.random.PRNGKey(3), (1, 9), 0, CFG.vocab_size)
    packed = jnp.concatenate([a, b], axis=1)
    seq_idx = jnp.concatenate(
        [jnp.zeros((1, 7), jnp.int32), jnp.ones((1, 9), jnp.int32)], axis=1)
    out_p = qwen2_forward(params, CFG, input_ids=packed, seq_idx=seq_idx)
    out_a = qwen2_forward(params, CFG, input_ids=a)
    out_b = qwen2_forward(params, CFG, input_ids=b)
    np.testing.assert_allclose(np.asarray(out_p["logits"][:, :7]),
                               np.asarray(out_a["logits"]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_p["logits"][:, 7:]),
                               np.asarray(out_b["logits"]),
                               rtol=2e-3, atol=2e-3)


def test_converter_round_trip():
    """Synthetic torch-layout state dict -> pytree -> same forward as a
    directly-constructed pytree."""
    import numpy as np

    from timeviper_tpu.train.convert import convert_qwen2

    rng = np.random.default_rng(0)
    d, inter, hd = CFG.hidden_size, CFG.intermediate_size, CFG.head_dim
    Hq, Hkv = CFG.num_attention_heads, CFG.num_key_value_heads
    sd = {"model.embed_tokens.weight": rng.standard_normal(
        (CFG.vocab_size, d)).astype(np.float32)}
    for i in range(CFG.num_hidden_layers):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.ones((d,), np.float32)
        sd[f"{p}.post_attention_layernorm.weight"] = np.ones((d,), np.float32)
        for name, shape in (
            ("self_attn.q_proj", (Hq * hd, d)),
            ("self_attn.k_proj", (Hkv * hd, d)),
            ("self_attn.v_proj", (Hkv * hd, d)),
            ("self_attn.o_proj", (d, Hq * hd)),
            ("mlp.gate_proj", (inter, d)),
            ("mlp.up_proj", (inter, d)),
            ("mlp.down_proj", (d, inter)),
        ):
            sd[f"{p}.{name}.weight"] = (
                rng.standard_normal(shape).astype(np.float32) * 0.02)
        for name, n in (("self_attn.q_proj", Hq * hd),
                        ("self_attn.k_proj", Hkv * hd),
                        ("self_attn.v_proj", Hkv * hd)):
            sd[f"{p}.{name}.bias"] = np.zeros((n,), np.float32)
    sd["model.norm.weight"] = np.ones((d,), np.float32)
    sd["lm_head.weight"] = rng.standard_normal(
        (CFG.vocab_size, d)).astype(np.float32) * 0.02

    params = convert_qwen2(sd, CFG)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, CFG.vocab_size)
    out = qwen2_forward(params, CFG, input_ids=ids)
    assert out["logits"].shape == (1, 8, CFG.vocab_size)
    # kernel transpose correctness: manual embed @ q_proj^T must equal pytree
    q_kernel = params["layers"][0]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(q_kernel),
        sd["model.layers.0.self_attn.q_proj.weight"].T,
    )
