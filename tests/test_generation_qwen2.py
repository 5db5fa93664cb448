"""Generator with the Qwen2 family + flash fallback gating."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import VLMConfig, tiny_qwen2_config, tiny_vit_config
from timeviper_tpu.models.generate import Generator
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params


def _arch():
    return VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2",
                      llm_backbone_id="qwen2.5-7b-instruct"),
        vision=tiny_vit_config(),
        llm=tiny_qwen2_config(),
        llm_family="qwen2",
    )


def test_qwen2_generation_text_and_video():
    arch = _arch()
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    gen = Generator(params, arch, terminator_ids=[-2], pad_token_id=0,
                    max_new_tokens=5, cache_dtype=jnp.float32)
    out = gen.generate([5, 6, 7, 8])
    assert out.num_generated == 5
    img = 500
    pixels = np.random.default_rng(0).random((2, 28, 28, 3)).astype(np.float32)
    out2 = gen.generate([5, img, img, 9], pixels=pixels, image_token_id=img)
    assert out2.num_generated == 5
    # determinism for greedy decoding
    out3 = gen.generate([5, img, img, 9], pixels=pixels, image_token_id=img)
    assert out2.token_ids.tolist() == out3.token_ids.tolist()


def test_flash_attention_cpu_fallback_matches_dense():
    from timeviper_tpu.ops.attention import attention, make_attention_mask
    from timeviper_tpu.ops.flash_pallas import flash_attention

    B, L, Hq, Hkv, D = 1, 32, 4, 2, 16
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k[0], (B, L, Hq, D))
    kk = jax.random.normal(k[1], (B, L, Hkv, D))
    v = jax.random.normal(k[2], (B, L, Hkv, D))
    seg = jnp.concatenate(
        [jnp.zeros((B, 10), jnp.int32), jnp.ones((B, 22), jnp.int32)], axis=1)
    # on CPU the kernel path is gated off; the wrapper must equal dense
    out = flash_attention(q, kk, v, segment_ids=seg, causal=True)
    mask = make_attention_mask(L, L, causal=True, q_segment_ids=seg,
                               kv_segment_ids=seg)
    ref = attention(q, kk, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
