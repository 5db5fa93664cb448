"""Vision tower dispatch: single / multi / InternVideo2 paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import (
    InternVideo2Config,
    VLMConfig,
    tiny_nano_config,
    tiny_vit_config,
)
from timeviper_tpu.models.internvideo2 import (
    encode_frames_iv2,
    init_internvideo2_params,
)
from timeviper_tpu.models.vlm import VLMArch, encode_visual, init_vlm_params


def tiny_iv2_config():
    return InternVideo2Config(
        image_size=28, patch_size=14, num_frames=2, hidden_size=32,
        intermediate_size=64, num_hidden_layers=3, num_attention_heads=2,
        x_vis_return_idx=-2,
    )


def test_internvideo2_shapes():
    cfg = tiny_iv2_config()
    assert cfg.effective_depth == 2
    params = init_internvideo2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    frames = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 3))
    out = encode_frames_iv2(params, cfg, frames)
    # 4 frames -> 2 clips of 2 frames; each clip: 2 * (28/14)^2 = 8 tokens
    assert out.shape == (2, 8, 32)


def test_internvideo2_w8a8_close_to_fp(monkeypatch):
    """The IV2 tower runs through the same int8 dispatch as the timm ViT:
    quantize + calibrate + int8-MXU forward stays within quantization
    noise of the fp forward."""
    import numpy as np

    from timeviper_tpu.train.quantize import (
        calibrate_act_scales, quantize_params_int8)

    cfg = tiny_iv2_config()
    params = init_internvideo2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    frames = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 3))
    want = np.asarray(encode_frames_iv2(params, cfg, frames), np.float32)

    qparams = quantize_params_int8(params, min_size=1)
    qparams = calibrate_act_scales(
        lambda p, f: encode_frames_iv2(p, cfg, f), qparams, [frames])
    monkeypatch.setenv("TIMEVIPER_VIT_INT8_MXU", "1")
    got = np.asarray(encode_frames_iv2(qparams, cfg, frames), np.float32)
    rms = np.sqrt(((got - want) ** 2).mean()) / (np.sqrt(
        (want ** 2).mean()) + 1e-9)
    assert rms < 5e-2, rms


def test_multi_tower_interleave():
    towers = (
        ("tiny-a", "siglip", tiny_vit_config()),
        ("tiny-b", "dinov2", tiny_vit_config(
            use_class_token=True, num_register_tokens=1, use_layer_scale=True,
            hidden_act="gelu")),
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=towers[0][2],
        llm=tiny_nano_config(),
        llm_family="nano",
        vision_family="multi",
        vision_backbones=towers,
    )
    assert arch.tokens_per_frame == 4  # 2 compressed x 2 towers
    params = init_vlm_params(jax.random.PRNGKey(0), arch, jnp.float32)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28, 3))
    out = encode_visual(params, arch, pixels)
    assert out.shape == (3, 4, arch.llm.hidden_size)
    assert np.isfinite(np.asarray(out)).all()


def test_iv2_vlm_encode_with_clip_tome():
    cfg = tiny_iv2_config()
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=cfg,
        llm=tiny_nano_config(),
        llm_family="nano",
        vision_family="internvideo2",
    )
    assert arch.local_num_frames == 2
    params = init_vlm_params(jax.random.PRNGKey(0), arch, jnp.float32)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (4, 28, 28, 3))
    out = encode_visual(params, arch, pixels)
    # clip-joint ToMe: 2 tokens per frame after the per-clip merge
    assert out.shape == (4, 2, arch.llm.hidden_size)


def test_multi_tower_generation_end_to_end():
    from timeviper_tpu.models.generate import Generator

    towers = (
        ("tiny-a", "siglip", tiny_vit_config()),
        ("tiny-b", "dinov2", tiny_vit_config(
            use_class_token=True, num_register_tokens=1, use_layer_scale=True,
            hidden_act="gelu")),
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=towers[0][2],
        llm=tiny_nano_config(),
        llm_family="nano",
        vision_family="multi",
        vision_backbones=towers,
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, jnp.float32)
    gen = Generator(params, arch, terminator_ids=[-2], pad_token_id=0,
                    max_new_tokens=4, cache_dtype=jnp.float32)
    img = 500
    pixels = np.random.default_rng(0).random((2, 28, 28, 3)).astype(np.float32)
    out = gen.generate([5, img, img, 9], pixels=pixels, image_token_id=img)
    assert out.num_generated == 4


def test_iv2_generation_end_to_end():
    from timeviper_tpu.models.generate import Generator

    cfg = tiny_iv2_config()
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=cfg,
        llm=tiny_nano_config(),
        llm_family="nano",
        vision_family="internvideo2",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, jnp.float32)
    gen = Generator(params, arch, terminator_ids=[-2], pad_token_id=0,
                    max_new_tokens=3, cache_dtype=jnp.float32)
    img = 500
    # 4 frames = 2 clips of num_frames=2
    pixels = np.random.default_rng(1).random((4, 28, 28, 3)).astype(np.float32)
    out = gen.generate([5] + [img] * 4 + [9], pixels=pixels,
                       image_token_id=img)
    assert out.num_generated == 3
