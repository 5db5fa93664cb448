"""Golden parity: our InternVideo2 tower vs the LIVE reference torch code.

Runs the reference `PretrainVisionTransformer_clean` (vit_scale_clean.py:464)
on CPU at a tiny config — flash-attn stubbed out, naive attention path —
converts its state_dict with `convert_internvideo2`, and requires float32
feature parity. Covers the round-1 gaps (VERDICT missing #6): position-
embedding interpolation at a different resolution/frame count than the
checkpoint, and the AttentionPoolingBlock head.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

IV2_DIR = "/root/reference/timeviper/model/vit/internvideo2"


def _load_ref_module():
    """Import vit_scale_clean with its relative imports intact and
    flash-attn stubbed (the module hard-imports it; CUDA-only dep).

    The stubs are REMOVED from sys.modules afterwards: leaving a fake
    `flash_attn` visible flips transformers' attention-implementation
    detection for the reference qwen2 parity tests later in the session
    (observed as an order-dependent failure)."""
    inserted = []
    for name in ["flash_attn", "flash_attn.bert_padding",
                 "flash_attn.flash_attn_interface"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            inserted.append(name)
    sys.modules["flash_attn.bert_padding"].pad_input = None
    sys.modules["flash_attn.bert_padding"].unpad_input = None
    sys.modules["flash_attn.flash_attn_interface"] \
        .flash_attn_varlen_qkvpacked_func = None

    # timm isn't in this image; the module only needs three small helpers
    if "timm.models.layers" not in sys.modules:
        import collections.abc
        import itertools

        import torch.nn as nn

        class DropPath(nn.Module):  # drop_path_rate is 0 in these tests
            def __init__(self, drop_prob=0.0):
                super().__init__()

            def forward(self, x):
                return x

        def to_2tuple(x):
            if isinstance(x, collections.abc.Iterable) \
                    and not isinstance(x, str):
                return tuple(x)
            return tuple(itertools.repeat(x, 2))

        for name in ["timm", "timm.models"]:
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
                inserted.append(name)
        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = DropPath
        layers.to_2tuple = to_2tuple
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        sys.modules["timm.models.layers"] = layers
        inserted.append("timm.models.layers")

    import importlib

    try:
        if "refiv2" not in sys.modules:
            pkg = types.ModuleType("refiv2")
            pkg.__path__ = [IV2_DIR]
            sys.modules["refiv2"] = pkg
        return importlib.import_module("refiv2.vit_scale_clean")
    finally:
        # the imported module holds its own references; scrub the stubs so
        # the rest of the session sees the real (absent) modules
        for name in inserted:
            sys.modules.pop(name, None)


def _tiny_ref_model(vsc, img_size=28, num_frames=4, depth=4,
                    x_vis_return_idx=-2, x_vis_only=True):
    torch.manual_seed(0)
    model = vsc.PretrainVisionTransformer_clean(
        in_chans=3, patch_size=14, img_size=img_size,
        qkv_bias=False, drop_path_rate=0.0,
        embed_dim=64, num_heads=4, mlp_ratio=2.0,
        init_values=0.1, qk_normalization=True, depth=depth,
        use_flash_attn=False, use_fused_rmsnorm=False, use_fused_mlp=False,
        attn_pool_num_heads=4, clip_embed_dim=32,
        num_frames=num_frames, tubelet_size=1,
        x_vis_return_idx=x_vis_return_idx, x_vis_only=x_vis_only,
    )
    # randomize weights that init to zeros/constants so parity is meaningful
    with torch.no_grad():
        for n, p in model.named_parameters():
            if p.ndim >= 2 and ("weight" in n or n.endswith("cls_token")):
                p.normal_(0.0, 0.02)
            elif "bias" in n:
                p.normal_(0.0, 0.01)
        model.cls_token.normal_(0.0, 0.02)
    return model.eval().float()


def _our_cfg(**kw):
    from timeviper_tpu.config import InternVideo2Config

    base = dict(image_size=28, patch_size=14, tubelet_size=1, num_frames=4,
                hidden_size=64, intermediate_size=128, num_hidden_layers=4,
                num_attention_heads=4, qkv_bias=False, x_vis_return_idx=-2,
                clip_embed_dim=32, attn_pool_num_heads=4, pretrain_t_size=4)
    base.update(kw)
    return InternVideo2Config(**base)


def test_iv2_feature_parity_same_operating_point():
    from timeviper_tpu.models.internvideo2 import internvideo2_forward
    from timeviper_tpu.train.convert import convert_internvideo2

    vsc = _load_ref_module()
    model = _tiny_ref_model(vsc)
    cfg = _our_cfg()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_internvideo2(sd, cfg),
        is_leaf=lambda x: x is None)

    rng = np.random.default_rng(0)
    clip = rng.standard_normal((2, 4, 28, 28, 3)).astype(np.float32)
    # reference eats (B, C, T, H, W)
    with torch.no_grad():
        want = model(torch.from_numpy(clip).permute(0, 4, 1, 2, 3))
    want = want.numpy()[:, 1:]  # reference returns CLS+patches; VLM drops CLS
    got = np.asarray(internvideo2_forward(params, cfg, jnp.asarray(clip)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_iv2_parity_interpolated_resolution_and_frames():
    """Checkpoint at 4 frames / 28px loaded at 8 frames / 42px: the
    converter must interpolate the position table the way the reference
    does at load (pos_embed.py:125-203)."""
    from timeviper_tpu.models.internvideo2 import internvideo2_forward
    from timeviper_tpu.train.convert import convert_internvideo2

    vsc = _load_ref_module()
    model = _tiny_ref_model(vsc)  # pretrained operating point: 4f / 28px
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    # build the reference model AT the new operating point and load the
    # checkpoint through the reference's own interpolation
    target = _tiny_ref_model(vsc, img_size=42, num_frames=8)
    ckpt = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    from importlib import import_module

    ref_pos = import_module("refiv2.pos_embed")
    ref_pos.interpolate_pos_embed_internvideo2(ckpt, target, orig_t_size=4)
    target.load_state_dict(ckpt)
    target = target.eval().float()

    cfg = _our_cfg(image_size=42, num_frames=8, pretrain_t_size=4)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_internvideo2(sd, cfg),
        is_leaf=lambda x: x is None)

    rng = np.random.default_rng(1)
    clip = rng.standard_normal((1, 8, 42, 42, 3)).astype(np.float32)
    with torch.no_grad():
        want = target(torch.from_numpy(clip).permute(0, 4, 1, 2, 3))
    want = want.numpy()[:, 1:]
    got = np.asarray(internvideo2_forward(params, cfg, jnp.asarray(clip)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_iv2_attention_pooling_parity():
    from timeviper_tpu.models.internvideo2 import (
        attention_pool,
        internvideo2_forward,
    )
    from timeviper_tpu.train.convert import convert_internvideo2

    vsc = _load_ref_module()
    model = _tiny_ref_model(vsc, x_vis_only=False)
    cfg = _our_cfg()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_internvideo2(sd, cfg),
        is_leaf=lambda x: x is None)
    assert "attn_pool" in params

    rng = np.random.default_rng(2)
    clip = rng.standard_normal((2, 4, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        x_vis, x_pool, _, _ = model(
            torch.from_numpy(clip).permute(0, 4, 1, 2, 3))
    feats = internvideo2_forward(params, cfg, jnp.asarray(clip),
                                 keep_cls=True)
    got_pool = np.asarray(attention_pool(params["attn_pool"], cfg, feats))
    np.testing.assert_allclose(got_pool, x_pool.numpy(),
                               rtol=2e-4, atol=2e-4)
