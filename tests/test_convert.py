"""Checkpoint converters: layout fidelity against torch-style state dicts."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.nano import init_nano_params, nano_forward
from timeviper_tpu.train.convert import convert_internvideo2, convert_nano


def test_nano_converter_split_in_proj_round_trip():
    """Fused torch in_proj [gate|x|B|C|dt] must split into the role kernels
    such that the forward equals a natively-initialized model with the same
    underlying weights."""
    cfg = tiny_nano_config()
    native = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

    # build a torch-layout state dict FROM the native params
    sd = {"backbone.embedding.weight": np.asarray(native["embeddings"])}
    for i, bt in enumerate(cfg.layers_block_type):
        pre = f"backbone.layers.{i}"
        sd[f"{pre}.norm.weight"] = np.asarray(
            native["layers"][i]["norm"]["weight"])
        m = native["layers"][i]["mixer"]
        mp = f"{pre}.mixer"
        if bt == "mamba":
            fused = np.concatenate([
                np.asarray(m["in_proj"][k]["kernel"]).T
                for k in ("gate", "x", "B", "C", "dt")
            ], axis=0)
            sd[f"{mp}.in_proj.weight"] = fused
            conv = np.concatenate([
                np.asarray(m["conv1d"][k]["weight"]) for k in ("x", "B", "C")
            ], axis=0)
            sd[f"{mp}.conv1d.weight"] = conv.reshape(
                conv.shape[0], 1, conv.shape[1])
            sd[f"{mp}.conv1d.bias"] = np.concatenate([
                np.asarray(m["conv1d"][k]["bias"]) for k in ("x", "B", "C")])
            sd[f"{mp}.dt_bias"] = np.asarray(m["dt_bias"])
            sd[f"{mp}.A_log"] = np.asarray(m["A_log"])
            sd[f"{mp}.D"] = np.asarray(m["D"])
            sd[f"{mp}.norm.weight"] = np.asarray(m["norm"]["weight"])
            sd[f"{mp}.out_proj.weight"] = np.asarray(m["out_proj"]["kernel"]).T
        elif bt == "attention":
            for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
                sd[f"{mp}.{k}.weight"] = np.asarray(m[k]["kernel"]).T
        else:
            for k in ("up_proj", "down_proj"):
                sd[f"{mp}.{k}.weight"] = np.asarray(m[k]["kernel"]).T
    sd["backbone.norm_f.weight"] = np.asarray(native["norm_f"]["weight"])
    sd["lm_head.weight"] = np.asarray(native["lm_head"]["kernel"]).T

    converted = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, cfg.vocab_size)
    out_native = nano_forward(native, cfg, input_ids=ids)["logits"]
    out_conv = nano_forward(converted, cfg, input_ids=ids)["logits"]
    np.testing.assert_allclose(np.asarray(out_native), np.asarray(out_conv),
                               rtol=1e-5, atol=1e-5)


def test_internvideo2_converter_layout():
    from tests.test_vision_towers import tiny_iv2_config
    from timeviper_tpu.models.internvideo2 import (
        encode_frames_iv2,
        init_internvideo2_params,
    )

    cfg = tiny_iv2_config()
    rng = np.random.default_rng(0)
    d = cfg.hidden_size
    ps, tb = cfg.patch_size, cfg.tubelet_size
    sd = {
        "patch_embed.proj.weight": rng.standard_normal(
            (d, 3, tb, ps, ps)).astype(np.float32) * 0.02,
        "patch_embed.proj.bias": np.zeros((d,), np.float32),
        "cls_token": np.zeros((1, 1, d), np.float32),
        "pos_embed": rng.standard_normal(
            (1, (cfg.num_frames // tb) * cfg.grid_size ** 2 + 1, d)
        ).astype(np.float32) * 0.02,
    }
    for i in range(cfg.effective_depth):
        pre = f"blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.ones((d,), np.float32)
        sd[f"{pre}.norm2.weight"] = np.ones((d,), np.float32)
        sd[f"{pre}.attn.qkv.weight"] = rng.standard_normal(
            (3 * d, d)).astype(np.float32) * 0.02
        sd[f"{pre}.attn.q_norm.weight"] = np.ones((d,), np.float32)
        sd[f"{pre}.attn.k_norm.weight"] = np.ones((d,), np.float32)
        sd[f"{pre}.attn.proj.weight"] = rng.standard_normal(
            (d, d)).astype(np.float32) * 0.02
        sd[f"{pre}.attn.proj.bias"] = np.zeros((d,), np.float32)
        sd[f"{pre}.ls1.gamma"] = np.full((d,), 1e-5, np.float32)
        sd[f"{pre}.ls2.gamma"] = np.full((d,), 1e-5, np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = rng.standard_normal(
            (cfg.intermediate_size, d)).astype(np.float32) * 0.02
        sd[f"{pre}.mlp.fc1.bias"] = np.zeros((cfg.intermediate_size,), np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = rng.standard_normal(
            (d, cfg.intermediate_size)).astype(np.float32) * 0.02
        sd[f"{pre}.mlp.fc2.bias"] = np.zeros((d,), np.float32)

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_internvideo2(sd, cfg))
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 3))
    out = encode_frames_iv2(params, cfg, frames)
    assert out.shape == (1, 2 * cfg.grid_size ** 2, d)
    assert np.isfinite(np.asarray(out)).all()

    # conv3d layout check: a single tubelet through the kernel must equal
    # torch's conv3d contraction order
    clip = np.asarray(frames).reshape(1, 2, 28, 28, 3)
    patch = clip[0, :tb, :ps, :ps, :]  # (tb, ps, ps, 3)
    w = sd["patch_embed.proj.weight"]  # (d, 3, tb, ps, ps)
    expected0 = np.einsum("tpqc,dctpq->d", patch, w)
    got = np.asarray(params["patch_embed"]["kernel"]).T @ patch.reshape(-1)
    np.testing.assert_allclose(got, expected0, rtol=1e-4, atol=1e-5)
