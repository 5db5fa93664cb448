"""Vision→LLM projectors: MLP and ToMe-compressing MLP, plus multi-encoder
variants (reference: timeviper/model/projector/mlp.py, tome.py:86-231).

`tome_mlp-16`: each frame's patch tokens are ToMe-merged to 16 tokens, then
a 2-layer GELU MLP maps vision dim → LLM dim. `fused_tome_mlp` uses the
3-layer variant. Multi-encoder projectors hold one projector per backbone and
interleave (same token counts) or concatenate (different counts) outputs,
matching MultiToMe16_mlp_hd64 (tome.py:180-231) / MultiMLPProjector
(mlp.py:31-68).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from timeviper_tpu.ops.tome import tome_merge


def _linear(key, d_in, d_out, dtype):
    return {
        "kernel": (jax.random.normal(key, (d_in, d_out)) * 0.02).astype(dtype),
        "bias": jnp.zeros((d_out,), dtype),
    }


def _apply_linear(p, x):
    # shared apply: handles plain, int8-quantized (kernel_q), and LoRA
    # leaves — int8 serving quantizes the projector MLP too
    from timeviper_tpu.models.nano import _apply_linear as _shared

    return _shared(p, x)


def init_projector_params(
    key, vision_dim: int, llm_dim: int, projector_type: str = "tome_mlp",
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    if projector_type in ("tome_mlp", "gelu_mlp"):
        return {
            "fc1": _linear(ks[0], vision_dim, llm_dim, dtype),
            "fc2": _linear(ks[1], llm_dim, llm_dim, dtype),
        }
    if projector_type == "fused_tome_mlp":
        mid = vision_dim * 4
        return {
            "fc0": _linear(ks[0], vision_dim, mid, dtype),
            "fc1": _linear(ks[1], mid, llm_dim, dtype),
            "fc2": _linear(ks[2], llm_dim, llm_dim, dtype),
        }
    raise ValueError(f"Projector `{projector_type}` is not supported!")


def apply_mlp(params: Dict[str, Any], x: jax.Array) -> jax.Array:
    if "fc0" in params:
        x = jax.nn.gelu(_apply_linear(params["fc0"], x), approximate=False)
    x = jax.nn.gelu(_apply_linear(params["fc1"], x), approximate=False)
    return _apply_linear(params["fc2"], x)


def projector_forward(
    params: Dict[str, Any],
    patch_features: jax.Array,
    *,
    projector_type: str = "tome_mlp",
    num_compressed_tokens: int = 16,
    local_num_frames: int = 1,
    token_order: str = "raw",
    compress: bool = True,
) -> jax.Array:
    """patch_features: (frames, patches, vision_dim) ->
    (frames, tokens_out, llm_dim).

    For `local_num_frames > 1` (InternVideo2 clips), groups of frames are
    merged jointly to `num_compressed_tokens * local_num_frames` tokens then
    split back per frame (reference tome.py:154-177, generic_vlm.py:405-421).
    """
    if "tome" in projector_type and compress:
        F, P, C = patch_features.shape
        lnf = max(local_num_frames, 1)
        if lnf > 1:
            assert F % lnf == 0
            x = patch_features.reshape(F // lnf, lnf * P, C)
        else:
            x = patch_features
        x = tome_merge(x, num_compressed_tokens * lnf, token_order=token_order)
        x = apply_mlp(params, x)
        if lnf > 1:
            x = x.reshape(F, num_compressed_tokens, -1)
        return x
    return apply_mlp(params, patch_features)


def init_multi_projector_params(
    key, vision_dims: Dict[str, int], llm_dim: int,
    projector_type: str = "tome_mlp", dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    ks = jax.random.split(key, len(vision_dims))
    return {
        bid: init_projector_params(k, dim, llm_dim, projector_type, dtype)
        for k, (bid, dim) in zip(ks, vision_dims.items())
    }


def multi_projector_forward(
    params: Dict[str, Any],
    patch_features: Dict[str, jax.Array],
    *,
    projector_type: str = "tome_mlp",
    num_compressed_tokens: int = 16,
    local_num_frames: Dict[str, int] | int = 1,
    token_order: str = "raw",
) -> jax.Array:
    """Per-encoder projection then interleave/concat (tome.py:200-231)."""
    outputs: List[jax.Array] = []
    for bid, p in params.items():
        lnf = (
            local_num_frames.get(bid, 1)
            if isinstance(local_num_frames, dict)
            else local_num_frames
        )
        outputs.append(projector_forward(
            p, patch_features[bid], projector_type=projector_type,
            num_compressed_tokens=num_compressed_tokens,
            local_num_frames=lnf, token_order=token_order,
        ))
    if len(outputs) == 1:
        return outputs[0]
    if len(outputs) == 2 and outputs[0].shape != outputs[1].shape:
        if outputs[0].size == outputs[1].size:
            if outputs[0].shape[0] > outputs[1].shape[0]:
                outputs[1] = outputs[1].reshape(outputs[0].shape)
            else:
                outputs[0] = outputs[0].reshape(outputs[1].shape)
    if outputs[0].shape[1] != outputs[1].shape[1]:
        return jnp.concatenate(outputs, axis=1)
    return jnp.stack(outputs, axis=2).reshape(
        outputs[0].shape[0], -1, outputs[0].shape[-1]
    )
