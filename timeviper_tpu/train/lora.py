"""LoRA adapters for linear layers — functional pytree surgery.

Replaces the reference's peft wrap (train.py:364-383: find_all_linear_names
over the LLM, LoraConfig(r, alpha, dropout), plus the lora/non-lora state
split at save, train_utils.py:126-158). Here a LoRA "wrap" is data, not
classes: every targeted `{kernel}` leaf gains sibling `lora_a`/`lora_b`
factors, the forward adds `x @ a @ b * (alpha/r)` when they exist, and
training freezes everything except the factors via the same
`trainable_modules` masking used for module freezing (train/optim.py).

QLoRA: the factors plant next to int8-quantized leaves (`{kernel_q,
kernel_scale}` from train/quantize.py) too — the model applies
(`models/nano.py:_apply_linear`, `models/qwen2.py`) already add the LoRA
delta on top of either layout, and the weight-only dequant path is exact
and differentiable, so the FULL 9B backbone fine-tunes on one 16 GB chip
(int8 frozen base ≈ 9 GB + bf16 LoRA factors + remat activations). The
reference's LoRA (train.py:364-383) needs multi-GPU ZeRO for the same
model. jax.grad returns float0 for the int8 leaves; pair with
`lora_trainable_mask` + optax.masked as usual.
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = (
    # nano + qwen2 + projector linear kernels (find_all_linear_names analog)
    r".*(q_proj|k_proj|v_proj|o_proj|up_proj|down_proj|gate_proj)/kernel",
    r".*in_proj/(gate|x|B|C|dt)/kernel",
    r".*out_proj/kernel",
)


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", ""))) for k in path
    )


def add_lora(
    params: Any,
    rank: int = 8,
    alpha: float = 16.0,
    targets: Tuple[str, ...] = DEFAULT_TARGETS,
    key: Optional[jax.Array] = None,
    scope: str = "llm_backbone",
    dtype=None,
) -> Any:
    """Return params with lora_a/lora_b planted next to targeted kernels.

    a ~ N(0, 1/r) (kaiming-ish), b = 0 — so the wrapped model starts
    exactly equal to the base model (peft init semantics). Works on both
    full-precision `{kernel}` and int8 `{kernel_q, kernel_scale}` leaves
    (QLoRA); target patterns are written against the `/kernel` path
    either way. `dtype` sets the factor dtype (default: the kernel's
    dtype, or bfloat16 for int8 leaves).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    n = sum(1 for _ in flat)
    keys = iter(jax.random.split(key, n))

    def walk(node, prefix):
        if isinstance(node, dict):
            out = dict(node)
            for k, v in node.items():
                out[k] = walk(v, f"{prefix}/{k}" if prefix else str(k))
            # plant factors next to a matched kernel (kernel_q leaves
            # match the same `/kernel`-suffixed patterns)
            kern = node.get("kernel", node.get("kernel_q"))
            kp = f"{prefix}/kernel" if prefix else "kernel"
            if (
                kern is not None
                and (not scope or kp.startswith(scope) or scope in kp)
                and any(re.fullmatch(t, kp) for t in targets)
                and getattr(kern, "ndim", 0) == 2
            ):
                d_in, d_out = kern.shape
                fdtype = dtype or (
                    kern.dtype if "kernel" in node else jnp.bfloat16)
                k_ = next(keys)
                out["lora_a"] = (
                    jax.random.normal(k_, (d_in, rank)) / math.sqrt(rank)
                ).astype(fdtype)
                out["lora_b"] = jnp.zeros((rank, d_out), fdtype)
                out["lora_scale"] = jnp.asarray(alpha / rank, jnp.float32)
            return out
        if isinstance(node, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params, "")


def lora_linear(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """Linear apply with optional LoRA delta (used by model _apply_linear)."""
    y = jnp.einsum("...i,io->...o", x, p["kernel"].astype(x.dtype))
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    if "lora_a" in p:
        delta = jnp.einsum(
            "...i,ir,ro->...o", x,
            p["lora_a"].astype(x.dtype), p["lora_b"].astype(x.dtype),
        )
        y = y + delta * p["lora_scale"].astype(y.dtype)
    return y


def merge_lora(params: Any, requantize: bool = False) -> Any:
    """Fold lora factors into kernels (deploy-time merge).

    Quantized (QLoRA) leaves dequantize exactly and merge in f32; by
    default the merged leaf becomes a full-precision `{kernel}` (exact).
    `requantize=True` re-quantizes the merged kernel back to int8
    per-output-channel — keeps the int8 serving memory/path at the cost
    of one extra quantization rounding; a calibrated `act_inv` is kept
    (it scales the unchanged *input* activations).
    """

    def walk(node):
        if isinstance(node, dict):
            out = {k: walk(v) for k, v in node.items() if not k.startswith("lora_")}
            if "lora_a" in node:
                delta = (
                    node["lora_a"].astype(jnp.float32)
                    @ node["lora_b"].astype(jnp.float32)
                ) * node["lora_scale"]
                if "kernel" in node:
                    out["kernel"] = (
                        node["kernel"].astype(jnp.float32) + delta
                    ).astype(node["kernel"].dtype)
                else:  # int8 leaf: exact dequant + delta in f32
                    merged = (node["kernel_q"].astype(jnp.float32)
                              * node["kernel_scale"].astype(jnp.float32)
                              + delta)
                    if requantize:
                        from timeviper_tpu.train.quantize import (
                            _quantize_kernel,
                        )

                        q, scale = _quantize_kernel(merged)
                        out["kernel_q"], out["kernel_scale"] = q, scale
                    else:
                        out.pop("kernel_q", None)
                        out.pop("kernel_scale", None)
                        out.pop("act_inv", None)
                        out["kernel"] = merged.astype(node["lora_a"].dtype)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def split_lora_state(params: Any) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """{path: leaf} split into (lora, non_lora) — the reference's
    lora vs non_lora_trainables.bin artifact split (train_utils.py:126-158).
    """
    lora, non_lora = {}, {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        p = _path_str(path)
        (lora if "/lora_" in p or p.endswith("lora_scale") else non_lora)[p] = leaf
    return lora, non_lora


def trainable_lora_state(
    params: Any, trainable_modules: Optional[str] = None
) -> Dict[str, Any]:
    """Flat {path: leaf} of everything a LoRA fine-tune should update.

    The reference's LoRA recipe trains the peft factors PLUS any module
    named in `--trainable_modules` (train.py:384-398 — e.g. a fresh
    projector during VLM alignment); the extra modules are what
    non_lora_trainables.bin carries (train_utils.py:150-158). Here the
    trainable set = lora_a/lora_b factors + float leaves whose path
    matches a comma-separated trainable_modules substring. Non-float
    leaves (int8 kernel_q etc.) are never trainable; lora_scale is a
    constant (= alpha/r), not a factor.
    """
    subs = [
        s.strip()
        for s in (trainable_modules or "").split(",")
        if s.strip()
    ]
    out: Dict[str, Any] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        p = _path_str(path)
        if p.endswith("lora_scale"):
            continue
        if "/lora_" in p or p.startswith("lora_"):
            out[p] = leaf
        elif subs and any(s in p for s in subs) and jnp.issubdtype(
            getattr(leaf, "dtype", jnp.int32), jnp.floating
        ):
            out[p] = leaf
    return out


def graft_lora(params: Any, lora_flat: Dict[str, Any]) -> Any:
    """Replace leaves of `params` named by `lora_flat` ({path: leaf}, the
    split_lora_state layout). The partition/graft pair lets a train step
    differentiate w.r.t. the LoRA factors alone — mandatory for QLoRA
    (int8 base leaves are not differentiable) and keeps optimizer state
    factor-sized either way."""

    def walk(node, prefix):
        if isinstance(node, dict):
            return {
                k: walk(v, f"{prefix}/{k}" if prefix else str(k))
                for k, v in node.items()
            }
        if isinstance(node, list):
            return [walk(v, f"{prefix}/{i}") for i, v in enumerate(node)]
        return lora_flat.get(prefix, node)

    return walk(params, "")


def lora_trainable_mask(params: Any) -> Any:
    """True only for lora factors — pairs with optax.masked freezing."""

    def leaf(path, _):
        p = _path_str(path)
        return "lora_a" in p or "lora_b" in p

    return jax.tree_util.tree_map_with_path(leaf, params)
