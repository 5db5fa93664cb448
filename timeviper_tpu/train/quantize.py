"""Weight-only int8 quantization for serving.

Production feature with no reference equivalent (the reference serves bf16
through vLLM): per-output-channel symmetric int8 on every 2-D linear kernel.
Halves weight HBM — the full 52-layer 9B fits a single 16 GB v5e chip — and
speeds up bandwidth-bound decode. Activations stay bf16; kernels dequantize
at use (XLA fuses the scale multiply into the matmul consumer).

Quantized leaves replace {"kernel"} with {"kernel_q": int8 (in, out),
"kernel_scale": f32 (out,)}; `_apply_linear` in the model cores understands
both layouts. Embeddings and norms stay full precision.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _quantize_kernel(kernel: jax.Array):
    kf = kernel.astype(jnp.float32)
    amax = jnp.max(jnp.abs(kf), axis=0)  # per output channel
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_params_int8(params: Any, min_size: int = 1 << 16) -> Any:
    """Quantize every 2-D `kernel` leaf with >= min_size elements."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (
                    k == "kernel"
                    and getattr(v, "ndim", 0) == 2
                    and v.size >= min_size
                ):
                    q, s = _quantize_kernel(v)
                    out["kernel_q"] = q
                    out["kernel_scale"] = s
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def apply_linear_maybe_quantized(p, x, einsum_str: str = "...i,io->...o"):
    """Linear apply understanding both bf16 and int8 kernel layouts."""
    if "kernel_q" in p:
        w = p["kernel_q"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
        y = jnp.einsum(einsum_str, x, w)
    else:
        y = jnp.einsum(einsum_str, x, p["kernel"].astype(x.dtype))
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    return y
