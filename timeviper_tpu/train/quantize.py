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


def calibrate_act_scales(forward_fn, qparams, batches, margin: float = 1.05):
    """Attach static activation scales for the W8A8 int8-MXU serving path.

    Runs `forward_fn(qparams, batch)` for each batch with the
    ops.int8_linear amax-capture sink installed: every quantized linear
    that routes through `apply_linear_w8a8` records max|x| in trace order
    (one jit compile per batch shape; the captured maxes come back as a
    stacked device array). The per-linear maxima over all batches become
    `act_inv = 127 / (amax * margin)` on the corresponding leaves.

    Contract: forward_fn must consume quantized leaves in the params-tree
    insertion order (true for models/vit.py, whose layer list is walked
    sequentially). Leaves beyond the traced prefix — e.g. the final ViT
    block that the penultimate-feature forward never runs — stay
    uncalibrated and keep the exact weight-only dequant path.

    This is the classic TensorRT-style static calibration flow; rationale
    for static-over-dynamic on TPU is in ops/int8_linear.py.
    """
    import numpy as np

    from timeviper_tpu.ops import int8_linear

    def traced(qp, batch):
        sink: list = []
        int8_linear.ACT_AMAX_SINK = sink
        try:
            forward_fn(qp, batch)
        finally:
            int8_linear.ACT_AMAX_SINK = None
        if not sink:
            return jnp.zeros((0,), jnp.float32)
        return jnp.stack(sink)

    tfn = jax.jit(traced)
    amax = None
    for b in batches:
        cur = np.asarray(tfn(qparams, b), np.float32)
        amax = cur if amax is None else np.maximum(amax, cur)
    if amax is None or amax.size == 0:
        return qparams

    idx = 0

    def walk(node):
        nonlocal idx
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                out[k] = walk(v)
            if "kernel_q" in node and idx < len(amax):
                a = float(amax[idx])
                idx += 1
                if a > 0:
                    out["act_inv"] = jnp.asarray(
                        127.0 / (a * margin), jnp.float32)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(qparams)


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


def fuse_decode_in_proj(params: Any) -> Any:
    """Concatenate each Mamba layer's in_proj split leaves (gate/x/B/C/dt)
    into ONE matmul leaf, order matching `models/nano.mamba_in_proj`.

    The five projections share one input activation, so W8A8 activation
    scales fuse exactly (min of the per-leaf act_inv = max amax); the
    per-output-channel kernel scales concatenate. Cuts 4 kernel
    dispatches per Mamba layer off the decode step — the reference's
    checkpoint stores in_proj as one matrix anyway (modeling_nano.py:489).

    Single-chip serving optimization: TP sharding rules partition the
    SPLIT leaves, so apply this only to replicated serving params. Layers
    carrying LoRA deltas keep their split leaves.
    """
    import jax

    ORDER = ("gate", "x", "B", "C", "dt")

    def fuse(ip):
        leaves = [ip[k] for k in ORDER]
        if any("lora_a" in lf for lf in leaves):
            return ip
        if all("kernel_q" in lf for lf in leaves):
            fused = {
                "kernel_q": jnp.concatenate(
                    [lf["kernel_q"] for lf in leaves], axis=1),
                "kernel_scale": jnp.concatenate(
                    [lf["kernel_scale"] for lf in leaves]),
            }
            if all("act_inv" in lf for lf in leaves):
                fused["act_inv"] = jnp.min(jnp.stack(
                    [lf["act_inv"] for lf in leaves]))
        elif all("kernel" in lf for lf in leaves):
            fused = {"kernel": jnp.concatenate(
                [lf["kernel"] for lf in leaves], axis=1)}
        else:
            return ip  # mixed layouts: leave split
        if any(lf.get("bias") is not None for lf in leaves):
            def b_of(lf):
                b = lf.get("bias")
                return b if b is not None else jnp.zeros(
                    (lf[next(iter(lf))].shape[-1],),
                    leaves[0].get("bias").dtype)
            fused["bias"] = jnp.concatenate([b_of(lf) for lf in leaves])
        return {"fused": fused}

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k == "in_proj" and isinstance(v, dict)
                        and all(n in v for n in ORDER)):
                    out[k] = fuse(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)
