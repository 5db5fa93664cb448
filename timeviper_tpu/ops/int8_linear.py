"""W8A8 linear for TPU serving: static activation scales + XLA int8 MXU.

Design, from v5e measurements at SigLIP MLP shapes (M=46k, 1152x4304,
chained round-trip bench, Aug 2026):

  bf16 einsum                 2.37 ms/mm   (92% of the 197 TF/s peak)
  int8, static act scale      1.76 ms/mm   1.35x  <- this module
  int8, dynamic row amax      2.40 ms/mm   0.99x
  int8, full Pallas kernel    4.32 ms/mm   0.55x

XLA's matmul emitter already runs the int8 MXU at speed; what kills the
naive W8A8 paths is the per-call activation amax: the row-wise max is a
cross-lane VPU reduction plus an extra HBM pass that XLA cannot fuse
into either neighbor (~0.6 ms — a third of the matmul itself). A Pallas
matmul that fuses the quant in-kernel pays instead in grid overhead and
loses to XLA's emitter outright. The TPU-shaped answer is the classic
serving one: calibrate per-tensor activation scales OFFLINE (one pass
over sample data), then the hot path is one fused multiply-round-clip
store + the int8 matmul + a fused dequant epilogue. No reduction, no
extra pass, nothing XLA can't fuse.

Quantized linear layout (train/quantize.py):
  kernel_q     int8 (in, out)   per-output-channel symmetric
  kernel_scale f32 (out,)
  act_inv      f32 scalar       127 / calibrated_amax   (optional)

`apply_linear_w8a8` uses the int8 MXU path only when act_inv is present;
otherwise it falls back to weight-only dequantization (exact per-channel,
no activation error — the right default for CPU tests and for layers
never calibrated).

The reference has no int8 path at all (it serves bf16 through vLLM,
vllm_infer.py); this exists to push the v5e vision encode past the
reference's A100 throughput.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_linear_w8a8", "w8a8_matmul_prequant", "ACT_AMAX_SINK"]

# When a list is installed here (see train/quantize.py calibrate_act_scales),
# apply_linear_w8a8 appends jnp.max(|x|) per call in trace order instead
# of quantizing — the calibration capture mechanism.
ACT_AMAX_SINK: list | None = None


def apply_linear_w8a8(p, x, use_int8_mxu: bool = True):
    """Linear apply for a quantized leaf {kernel_q, kernel_scale[, act_inv]}.

    use_int8_mxu gates the quantized-activation path (callers disable it
    off-TPU, where XLA's int8 matmul codegen is not the fast path).
    """
    global ACT_AMAX_SINK
    if ACT_AMAX_SINK is not None:
        ACT_AMAX_SINK.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
        use_int8_mxu = False
    if use_int8_mxu and "act_inv" in p:
        inv = p["act_inv"].astype(x.dtype)
        xq = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
        acc = jnp.einsum("...i,io->...o", xq, p["kernel_q"],
                         preferred_element_type=jnp.int32)
        scale = p["kernel_scale"] / p["act_inv"]  # (out,) f32, fused
        y = (acc.astype(jnp.float32) * scale).astype(x.dtype)
    else:
        w = p["kernel_q"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
        y = jnp.einsum("...i,io->...o", x, w)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    return y


def w8a8_matmul_prequant(p, xq, out_dtype=jnp.bfloat16):
    """int8-MXU matmul for an activation already quantized by the producer
    (ops/layernorm.py fuses clip(round(y * act_inv)) into the LayerNorm,
    skipping the bf16 materialization of the normalized activation)."""
    acc = jnp.einsum("...i,io->...o", xq, p["kernel_q"],
                     preferred_element_type=jnp.int32)
    scale = p["kernel_scale"] / p["act_inv"]  # (out,) f32, fused
    y = (acc.astype(jnp.float32) * scale).astype(out_dtype)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    return y
