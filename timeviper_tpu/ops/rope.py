"""Rotary position embeddings (Qwen2 path; reference modeling_qwen2.py:338).

The nano backbone uses no RoPE (reference modeling_nano.py:1012-1114)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_frequencies(head_dim: int, theta: float) -> jax.Array:
    """inv_freq: (head_dim/2,) float32."""
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """positions: (B, L) int -> cos, sin each (B, L, head_dim/2) float32."""
    inv_freq = rope_frequencies(head_dim, theta)
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Neox-style rotate-half RoPE.

    x: (B, L, H, D); cos/sin: (B, L, D/2). Matches HF's
    ``apply_rotary_pos_emb`` (first half / second half split).
    """
    B, L, H, D = x.shape
    half = D // 2
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)
