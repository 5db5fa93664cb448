"""Decode caches as fixed-shape pytrees.

TPU redesign of the reference's HybridMambaAttentionDynamicCache
(modeling_nano.py:205-268): HF grows KV tensors dynamically and probes
attention layers for "seq length" (generic_vlm.py:808-815). Under jit every
shape must be static, so the cache here is:

* per Mamba layer: `conv_state` (B, conv_dim, K) and `ssm_state`
  (B, H, P, N) float32 — O(1) in sequence length,
* per attention layer: `k`/`v` ring-less buffers of fixed capacity
  `max_len`, with the single scalar `length` tracking the write position,
* `length`: int32 scalar — number of tokens already processed.

The pytree structure is fixed per (config, batch, max_len), so prefill and
every decode step reuse one compiled executable.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def init_nano_cache(cfg, batch_size: int, max_len: int, dtype=jnp.bfloat16) -> Dict[str, Any]:
    layers = []
    H = cfg.mamba_num_heads
    P = cfg.mamba_head_dim
    N = cfg.ssm_state_size
    for block_type in cfg.layers_block_type:
        if block_type == "mamba":
            gn = cfg.mamba_n_groups * cfg.ssm_state_size
            d_inner = cfg.mamba_intermediate_size
            layers.append({
                "conv_state": {
                    "x": jnp.zeros((batch_size, d_inner, cfg.mamba_d_conv), dtype),
                    "B": jnp.zeros((batch_size, gn, cfg.mamba_d_conv), dtype),
                    "C": jnp.zeros((batch_size, gn, cfg.mamba_d_conv), dtype),
                },
                "ssm_state": jnp.zeros((batch_size, H, P, N), jnp.float32),
            })
        elif block_type == "attention":
            layers.append({
                "k": jnp.zeros(
                    (batch_size, max_len, cfg.num_key_value_heads, cfg.head_dim),
                    dtype,
                ),
                "v": jnp.zeros(
                    (batch_size, max_len, cfg.num_key_value_heads, cfg.head_dim),
                    dtype,
                ),
            })
        else:
            layers.append({})
    return {
        "layers": layers,
        "length": jnp.zeros((), jnp.int32),
        # first valid KV slot (> 0 when the prefill was left-padded to a
        # length bucket; pad slots must never be attended)
        "valid_from": jnp.zeros((), jnp.int32),
    }


def init_qwen2_cache(cfg, batch_size: int, max_len: int, dtype=jnp.bfloat16) -> Dict[str, Any]:
    layers = [
        {
            "k": jnp.zeros(
                (batch_size, max_len, cfg.num_key_value_heads, cfg.head_dim), dtype
            ),
            "v": jnp.zeros(
                (batch_size, max_len, cfg.num_key_value_heads, cfg.head_dim), dtype
            ),
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    return {
        "layers": layers,
        "length": jnp.zeros((), jnp.int32),
        "valid_from": jnp.zeros((), jnp.int32),
    }


def cache_max_len(cache) -> int:
    for layer in cache["layers"]:
        if "k" in layer:
            return layer["k"].shape[1]
    return 0
