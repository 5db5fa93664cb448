"""Persistent XLA compilation cache.

First compiles of the 52-layer model take tens of seconds; the persistent
cache makes every subsequent process start warm. Safe to call before any
jax use; respects JAX_COMPILATION_CACHE_DIR when set.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/timeviper_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
