"""Persistent XLA compilation cache.

First compiles of the 52-layer model take tens of seconds; the persistent
cache makes every subsequent process start warm. Safe to call before any
jax use; respects JAX_COMPILATION_CACHE_DIR when set.
"""

from __future__ import annotations

import hashlib
import os


def _machine_key() -> str:
    """Key the cache by CPU model + feature set + jaxlib version: AOT
    entries from a different microarch (or a different XLA, which also
    bakes tuning prefs like +prefer-no-gather into the target) load with
    mismatched instruction selection — numerically divergent, SIGILL-prone.
    The `flags` line alone proved insufficient (same flags, different
    model → different XLA target prefs)."""
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    parts.append(line.strip())
                    if len(parts) == 2:
                        break
    except OSError:
        import platform

        parts.append(platform.processor())
    try:
        import jaxlib

        parts.append(jaxlib.__version__)
    except Exception:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    explicit = path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if explicit is None and jax.default_backend() == "cpu":
        # Never persist CPU AOT executables: they bake host microarch
        # target features (+prefer-no-gather, +amx-*) into the codegen and
        # reload on a host without them — XLA's cpu_aot_loader warns of
        # SIGILL risk, results become machine-dependent, and the ~250 KB
        # of warnings slowed the driver's timed dryrun (round-2 artifact).
        # _machine_key() provably under-keys this (two keyed dirs, still
        # mismatched); CPU compiles here are small — cold is fine.
        return
    cache_dir = explicit or os.path.expanduser(
        f"~/.cache/timeviper_tpu/xla_{_machine_key()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
