"""Persistent XLA compilation cache.

First compiles of the 52-layer model take tens of seconds; the persistent
cache makes every subsequent process start warm. Safe to call before any
jax use; respects JAX_COMPILATION_CACHE_DIR when set.
"""

from __future__ import annotations

import hashlib
import os


def _machine_key() -> str:
    """Key for ACCELERATOR-backend caches: jaxlib version + boot id.

    CPU caches need stronger isolation (see `enable_compilation_cache`):
    XLA:CPU AOT entries bake LLVM target-tuning features
    (+prefer-no-gather, +amx-*) that neither /proc/cpuinfo flags nor the
    model name fully determine — cpuinfo-keyed dirs still produced
    cpu_aot_loader mismatches (SIGILL-prone). A kernel boot id can never
    span machines, so boot-scoping is sound for both backends; repeated
    runs within one session still start warm."""
    parts = []
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except OSError:
        import uuid

        parts.append(uuid.uuid4().hex)  # no boot id -> never share
    try:
        import jaxlib

        parts.append(jaxlib.__version__)
    except Exception:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # Cap XLA:CPU codegen at AVX2. At AVX512+ XLA bakes the LLVM tuning
    # preferences +prefer-no-gather/+prefer-no-scatter into CPU AOT cache
    # entries, and jaxlib 0.9's cpu_aot_loader reports them as host-feature
    # mismatches on reload EVEN ON THE SAME MACHINE AND BOOT (verified: the
    # two tuning prefs are the entire compile-vs-host feature diff, so the
    # "could lead to SIGILL" warning is a false positive — but it spams
    # stderr and masks real cross-machine poisoning). AVX2 codegen drops
    # the tuning prefs entirely -> clean reloads. CPU matmuls dispatch to
    # oneDNN custom calls (own ISA detection), so the cap does not slow
    # the paths that matter. No effect on TPU executables. Must run before
    # the first compilation; all entry points call this at startup.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=AVX2").strip()

    explicit = path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    cache_dir = explicit or os.path.expanduser(
        f"~/.cache/timeviper_tpu/xla_{_machine_key()}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
