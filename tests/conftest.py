"""Test config: run everything on CPU with 8 virtual devices so sharding
(pjit over a Mesh) is exercised without a TPU pod (SURVEY.md §4).

NOTE: env `JAX_PLATFORMS=cpu` is NOT enough in this image — a sitecustomize
registers the axon TPU plugin and wins; `jax.config.update` after import is
authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cap XLA:CPU codegen at AVX2: at AVX512+ XLA bakes the LLVM tuning
# preferences +prefer-no-gather/+prefer-no-scatter into AOT cache entries,
# and jaxlib 0.9's cpu_aot_loader flags them as host-feature mismatches on
# RELOAD EVEN ON THE SAME MACHINE (verified: the two tuning prefs are the
# entire feature diff). Matmuls go through oneDNN custom calls (own CPU
# dispatch), so the cap does not slow the hot path.
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# TIMEVIPER_TPU_TESTS=1 keeps the attached TPU visible so tests marked
# `tpu` (tests/test_tpu_onchip.py) exercise the COMPILED Mosaic kernels;
# default remains CPU so the suite runs anywhere.
if os.environ.get("TIMEVIPER_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: this box has one CPU core and XLA compiles
# dominate test wall-clock; cache survives across pytest runs.
# The cache dir is scoped to the KERNEL BOOT: XLA:CPU AOT entries bake LLVM
# target-tuning features (+prefer-no-gather, +amx-*) that neither
# /proc/cpuinfo flags nor the model name fully determine — entries written
# by one VM generation reloaded on another logged cpu_aot_loader mismatches
# (SIGILL-prone, VERDICT r2 weak #2). A boot id can never span machines,
# while repeated pytest runs within one session still share compiles.
import hashlib  # noqa: E402

def _boot_key() -> str:
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

jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_test_cache_{_boot_key()}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
