"""Test config: run everything on CPU with 8 virtual devices so sharding
(pjit over a Mesh) is exercised without a TPU pod (SURVEY.md §4).

NOTE: env `JAX_PLATFORMS=cpu` is NOT enough in this image — a sitecustomize
registers the axon TPU plugin and wins; `jax.config.update` after import is
authoritative.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache: this box has one CPU core and XLA compiles
# dominate test wall-clock; cache survives across pytest runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
