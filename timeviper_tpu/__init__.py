"""timeviper_tpu — a TPU-native (JAX/XLA/Pallas) framework for hybrid
Mamba-2/Transformer vision-language models for long-video understanding.

Re-designed from scratch for TPU with the capabilities of the reference
`xiaomi-research/timeviper` (CUDA/torch). The compute path is pure
functional JAX: parameter pytrees + jittable apply functions, sharded over a
`jax.sharding.Mesh`. Hot ops (Mamba-2 SSD chunked scan, flash attention)
have Pallas TPU kernels with pure-jnp reference oracles used for testing.
"""

__version__ = "0.1.0"

from timeviper_tpu import config  # noqa: F401
