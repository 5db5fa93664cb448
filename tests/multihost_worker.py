"""Worker for tests/test_multihost.py: one of N processes in a real
`jax.distributed` cluster (CPU backend, 4 virtual devices per process).

Launched with SLURM-style env vars so the reference-mirroring env
detection in utils/dist.py (train_utils.py:528-549 analog) is what wires
the cluster together. Computes a data-parallel LM loss over a global
(num_procs*4)-way mesh and prints it from process 0.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
        " --xla_cpu_max_isa=AVX2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from timeviper_tpu.utils.dist import initialize_distributed  # noqa: E402

initialize_distributed()  # SLURM env vars drive everything

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from timeviper_tpu.config import tiny_nano_config  # noqa: E402
from timeviper_tpu.models.nano import (  # noqa: E402
    init_nano_params,
    nano_forward,
)

assert jax.process_count() == int(os.environ["SLURM_NTASKS"])
ndev = jax.device_count()
assert ndev == 4 * jax.process_count(), ndev

cfg = tiny_nano_config()
params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)

mesh = jax.sharding.Mesh(np.asarray(jax.devices()).reshape(ndev), ("data",))
B, L = ndev, 32
rng = np.random.default_rng(7)
ids_global = rng.integers(3, 500, (B, L)).astype(np.int32)

# each process materializes only ITS rows (process i owns devices
# [4i, 4i+4)); make_array_from_process_local_data assembles the global
# sharded array — the DCN-style data-parallel input path
sharding = NamedSharding(mesh, P("data"))
lo = jax.process_index() * 4
ids = jax.make_array_from_process_local_data(
    sharding, ids_global[lo:lo + 4], ids_global.shape)


@jax.jit
def loss_fn(p, ids):
    out = nano_forward(p, cfg, input_ids=ids)
    logp = jax.nn.log_softmax(out["logits"][:, :-1].astype(jnp.float32), -1)
    tgt = ids[:, 1:]
    ll = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return -ll.mean()


with mesh:
    loss = float(loss_fn(params, ids))

# every process computes the same global loss; process 0 reports
if jax.process_index() == 0:
    print(f"MULTIHOST_LOSS={loss:.6f}", flush=True)
sys.exit(0)
