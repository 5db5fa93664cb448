"""Multi-host initialization helpers.

Replaces the reference's process-group bootstrap (train_utils.py:528-601:
SLURM/torchrun/MPI env-var detection + NCCL init) with the single
`jax.distributed.initialize()` call JAX needs. Env detection mirrors the
reference's sources: explicit args > SLURM > OMPI > single host.
"""

from __future__ import annotations

import os
from typing import Optional

from timeviper_tpu.utils.overwatch import initialize_overwatch

overwatch = initialize_overwatch("dist")


def detect_process_env() -> dict:
    """Infer (coordinator, num_processes, process_id) from the environment
    (reference train_utils.py:528-549 checks the same variables)."""
    if "SLURM_PROCID" in os.environ:
        nodelist = os.environ.get("SLURM_STEP_NODELIST", "")
        head = nodelist.split(",")[0].replace("[", "").split("-")[0] or None
        return {
            "process_id": int(os.environ["SLURM_PROCID"]),
            "num_processes": int(os.environ.get("SLURM_NTASKS", 1)),
            "coordinator_address": os.environ.get(
                "COORDINATOR_ADDRESS",
                f"{head}:8476" if head else None),
        }
    if "OMPI_COMM_WORLD_RANK" in os.environ:
        return {
            "process_id": int(os.environ["OMPI_COMM_WORLD_RANK"]),
            "num_processes": int(os.environ["OMPI_COMM_WORLD_SIZE"]),
            "coordinator_address": os.environ.get("COORDINATOR_ADDRESS"),
        }
    return {"process_id": 0, "num_processes": 1, "coordinator_address": None}


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX when running on >1 process; no-op on one.

    TPU pods usually need NO arguments (the TPU runtime carries topology);
    explicit args / SLURM / MPI envs cover CPU-fleet and GPU cases.
    """
    import jax

    env = detect_process_env()
    num = num_processes if num_processes is not None else env["num_processes"]
    if num <= 1 and coordinator_address is None:
        overwatch.info("single-process run; skipping jax.distributed")
        return
    kwargs = {}
    addr = coordinator_address or env["coordinator_address"]
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=num,
            process_id=(
                process_id if process_id is not None else env["process_id"]),
        )
    jax.distributed.initialize(**kwargs)
    overwatch.info(
        f"jax.distributed initialized: process {jax.process_index()} / "
        f"{jax.process_count()}, {jax.local_device_count()} local devices"
    )
