"""Sharded checkpoints via orbax + auto-resume discovery.

Replaces the reference's HF Trainer `checkpoint-*` dirs + DeepSpeed ZeRO
gathered save/load (train.py:240-273, 438-455; train_utils.py:30-158,
SURVEY.md §5.4). Orbax writes each parameter shard from its owning device —
no gather, works at any mesh size — and restores with the target sharding.

Layout: <run_dir>/checkpoint-<step>/{state/, meta.json}. `latest_checkpoint`
mirrors the reference's glob+mtime resume discovery (train.py:438-455).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional

import jax


def _ckpt_dirs(run_dir: str):
    out = []
    for d in glob.glob(os.path.join(run_dir, "checkpoint-*")):
        m = re.match(r".*checkpoint-(\d+)$", d)
        if m and os.path.isdir(d):
            out.append((int(m.group(1)), d))
    return sorted(out)


def latest_checkpoint(run_dir: str) -> Optional[str]:
    dirs = _ckpt_dirs(run_dir)
    return dirs[-1][1] if dirs else None


def save_checkpoint(
    run_dir: str,
    step: int,
    state: Any,
    meta: Optional[Dict[str, Any]] = None,
    keep: int = 3,
) -> str:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(run_dir), f"checkpoint-{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    # retention: drop oldest beyond `keep`
    dirs = _ckpt_dirs(run_dir)
    for _, old in dirs[:-keep]:
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    return path


def restore_checkpoint(
    path: str, target: Any = None, shardings: Any = None
) -> Any:
    """Restore a train state / params pytree. `target` provides structure +
    dtypes; `shardings` (a matching pytree of NamedSharding) places shards
    directly on the mesh."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(os.path.abspath(path), "state")
    if target is None:
        return ckptr.restore(state_path)
    if shardings is not None:
        abstract = jax.tree_util.tree_map(
            lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
            target, shardings,
        )
    else:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target
        )
    return ckptr.restore(state_path, abstract)


def save_params(path: str, params: Any, meta: Optional[dict] = None) -> str:
    """Save a bare params pytree (final-artifact export)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        with open(os.path.join(os.path.dirname(path), "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    return path


def restore_params(path: str, target: Any = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(os.path.abspath(path))
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), target
    )
    return ckptr.restore(os.path.abspath(path), abstract)
