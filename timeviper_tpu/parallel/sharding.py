"""Device mesh + parameter sharding rules (the one sharding system).

Replaces the reference's whole distribution zoo — DDP / DeepSpeed ZeRO-1/2/3 /
FSDP wrap policies / vLLM TP (SURVEY.md §2.3; configs/accelerate_configs/*,
train_utils.py:528-601, generic_vlm.py:727-741, vllm_infer.py:44-52) — with a
single `jax.sharding.Mesh` and GSPMD sharding constraints:

* `data` axis — batch parallelism; with `fsdp_params=True` parameters are
  additionally sharded over it (ZeRO-3 analog).
* `model` axis — tensor parallelism. Attention shards by heads (nano: 32 q /
  8 kv heads), Mamba shards by SSD heads (128 heads) and B/C by state groups
  (8 groups), MLP by the hidden dimension. All collectives are inserted by
  XLA and ride ICI.
* `seq` axis (optional) — sequence parallelism for long-video prefill: the
  fused token sequence is sharded over devices; SSD chunk states compose
  associatively across the axis (ops/ssd.py uses `lax.associative_scan`,
  which GSPMD turns into an inter-chip scan) and the few attention layers
  all-gather KV.

No NCCL-style code anywhere: lay out shardings, jit, let XLA place
collectives (SURVEY.md §5.8).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * model * seq
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(data, seq, model)
    # model axis innermost: TP collectives are the most latency-sensitive and
    # should map to the closest ICI neighbours
    return Mesh(arr, ("data", "seq", "model"))


# ---------------------------------------------------------------------------
# Parameter sharding rules
# ---------------------------------------------------------------------------
# Rules are (regex over the pytree path, PartitionSpec). First match wins.
# Paths look like "llm_backbone/layers/3/mixer/in_proj/gate/kernel".


def _llm_rules(prefix: str, fsdp: bool) -> Tuple[Tuple[str, P], ...]:
    # second dim of a (in, out) kernel that shards on "model" can optionally
    # shard its other dim on "data" (ZeRO-3/FSDP analog)
    d = "data" if fsdp else None
    return (
        # ---- embeddings / lm_head: shard vocab over model --------------
        (rf"{prefix}/embeddings$", P("model", d)),
        (rf"{prefix}/lm_head/kernel", P(d, "model")),
        # ---- Mamba mixer ----------------------------------------------
        (rf"{prefix}/.*mixer/in_proj/(gate|x|B|C|dt)/kernel", P(d, "model")),
        (rf"{prefix}/.*mixer/in_proj/.*/bias", P("model")),
        (rf"{prefix}/.*mixer/conv1d/.*/weight", P("model", None)),
        (rf"{prefix}/.*mixer/conv1d/.*/bias", P("model")),
        (rf"{prefix}/.*mixer/(A_log|D|dt_bias)", P("model")),
        (rf"{prefix}/.*mixer/norm/weight", P("model")),
        (rf"{prefix}/.*mixer/out_proj/kernel", P("model", d)),
        # ---- attention -------------------------------------------------
        (rf"{prefix}/.*(q_proj|k_proj|v_proj)/kernel", P(d, "model")),
        (rf"{prefix}/.*(q_proj|k_proj|v_proj)/bias", P("model")),
        (rf"{prefix}/.*o_proj/kernel", P("model", d)),
        (rf"{prefix}/.*o_proj/bias", P()),
        # ---- MLPs ------------------------------------------------------
        (rf"{prefix}/.*(up_proj|gate_proj)/kernel", P(d, "model")),
        (rf"{prefix}/.*(up_proj|gate_proj)/bias", P("model")),
        (rf"{prefix}/.*down_proj/kernel", P("model", d)),
        (rf"{prefix}/.*down_proj/bias", P()),
        # ---- norms (tiny) ----------------------------------------------
        (rf"{prefix}/.*", P()),
    )


def _vision_rules(prefix: str, fsdp: bool) -> Tuple[Tuple[str, P], ...]:
    d = "data" if fsdp else None
    return (
        (rf"{prefix}/.*attn/qkv/kernel", P(d, "model")),
        (rf"{prefix}/.*attn/qkv/bias", P("model")),
        (rf"{prefix}/.*attn/proj/kernel", P("model", d)),
        (rf"{prefix}/.*mlp/fc1/kernel", P(d, "model")),
        (rf"{prefix}/.*mlp/fc1/bias", P("model")),
        (rf"{prefix}/.*mlp/fc2/kernel", P("model", d)),
        (rf"{prefix}/.*", P()),
    )


def vlm_sharding_rules(fsdp_params: bool = False) -> Tuple[Tuple[str, P], ...]:
    """TP (+optional FSDP) rules for the whole VLM parameter pytree."""
    return (
        _llm_rules("llm_backbone", fsdp_params)
        + _vision_rules("vision_backbone", fsdp_params)
        + (
            ("projector/fc\\d/kernel", P(None, "model")),
            ("projector/.*", P()),
            ("merge_modules/.*(q_proj|k_proj|v_proj)/kernel", P(None, "model")),
            ("merge_modules/.*o_proj/kernel", P("model", None)),
            ("merge_modules/.*", P()),
            (".*", P()),
        )
    )


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path_s: str, rules) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, path_s) or re.match(pat + "$", path_s):
            return spec
    return P()


def _shrink_spec(spec: P, ndim: int, shape, mesh: Mesh) -> P:
    """Drop axes that don't exist / don't divide; keep the pytree jit-safe."""
    parts = list(spec) + [None] * (ndim - len(spec))
    parts = parts[:ndim]
    out = []
    for dim, ax in zip(shape, parts):
        if ax is None:
            out.append(None)
            continue
        size = mesh.shape.get(ax, 1)
        out.append(ax if size > 1 and dim % size == 0 else None)
    return P(*out)


def params_shardings(
    params: Any, mesh: Mesh, rules=None, fsdp_params: bool = False
) -> Any:
    """NamedSharding pytree matching `params` (leaves get their rule's spec,
    shrunk to valid axes)."""
    if rules is None:
        rules = vlm_sharding_rules(fsdp_params)

    def leaf(path, x):
        spec = spec_for_path(_path_str(path), rules)
        spec = _shrink_spec(spec, getattr(x, "ndim", 0), getattr(x, "shape", ()), mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params: Any, mesh: Mesh, rules=None, fsdp_params: bool = False):
    """Place a parameter pytree onto the mesh.

    `may_alias=False` forces fresh buffers: device_put would otherwise alias
    an input that already has the target sharding, and a later donated train
    step would delete the caller's arrays out from under them.
    """
    sh = params_shardings(params, mesh, rules, fsdp_params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s, may_alias=False), params, sh
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors shard their leading axis over `data`."""
    return NamedSharding(mesh, P("data"))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """(B, L, ...) activations shard L over `seq` (long-context prefill)."""
    return NamedSharding(mesh, P("data", "seq"))
