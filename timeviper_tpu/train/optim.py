"""Optimizer: per-module learning-rate groups via optax.

Replaces HfMultiTaskTrainer.create_optimizer (reference:
hf_mtask_trainer/trainer.py:115-275): separate LRs for the vision backbone,
projector, LLM, and TransV merge modules (with merge-module params routed out
of the LLM group exactly like the reference's TransV-aware routing), plus the
standard no-weight-decay mask for 1-D params (norms, biases, gates).

Optimizer states inherit parameter shardings automatically under jit (they
are pytrees with the same leaf shapes), so ZeRO-style optimizer-state
sharding falls out of the FSDP parameter rules for free.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import optax


@dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-5
    vision_lr: Optional[float] = None  # None -> learning_rate
    projector_lr: Optional[float] = None
    llm_lr: Optional[float] = None
    merge_lr: Optional[float] = None
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    warmup_steps: int = 0
    total_steps: int = 10000
    schedule: str = "cosine"  # "cosine" | "constant" | "linear"


def _lr_schedule(base_lr: float, cfg: OptimConfig):
    if cfg.schedule == "constant":
        sched = optax.constant_schedule(base_lr)
        if cfg.warmup_steps:
            sched = optax.join_schedules(
                [optax.linear_schedule(0.0, base_lr, cfg.warmup_steps), sched],
                [cfg.warmup_steps],
            )
        return sched
    decay_steps = max(cfg.total_steps - cfg.warmup_steps, 1)
    if cfg.schedule == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, max(cfg.warmup_steps, 1)),
                optax.linear_schedule(base_lr, 0.0, decay_steps),
            ],
            [max(cfg.warmup_steps, 1)],
        )
    return optax.warmup_cosine_decay_schedule(
        0.0, base_lr, max(cfg.warmup_steps, 1), cfg.total_steps
    )


def _module_label(path) -> str:
    top = None
    for k in path:
        top = getattr(k, "key", getattr(k, "idx", None))
        break
    # flat {path_str: leaf} dicts (the LoRA trainable sub-dict) carry the
    # whole path in one key — label by the first component
    top = str(top).split("/")[0]
    return {
        "vision_backbone": "vision",
        "projector": "projector",
        "llm_backbone": "llm",
        "merge_modules": "merge",
    }.get(str(top), "llm")


def _decay_mask(params):
    # no weight decay for 1-D params (norm weights, biases, alpha gates)
    return jax.tree_util.tree_map(lambda p: getattr(p, "ndim", 0) >= 2, params)


def build_optimizer(cfg: OptimConfig, params: Any) -> optax.GradientTransformation:
    """AdamW with per-module LR groups + global-norm clipping."""
    lrs = {
        "vision": cfg.vision_lr if cfg.vision_lr is not None else cfg.learning_rate,
        "projector": cfg.projector_lr
        if cfg.projector_lr is not None
        else cfg.learning_rate,
        "llm": cfg.llm_lr if cfg.llm_lr is not None else cfg.learning_rate,
        "merge": cfg.merge_lr if cfg.merge_lr is not None else cfg.learning_rate,
    }

    def group(base_lr):
        return optax.chain(
            optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
            optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask),
            optax.scale_by_schedule(_lr_schedule(base_lr, cfg)),
            optax.scale(-1.0),
        )

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _module_label(path), params
    )
    tx = optax.multi_transform(
        {name: group(lr) for name, lr in lrs.items()}, labels
    )
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    return tx


def freeze_mask(params: Any, trainable_modules: str) -> Any:
    """Comma-separated substring match over pytree paths (reference
    train.py:384-398 freezes by `n in name` checks). True = trainable."""
    subs = [s.strip() for s in trainable_modules.split(",") if s.strip()]

    def leaf(path, _):
        p = "/".join(
            str(getattr(k, "key", getattr(k, "idx", ""))) for k in path
        )
        return any(s in p for s in subs)

    return jax.tree_util.tree_map_with_path(leaf, params)


def apply_freeze(tx: optax.GradientTransformation, params, trainable_modules: Optional[str]):
    if not trainable_modules:
        return tx
    mask = freeze_mask(params, trainable_modules)
    return optax.chain(
        optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(lambda m: not m, mask)),
        tx,
    )
