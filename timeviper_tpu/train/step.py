"""Sharded training step: loss + grad + optax update under one jit.

The reference's step is HF Trainer → DeepSpeed engine → NCCL allreduce
(SURVEY.md §3.1). Here the whole step — forward, backward, clip, update — is
one jitted function over a `Mesh`; GSPMD inserts every collective (gradient
reduction over `data`, TP reductions over `model`) from the sharding
constraints alone.

Batch layout: a batch is a stack of packed rows (B, L) with a shared static
FusionPlan (all rows use the same pack_size / frame budget, as the
reference's PackedDataset guarantees fixed pack_size, data.py:535-590);
vision pixels (B, F, H, W, 3). The per-row forward is vmapped over rows.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from timeviper_tpu.data.fusion import FusionPlan
from timeviper_tpu.models.vlm import VLMArch, vlm_loss


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_train_state(params, tx) -> TrainState:
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _make_loss_fn(arch: VLMArch, plan: FusionPlan, *, use_pdrop: bool,
                  remat: bool):
    def loss_fn(params, batch):
        # vmap the whole row dict over its leading batch axis; extra
        # entries (gather_idx/seq_idx for heterogeneous buckets) ride along
        def loss_one(row):
            return vlm_loss(params, arch, row, plan, remat=remat,
                            use_pdrop=use_pdrop)

        losses, aux = jax.vmap(loss_one)(batch)
        return losses.mean(), aux

    return loss_fn


def _grad_metrics(loss, aux, grads) -> Dict[str, Any]:
    metrics = {
        "loss": loss,
        "grad_norm": optax.global_norm(grads),
        "n_tokens": aux["n_tokens"].sum(),
    }
    # per-module side-channel (HfMultiTaskTrainer report_metrics analog,
    # reference trainer.py:277-298): grad norm per top-level module
    for mod in ("vision_backbone", "projector", "llm_backbone",
                "merge_modules"):
        if isinstance(grads, dict) and mod in grads:
            metrics[f"grad_norm/{mod}"] = optax.global_norm(grads[mod])
    return metrics


def make_train_step(
    arch: VLMArch,
    tx,
    plan: FusionPlan,
    *,
    use_pdrop: bool = False,
    remat: bool = True,
    grad_dtype=jnp.float32,
    donate: bool = True,
):
    """Returns a jittable `step(state, batch) -> (state, metrics)`.

    batch: {"input_ids": (B, Lt) int32, "labels": (B, fused_len) int32,
            "pixels": (B, F, H, W, 3) | None,
            "visual_embeddings": (B, Nv, D) | None}
    """
    loss_fn = _make_loss_fn(arch, plan, use_pdrop=use_pdrop, remat=remat)

    def step(state: TrainState, batch: Dict[str, Any]):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(grad_dtype) if g.dtype == jnp.bfloat16 else g,
            grads,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = _grad_metrics(loss, aux, grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


# ---------------------------------------------------------------------------
# Gradient accumulation (reference: HF Trainer gradient_accumulation_steps,
# train.py:55-237). Split the fused step into grad / accumulate / apply so
# each microbatch may use a DIFFERENT compiled program (different FusionPlan
# bucket) while grads accumulate device-side into one pytree.
# ---------------------------------------------------------------------------


def make_grad_step(
    arch: VLMArch,
    plan: FusionPlan,
    *,
    use_pdrop: bool = False,
    remat: bool = True,
    grad_dtype=jnp.float32,
):
    """Returns `grad(params, batch) -> (metrics, grads)` (no update)."""
    loss_fn = _make_loss_fn(arch, plan, use_pdrop=use_pdrop, remat=remat)

    def grad(params, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(grad_dtype) if g.dtype == jnp.bfloat16 else g,
            grads,
        )
        return _grad_metrics(loss, aux, grads), grads

    return grad


def accumulate_grads(acc, grads):
    """Add a microbatch's grads into the accumulator (donate `acc`)."""
    if acc is None:
        return grads
    return jax.tree_util.tree_map(jnp.add, acc, grads)


def make_apply_step(tx):
    """Returns `apply(state, grads, denom) -> (state, opt_metrics)`:
    one optimizer update from accumulated grads (mean over microbatches)."""

    def apply(state: TrainState, grads, denom: jax.Array):
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    return apply


