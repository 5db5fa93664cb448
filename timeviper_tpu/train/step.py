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
# LoRA / QLoRA steps: differentiate w.r.t. the factor leaves ONLY.
# The reference's peft path (train.py:364-383) freezes by requires_grad;
# here the step partitions the pytree (split_lora_state/graft_lora) so the
# backward never asks for int8-base gradients (QLoRA: jax.grad rejects int
# inputs) and the optimizer state is factor-sized, not model-sized — the
# full 52L 9B int8 base + bf16 factors fine-tunes on one 16 GB chip.
# ---------------------------------------------------------------------------


def _factors_only(lora_flat):
    """Drop the constant lora_scale (= alpha/r) from the trainable set."""
    return {k: v for k, v in lora_flat.items()
            if not k.endswith("lora_scale")}


def _cast_grads(grads, grad_dtype):
    """bf16 grads -> grad_dtype (f32) so grad-accum sums and Adam moments
    have full resolution (bf16 second moments are below eps=1e-8)."""
    if grad_dtype is None:
        return grads
    return jax.tree_util.tree_map(
        lambda g: g.astype(grad_dtype) if g.dtype == jnp.bfloat16 else g,
        grads,
    )


def make_lora_train_step(
    arch: VLMArch,
    tx,
    plan: FusionPlan,
    *,
    use_pdrop: bool = False,
    remat: bool = True,
    grad_dtype=jnp.float32,
    trainable_modules: Optional[str] = None,
):
    """Returns `step(state, batch) -> (state, metrics)` updating the LoRA
    factors plus any `trainable_modules`-matched float leaves (the
    reference unfreezes listed modules — e.g. a fresh projector — on top
    of the peft factors, train.py:384-398). `state.params` is the FULL
    pytree (frozen base + factors); `state.opt_state` must be built over
    the same trainable sub-dict (`init_lora_train_state`)."""
    from timeviper_tpu.train.lora import graft_lora, trainable_lora_state

    loss_fn = _make_loss_fn(arch, plan, use_pdrop=use_pdrop, remat=remat)

    def step(state: TrainState, batch: Dict[str, Any]):
        lora0 = trainable_lora_state(state.params, trainable_modules)
        assert lora0, "make_lora_train_step needs add_lora'd params"

        def lf(lora_flat):
            return loss_fn(graft_lora(state.params, lora_flat), batch)

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(lora0)
        grads = _cast_grads(grads, grad_dtype)
        updates, opt_state = tx.update(grads, state.opt_state, lora0)
        new_lora = optax.apply_updates(lora0, updates)
        params = graft_lora(state.params, new_lora)
        metrics = _grad_metrics(loss, aux, grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def make_lora_grad_step(
    arch: VLMArch,
    plan: FusionPlan,
    *,
    use_pdrop: bool = False,
    remat: bool = True,
    grad_dtype=jnp.float32,
    trainable_modules: Optional[str] = None,
):
    """Trainable-subset `grad(params, batch) -> (metrics, grads)`
    (grad-accum)."""
    from timeviper_tpu.train.lora import graft_lora, trainable_lora_state

    loss_fn = _make_loss_fn(arch, plan, use_pdrop=use_pdrop, remat=remat)

    def grad(params, batch):
        lora0 = trainable_lora_state(params, trainable_modules)

        def lf(lora_flat):
            return loss_fn(graft_lora(params, lora_flat), batch)

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(lora0)
        return _grad_metrics(loss, aux, grads), _cast_grads(grads, grad_dtype)

    return grad


def make_lora_apply_step(tx, trainable_modules: Optional[str] = None):
    """Trainable-subset optimizer apply from accumulated grads."""
    from timeviper_tpu.train.lora import graft_lora, trainable_lora_state

    def apply(state: TrainState, grads, denom: jax.Array):
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
        lora0 = trainable_lora_state(state.params, trainable_modules)
        updates, opt_state = tx.update(grads, state.opt_state, lora0)
        params = graft_lora(
            state.params, optax.apply_updates(lora0, updates))
        metrics = {"grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    return apply


def init_lora_train_state(
    params, tx, trainable_modules: Optional[str] = None
) -> TrainState:
    """TrainState whose opt_state covers only the trainable subset (LoRA
    factors + trainable_modules leaves). Moments init in float32 even for
    bf16 factors — grads are cast to f32 in the lora steps, so Adam's
    mu/nu stay f32 end-to-end (bf16 nu can't resolve eps=1e-8)."""
    from timeviper_tpu.train.lora import trainable_lora_state

    lora0 = trainable_lora_state(params, trainable_modules)
    lora0_f32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
        lora0,
    )
    return TrainState(
        params=params,
        opt_state=tx.init(lora0_f32),
        step=jnp.zeros((), jnp.int32),
    )


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


