"""Training loop: sharded jit step + logging + checkpoint/resume + crash save.

TPU re-design of HfMultiTaskTrainer + the train.py driver (reference:
hf_mtask_trainer/trainer.py:75-298, train.py:421-528): one Mesh, one jitted
step (train/step.py), per-module LR groups (train/optim.py), metric
aggregation each log interval, `checkpoint-<step>` dirs with auto-resume,
and an emergency save on any exception (train.py:515-528).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from timeviper_tpu.data.loader import CollatedBatch
from timeviper_tpu.models.vlm import VLMArch
from timeviper_tpu.parallel.sharding import (
    make_mesh,
    params_shardings,
    shard_params,
)
from timeviper_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from timeviper_tpu.train.optim import OptimConfig, apply_freeze, build_optimizer
from timeviper_tpu.train.step import (
    TrainState,
    init_train_state,
    make_apply_step,
    make_grad_step,
    make_train_step,
)
from timeviper_tpu.utils.overwatch import initialize_overwatch

overwatch = initialize_overwatch("trainer")


@dataclass
class TrainerConfig:
    run_dir: str = "runs/default"
    max_steps: int = 1000
    log_every: int = 10
    save_every: int = 500
    keep_checkpoints: int = 3
    seed: int = 0
    # mesh
    data_parallel: int = 1
    model_parallel: int = 1
    fsdp_params: bool = True
    # behavior
    remat: bool = True
    # "full" | "scan" | "dots" | "dots_scan" — what the per-block remat
    # saves (models/nano.py:_remat_wrap; measured A/B in BENCH_SUITE
    # train_fwdbwd rows: dots +14.5% tokens/sec at the 9B-width shape
    # for ~the matmul outputs' worth of extra activation memory)
    remat_policy: str = "full"
    use_pdrop: bool = False
    trainable_modules: Optional[str] = None  # comma substrings; None = all
    # LoRA/QLoRA mode: params must carry lora_a/lora_b factors (add_lora);
    # the step differentiates and updates ONLY the factors (step.py
    # make_lora_train_step) — required when the base is int8-quantized
    lora: bool = False
    resume: bool = True
    # microbatches per optimizer update (HF gradient_accumulation_steps;
    # reference train.py:55-237). Microbatches may use different fusion-plan
    # buckets — grads accumulate device-side across compiled programs.
    grad_accum_steps: int = 1


class Trainer:
    def __init__(
        self,
        arch: VLMArch,
        params: Dict[str, Any],
        optim_cfg: OptimConfig,
        trainer_cfg: TrainerConfig,
    ) -> None:
        self.arch = arch
        self.cfg = trainer_cfg
        self.mesh = make_mesh(
            data=trainer_cfg.data_parallel, model=trainer_cfg.model_parallel
        )
        overwatch.info(f"mesh: {dict(self.mesh.shape)}")

        params = shard_params(params, self.mesh,
                              fsdp_params=trainer_cfg.fsdp_params)
        self.param_shardings = params_shardings(
            params, self.mesh, fsdp_params=trainer_cfg.fsdp_params
        )
        if trainer_cfg.lora:
            # optimizer over the trainable sub-dict only (QLoRA-safe):
            # lora factors + trainable_modules-matched leaves (the
            # reference unfreezes listed modules on top of the peft
            # factors, train.py:384-398)
            from timeviper_tpu.train.lora import trainable_lora_state
            from timeviper_tpu.train.step import init_lora_train_state

            factors = trainable_lora_state(
                params, trainer_cfg.trainable_modules)
            assert factors, "TrainerConfig.lora=True needs add_lora'd params"
            tx = build_optimizer(optim_cfg, factors)
            self.tx = tx
            self.state = init_lora_train_state(
                params, tx, trainer_cfg.trainable_modules)
        else:
            tx = build_optimizer(optim_cfg, params)
            tx = apply_freeze(tx, params, trainer_cfg.trainable_modules)
            self.tx = tx
            self.state = init_train_state(params, tx)
        self._step_fns: Dict[Any, Callable] = {}
        self.batch_sharding = NamedSharding(self.mesh, P("data"))

        if trainer_cfg.resume:
            ckpt = latest_checkpoint(trainer_cfg.run_dir)
            if ckpt:
                overwatch.info(f"resuming from {ckpt}")
                self.state = restore_checkpoint(ckpt, self.state)

    # -- jit cache keyed by fusion plan (static shapes per plan) ---------

    @property
    def _remat_arg(self):
        """remat arg for the step builders: False, True ("full"), or the
        policy string (nano_forward accepts either form)."""
        if not self.cfg.remat:
            return False
        return (self.cfg.remat_policy
                if self.cfg.remat_policy != "full" else True)

    def _plan_key(self, plan):
        return plan.cache_key  # FusionPlan tuple | HeteroPlan (hashable)

    def _get_step(self, plan):
        key = ("fused", self._plan_key(plan))
        if key not in self._step_fns:
            if self.cfg.lora:
                from timeviper_tpu.train.step import make_lora_train_step

                step = make_lora_train_step(
                    self.arch, self.tx, plan,
                    use_pdrop=self.cfg.use_pdrop, remat=self._remat_arg,
                    trainable_modules=self.cfg.trainable_modules,
                )
            else:
                step = make_train_step(
                    self.arch, self.tx, plan,
                    use_pdrop=self.cfg.use_pdrop, remat=self._remat_arg,
                )
            self._step_fns[key] = jax.jit(step, donate_argnums=(0,))
        return self._step_fns[key]

    def _get_grad(self, plan):
        key = ("grad", self._plan_key(plan))
        if key not in self._step_fns:
            if self.cfg.lora:
                from timeviper_tpu.train.step import make_lora_grad_step

                grad = make_lora_grad_step(
                    self.arch, plan,
                    use_pdrop=self.cfg.use_pdrop, remat=self._remat_arg,
                    trainable_modules=self.cfg.trainable_modules,
                )
            else:
                grad = make_grad_step(
                    self.arch, plan,
                    use_pdrop=self.cfg.use_pdrop, remat=self._remat_arg,
                )
            self._step_fns[key] = jax.jit(grad)
        return self._step_fns[key]

    def _get_accum(self):
        if "accum" not in self._step_fns:
            self._step_fns["accum"] = jax.jit(
                lambda acc, g: jax.tree_util.tree_map(jnp.add, acc, g),
                donate_argnums=(0,),
            )
        return self._step_fns["accum"]

    def _get_apply(self):
        if "apply" not in self._step_fns:
            if self.cfg.lora:
                from timeviper_tpu.train.step import make_lora_apply_step

                apply = make_lora_apply_step(
                    self.tx, trainable_modules=self.cfg.trainable_modules)
            else:
                apply = make_apply_step(self.tx)
            self._step_fns["apply"] = jax.jit(
                apply, donate_argnums=(0, 1)
            )
        return self._step_fns["apply"]

    def train_step(self, cb: CollatedBatch) -> Dict[str, float]:
        batch = {
            k: jax.device_put(jnp.asarray(v), self.batch_sharding)
            for k, v in cb.batch.items()
        }
        return self._device_step(batch, cb.plan)

    def _device_step(self, batch, plan) -> Dict[str, float]:
        step_fn = self._get_step(plan)
        with self.mesh:
            self.state, metrics = step_fn(self.state, batch)
        return metrics

    # -- main loop -------------------------------------------------------

    def train(self, batches) -> TrainState:
        """`batches`: iterable of CollatedBatch (e.g. DataLoader.epoch())."""
        from timeviper_tpu.data.loader import prefetch_to_device

        cfg = self.cfg
        A = max(1, cfg.grad_accum_steps)
        # step counter tracked on the HOST (it advances by 1 per optimizer
        # update); fetching device scalars every step would sync and defeat
        # the double-buffered prefetch. Metrics are fetched only at
        # log_every boundaries.
        step_i = int(self.state.step)
        pending: list = []  # device-side metric dicts awaiting one fetch
        grads_acc = None
        n_micro = 0
        t_log = time.perf_counter()

        def flush_log():
            nonlocal pending, t_log
            if not pending:
                return
            vals = [
                {k: float(np.asarray(v)) for k, v in m.items()
                 if not k.startswith("grad_norm/")}
                for m in pending
            ]
            n = len(vals)
            dt = time.perf_counter() - t_log
            loss = sum(v.get("loss", 0.0) for v in vals) / max(
                sum("loss" in v for v in vals), 1)
            gnorm = sum(v.get("grad_norm", 0.0) for v in vals) / n
            overwatch.info(
                f"step {step_i} | loss {loss:.4f} | gnorm {gnorm:.3f} "
                f"| {dt / max(n, 1):.2f}s/it"
            )
            pending = []
            t_log = time.perf_counter()

        try:
            # double-buffered host->device feed: the next batch's copy
            # overlaps the current step's compute
            for batch, plan in prefetch_to_device(
                iter(batches), self.batch_sharding
            ):
                if step_i >= cfg.max_steps:
                    break
                if A == 1:
                    metrics = self._device_step(batch, plan)
                    pending.append(metrics)
                    step_i += 1
                else:
                    grad_fn = self._get_grad(plan)
                    with self.mesh:
                        metrics, grads = grad_fn(self.state.params, batch)
                        grads_acc = (
                            grads if grads_acc is None
                            else self._get_accum()(grads_acc, grads)
                        )
                    pending.append(metrics)
                    n_micro += 1
                    if n_micro < A:
                        continue
                    with self.mesh:
                        self.state, _ = self._get_apply()(
                            self.state, grads_acc, float(A))
                    grads_acc, n_micro = None, 0
                    step_i += 1

                if step_i % cfg.log_every == 0:
                    flush_log()
                if step_i % cfg.save_every == 0:
                    path = save_checkpoint(
                        cfg.run_dir, step_i, self.state,
                        keep=cfg.keep_checkpoints,
                    )
                    overwatch.info(f"saved {path}")
            # leftover microbatches at data end still update once
            if grads_acc is not None and n_micro:
                with self.mesh:
                    self.state, _ = self._get_apply()(
                        self.state, grads_acc, float(n_micro))
                step_i += 1
            flush_log()
        except Exception:
            # crash-save (reference train.py:515-528)
            overwatch.error(f"exception at step {step_i}; emergency save")
            save_checkpoint(cfg.run_dir, step_i, self.state,
                            keep=cfg.keep_checkpoints + 1)
            raise
        return self.state
