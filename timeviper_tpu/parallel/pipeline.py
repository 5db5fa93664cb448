"""GPipe-style pipeline parallelism over per-stage XLA programs.

The reference ships DeepSpeed/accelerate launcher configs but never an
actual pipeline engine (SURVEY.md §2.3: PP absent); this adds one, designed
for the TPU/XLA execution model rather than torch's:

* The Nemotron-H layer pattern ("M-M-M-M*-…", config.py) is APERIODIC, so
  stages are heterogeneous and cannot be stacked into a single array for a
  shard_map'd SPMD pipeline. Instead each stage is its OWN jitted XLA
  program placed on its own device subset.
* Pipelining comes from JAX async dispatch: enqueueing microbatch m on
  stage s returns immediately, so stage s-1 computes microbatch m+1 while
  stage s computes m. On TPU the inter-stage `jax.device_put` is a pure
  ICI transfer.
* Backward is GPipe with stage-granular rematerialization: every stage's
  backward program recomputes its forward (the activation checkpoint lives
  at the stage boundary), so only stage INPUTS are kept — memory per stage
  is O(params/S + n_micro·B·L·H/S).

Grads are accumulated across microbatches as sums and normalized once by
the global valid-token count, so the result is bit-comparable to a
single-program full-batch step (tests/test_pipeline.py asserts this).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.models.nano import _block_forward, compute_logits
from timeviper_tpu.ops.norms import rms_norm

IGNORE_INDEX = -100


def _param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def split_stages(params: Dict[str, Any], n_stages: int) -> List[Tuple[int, int]]:
    """Contiguous layer ranges balanced by actual parameter bytes.

    Embedding + lm_head weight is charged to the first/last stage so the
    balancer shifts transformer layers away from them.
    """
    layers = params["layers"]
    costs = [_param_bytes(lp) for lp in layers]
    head = _param_bytes(params.get("embeddings"))
    tail = _param_bytes(params.get("lm_head", params.get("embeddings")))
    total = sum(costs) + head + tail
    per_stage = total / n_stages
    bounds, acc = [], head
    start = 0
    for i, c in enumerate(costs):
        acc += c
        # close the stage when its share is met (or when exactly one layer
        # must go to each remaining stage), leaving >=1 layer per stage
        remaining_stages = n_stages - len(bounds) - 1
        left = len(layers) - (i + 1)
        if (remaining_stages > 0 and left >= remaining_stages
                and (acc >= per_stage or left == remaining_stages)):
            bounds.append((start, i + 1))
            start, acc = i + 1, 0.0
    bounds.append((start, len(layers)))
    assert len(bounds) == n_stages and bounds[-1][1] == len(layers), (
        f"cannot split {len(layers)} layers into {n_stages} stages"
    )
    return bounds


def _stage_params(params: Dict[str, Any], lo: int, hi: int,
                  is_first: bool, is_last: bool) -> Dict[str, Any]:
    sp: Dict[str, Any] = {"layers": params["layers"][lo:hi]}
    if is_first:
        sp["embeddings"] = params["embeddings"]
    if is_last:
        sp["norm_f"] = params["norm_f"]
        if "lm_head" in params:
            sp["lm_head"] = params["lm_head"]
        else:
            # tied head: the last stage needs its own copy (the standard
            # PP embedding duplication)
            sp["embeddings"] = params["embeddings"]
    return sp


def _make_stage_fn(cfg: NanoConfig, block_types: Sequence[str],
                   is_first: bool, is_last: bool):
    def fn(sp, x, seq_idx):
        # the first stage embeds token ids; float inputs are already-fused
        # embeddings (the VLM pipeline fuses text+visual outside the stage)
        hidden = (jnp.take(sp["embeddings"], x, axis=0)
                  if is_first and jnp.issubdtype(x.dtype, jnp.integer)
                  else x)
        for lp, bt in zip(sp["layers"], block_types):
            hidden, _ = _block_forward(
                lp, cfg, bt, hidden, seq_idx=seq_idx, attn_mask=None,
                cache_layer=None, fill_cache=False, max_len=0,
                training=True,
            )
        if is_last:
            hidden = rms_norm(hidden, sp["norm_f"]["weight"],
                              eps=cfg.layer_norm_epsilon)
        return hidden

    return fn


def _ce_sum(logits, labels):
    """Shifted cross-entropy SUM + valid count (matches vlm_loss up to the
    final normalization, models/vlm.py:266-296; sums accumulate exactly
    across microbatches)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return -(token_ll * valid).sum(), valid.sum()


class PipelineRunner:
    """Host-scheduled GPipe over `n_stages` device groups.

    params: full nano param tree (models/nano.py:init_nano_params layout).
    devices: flat device list; split contiguously so neighboring stages sit
    on ICI neighbors. Within a stage params are replicated (compose TP by
    passing shardings per stage instead — see parallel/sharding.py).
    """

    def __init__(self, params: Dict[str, Any], cfg: NanoConfig,
                 n_stages: int, devices: Optional[Sequence] = None,
                 tp: int = 1):
        from jax.sharding import NamedSharding, PartitionSpec
        from timeviper_tpu.parallel.sharding import make_mesh, params_shardings

        devices = list(devices if devices is not None else jax.devices())
        assert len(devices) >= n_stages * tp, (len(devices), n_stages, tp)
        self.cfg = cfg
        self.n_stages = n_stages
        self.tp = tp
        self.bounds = split_stages(params, n_stages)
        per = len(devices) // n_stages
        assert per >= tp, (per, tp)
        self.stage_devices = [devices[s * per:s * per + tp]
                              for s in range(n_stages)]
        # each stage runs on its own (1, 1, tp) submesh; activations are
        # replicated within a stage, parameters TP-sharded by the same
        # regex rules as the flat-mesh path (parallel/sharding.py)
        self.meshes = [make_mesh(model=tp, devices=g)
                       for g in self.stage_devices]
        self.shardings = [NamedSharding(m, PartitionSpec())
                          for m in self.meshes]

        self.stage_params, self._fwd, self._bwd = [], [], []
        types = cfg.layers_block_type
        for s, (lo, hi) in enumerate(self.bounds):
            first, last = s == 0, s == n_stages - 1
            sp_host = _stage_params(params, lo, hi, first, last)
            sp_sh = params_shardings(
                {"llm_backbone": sp_host}, self.meshes[s])["llm_backbone"]
            sp = jax.tree_util.tree_map(
                lambda x, sh: jax.device_put(x, sh, may_alias=False),
                sp_host, sp_sh,
            )
            self.stage_params.append(sp)
            fn = _make_stage_fn(cfg, types[lo:hi], first, last)
            self._fwd.append(jax.jit(fn))
            if last:
                def loss_fn(sp_, x, seq_idx, labels, _fn=fn):
                    hidden = _fn(sp_, x, seq_idx)
                    logits = compute_logits(sp_, hidden)
                    loss_sum, cnt = _ce_sum(logits, labels)
                    return loss_sum, cnt

                argnums = (0,) if n_stages == 1 else (0, 1)
                self._loss_grad = jax.jit(
                    jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)
                )
                # variant returning the input cotangent even for a 1-stage
                # pipeline (the VLM runner backprops into vision/fusion)
                self._loss_grad_x = jax.jit(
                    jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
                )
            elif first:
                def bwd_first(sp_, x, seq_idx, ct, _fn=fn):
                    _, vjp = jax.vjp(lambda p: _fn(p, x, seq_idx), sp_)
                    return vjp(ct)[0]

                self._bwd.append(jax.jit(bwd_first))
            if first:
                # first-stage backward that ALSO returns the cotangent wrt
                # the (float) input — the VLM pipeline's seam to the vision
                # tower + fusion gather
                def bwd_first_x(sp_, x, seq_idx, ct, _fn=fn):
                    _, vjp = jax.vjp(lambda p, xx: _fn(p, xx, seq_idx),
                                     sp_, x)
                    return vjp(ct)

                self._bwd_first_x = jax.jit(bwd_first_x)
            else:
                def bwd_mid(sp_, x, seq_idx, ct, _fn=fn):
                    _, vjp = jax.vjp(
                        lambda p, xx: _fn(p, xx, seq_idx), sp_, x)
                    return vjp(ct)

                self._bwd.append(jax.jit(bwd_mid))

    # -- inference ---------------------------------------------------------

    def forward(self, input_ids, seq_idx=None, n_micro: int = 1):
        """Pipelined forward; returns logits gathered on the last stage."""
        mbs = jnp.split(input_ids, n_micro, axis=0)
        seqs = ([None] * n_micro if seq_idx is None
                else jnp.split(seq_idx, n_micro, axis=0))
        outs = []
        logits_fn = jax.jit(lambda sp, h: compute_logits(sp, h))
        for x, sq in zip(mbs, seqs):
            for s in range(self.n_stages):
                x = jax.device_put(x, self.shardings[s])
                x = self._fwd[s](self.stage_params[s], x, sq)
            outs.append(logits_fn(self.stage_params[-1], x))
        return jnp.concatenate(outs, axis=0)

    # -- training ----------------------------------------------------------

    def train_step(self, input_ids, labels, seq_idx=None, n_micro: int = 2):
        """One GPipe step. Returns (mean loss, per-stage grad trees) —
        numerically identical to a single-program full-batch grad."""
        S = self.n_stages
        mbs = jnp.split(input_ids, n_micro, axis=0)
        lbs = jnp.split(labels, n_micro, axis=0)
        seqs = ([None] * n_micro if seq_idx is None
                else jnp.split(seq_idx, n_micro, axis=0))

        # forward: stash each stage's INPUT (its only retained activation)
        stage_in: List[List[Any]] = [[] for _ in range(S)]
        for x, sq in zip(mbs, seqs):
            for s in range(S):
                x = jax.device_put(x, self.shardings[s])
                stage_in[s].append(x)
                if s < S - 1:
                    x = self._fwd[s](self.stage_params[s], x, sq)

        # backward with microbatch grad accumulation (sums)
        grads: List[Any] = [None] * S
        loss_sum = cnt_sum = None
        for m in reversed(range(n_micro)):
            ls, cnt, _ = self._bwd_step(m, stage_in, seqs, lbs, grads)
            loss_sum = ls if loss_sum is None else loss_sum + ls
            cnt_sum = cnt if cnt_sum is None else cnt_sum + cnt

        # host scalar: the step is over, so this sync point is free, and a
        # python float scales every stage's grads without cross-stage
        # device transfers
        denom = max(float(cnt_sum), 1.0)
        grads = [jax.tree_util.tree_map(lambda g: g * (1.0 / denom), g)
                 for g in grads]
        return float(loss_sum) / denom, grads

    def _bwd_step(self, m, stage_in, seqs, lbs, grads, first_bwd=None):
        """Backward for microbatch m through all stages; returns
        (loss_sum, cnt, first-stage input cotangent or None)."""
        S = self.n_stages
        add = functools.partial(jax.tree_util.tree_map, jnp.add)
        lb = jax.device_put(lbs[m], self.shardings[-1])
        if S == 1 and first_bwd is not None:
            (ls, cnt), (gp, ct) = self._loss_grad_x(
                self.stage_params[-1], stage_in[-1][m], seqs[m], lb)
            grads[-1] = gp if grads[-1] is None else add(grads[-1], gp)
            return ls, cnt, ct
        (ls, cnt), g = self._loss_grad(
            self.stage_params[-1], stage_in[-1][m], seqs[m], lb)
        gp, ct = g if S > 1 else (g[0], None)
        grads[-1] = gp if grads[-1] is None else add(grads[-1], gp)
        ct_in = None
        for s in reversed(range(S - 1)):
            ct = jax.device_put(ct, self.shardings[s])
            if s == 0 and first_bwd is not None:
                gp, ct_in = first_bwd(self.stage_params[s], stage_in[s][m],
                                      seqs[m], ct)
            elif s == 0:
                gp = self._bwd[s](self.stage_params[s], stage_in[s][m],
                                  seqs[m], ct)
            else:
                gp, ct = self._bwd[s](self.stage_params[s],
                                      stage_in[s][m], seqs[m], ct)
            grads[s] = gp if grads[s] is None else add(grads[s], gp)
        return ls, cnt, ct_in

    def apply_grads(self, optimizer, opt_states, grads):
        """Per-stage optax update (states live on the stage's devices)."""
        new_states = []
        for s in range(self.n_stages):
            updates, st = optimizer.update(grads[s], opt_states[s],
                                           self.stage_params[s])
            import optax

            self.stage_params[s] = optax.apply_updates(
                self.stage_params[s], updates)
            new_states.append(st)
        return new_states


class VLMPipelineRunner:
    """GPipe over the FULL VLM: vision tower + projector + fusion run on the
    first stage's devices; the LLM backbone is layer-split across stages.

    The reference has no VLM pipeline engine at all (its DeepSpeed configs
    shard optimizer state only; vLLM serves TP). Here the vision encode is
    just another producer feeding stage 0: per microbatch, text+visual
    embeddings are fused OUTSIDE the stage programs (one gather), stage 0
    consumes float embeddings (the dtype branch in `_make_stage_fn`), and on
    backward the first stage's input cotangent flows through a recompute-vjp
    of encode+fuse into vision/projector/embedding grads — the same
    stage-granular rematerialization the LLM stages use.

    Batches are homogeneous rows sharing one `FusionPlan` (data/fusion.py):
    input_ids (B, Lt) int32, pixels (B, F, H, W, 3), labels (B, fused_len).
    """

    def __init__(self, params: Dict[str, Any], arch, n_stages: int,
                 devices: Optional[Sequence] = None, tp: int = 1):
        self.arch = arch
        self.runner = PipelineRunner(params["llm_backbone"], arch.llm,
                                     n_stages, devices=devices, tp=tp)
        vp = {k: params[k] for k in ("vision_backbone", "projector")}
        self.vparams = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.runner.shardings[0]), vp)

        def fuse(vparams, emb_table, input_ids, pixels, gather_idx):
            from timeviper_tpu.models.vlm import encode_visual

            B = input_ids.shape[0]
            ve = encode_visual(
                vparams, self.arch,
                pixels.reshape((-1,) + pixels.shape[2:]))
            ve = ve.reshape(B, -1, ve.shape[-1])
            text = jnp.take(emb_table, input_ids, axis=0)  # (B, Lt, D)
            src = jnp.concatenate([text, ve.astype(text.dtype)], axis=1)
            return jnp.take(src, gather_idx, axis=1)  # (B, fused_len, D)

        self._fuse_fwd = jax.jit(fuse)
        # recompute-vjp: the fused activations are NOT retained between fwd
        # and bwd (stage-granular remat) — bwd re-runs the encode inside its
        # own program and applies the cotangent
        self._fuse_bwd = jax.jit(
            lambda vparams, emb_table, input_ids, pixels, gather_idx, ct:
            jax.vjp(lambda vpar, et: fuse(vpar, et, input_ids, pixels,
                                          gather_idx),
                    vparams, emb_table)[1](ct))

    def forward(self, input_ids, pixels, plan, n_micro: int = 1):
        """Pipelined VLM forward -> logits (B, fused_len, vocab)."""
        R = self.runner
        emb = R.stage_params[0]["embeddings"]
        gidx = jnp.asarray(plan.gather_idx)
        seq = None if plan.seq_idx is None else jnp.asarray(plan.seq_idx)
        mbs = zip(jnp.split(input_ids, n_micro, axis=0),
                  jnp.split(pixels, n_micro, axis=0))
        outs = []
        logits_fn = jax.jit(lambda sp, h: compute_logits(sp, h))
        for ids_m, px_m in mbs:
            x = self._fuse_fwd(self.vparams, emb, ids_m, px_m, gidx)
            sq = (None if seq is None
                  else jnp.repeat(seq[None], ids_m.shape[0], axis=0))
            for s in range(R.n_stages):
                x = jax.device_put(x, R.shardings[s])
                x = R._fwd[s](R.stage_params[s], x, sq)
            outs.append(logits_fn(R.stage_params[-1], x))
        return jnp.concatenate(outs, axis=0)

    def train_step(self, input_ids, pixels, labels, plan, n_micro: int = 2):
        """One GPipe step over the full VLM.

        Returns (mean loss, {"vision": grads for vision_backbone+projector,
        "stages": per-stage LLM grads}); the text-embedding grad from the
        fusion gather is already folded into stage 0's `embeddings` leaf.
        Numerically matches a single-program full-batch VLM grad
        (tests/test_pipeline.py::test_vlm_pipeline_matches_single_program).
        """
        R = self.runner
        S = R.n_stages
        emb = R.stage_params[0]["embeddings"]
        gidx = jnp.asarray(plan.gather_idx)
        seq = None if plan.seq_idx is None else jnp.asarray(plan.seq_idx)
        ids_mbs = jnp.split(input_ids, n_micro, axis=0)
        px_mbs = jnp.split(pixels, n_micro, axis=0)
        lbs = jnp.split(labels, n_micro, axis=0)
        seqs = [None if seq is None
                else jnp.repeat(seq[None], m.shape[0], axis=0)
                for m in ids_mbs]

        stage_in: List[List[Any]] = [[] for _ in range(S)]
        for ids_m, px_m, sq in zip(ids_mbs, px_mbs, seqs):
            x = self._fuse_fwd(self.vparams, emb, ids_m, px_m, gidx)
            for s in range(S):
                x = jax.device_put(x, R.shardings[s])
                stage_in[s].append(x)
                if s < S - 1:
                    x = R._fwd[s](R.stage_params[s], x, sq)

        grads: List[Any] = [None] * S
        vgrads = None
        emb_extra = None
        add = functools.partial(jax.tree_util.tree_map, jnp.add)
        loss_sum = cnt_sum = None
        for m in reversed(range(n_micro)):
            ls, cnt, ct_in = R._bwd_step(m, stage_in, seqs, lbs, grads,
                                         first_bwd=R._bwd_first_x)
            loss_sum = ls if loss_sum is None else loss_sum + ls
            cnt_sum = cnt if cnt_sum is None else cnt_sum + cnt
            gv, ge = self._fuse_bwd(self.vparams, emb, ids_mbs[m], px_mbs[m],
                                    gidx, ct_in)
            vgrads = gv if vgrads is None else add(vgrads, gv)
            emb_extra = ge if emb_extra is None else add(emb_extra, ge)

        denom = max(float(cnt_sum), 1.0)
        scale = 1.0 / denom
        grads = [jax.tree_util.tree_map(lambda g: g * scale, g)
                 for g in grads]
        vgrads = jax.tree_util.tree_map(lambda g: g * scale, vgrads)
        grads[0]["embeddings"] = grads[0]["embeddings"] + emb_extra * scale
        return float(loss_sum) / denom, {"vision": vgrads, "stages": grads}
