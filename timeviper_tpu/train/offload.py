"""Host-offloaded full-parameter training — the ZeRO-offload analog.

The reference trains past device memory with DeepSpeed ZeRO-3 + CPU
offload (configs/zero_configs/zero3.json:28-45: optimizer state and
params on host, fp32 master weights in CPU RAM). The 9B backbone in bf16
(17.8 GB) exceeds a 16 GB v5e even before gradients, so the TPU-native
analog is LAYER-STREAMED training:

* f32 master params + AdamW moments live in host RAM (numpy);
* the forward streams one layer's weights to the device at a time,
  keeping only the inter-layer hidden states resident (B·L·D per layer
  — 33 MB at B=1, L=4096, D=4096);
* the backward walks layers in reverse, re-streams each layer's weights,
  recomputes its forward (gradient checkpointing at layer granularity),
  runs the layer vjp, pulls the layer gradient to host, and applies
  AdamW there immediately (grads never accumulate on device);
* the embedding table stays device-resident in compute dtype (1 GB bf16
  at vocab 131072) and is refreshed from the host master once per step;
  its input-gradient scatter (`np.add.at`) runs on host.

Per step device<->host traffic ≈ 3x the layer parameter bytes (weights
in twice, grads out once) + the embedding refresh. Update math matches
`optax.adamw` exactly (bias-corrected moments; decoupled weight decay)
so the host step is a drop-in for the on-device optimizer
(tests/test_offload.py proves step-for-step equality).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.models.nano import _block_forward, compute_logits
from timeviper_tpu.ops.norms import rms_norm


def _tree_map_np(fn, *trees):
    return jax.tree_util.tree_map(fn, *trees)


def _stage(x, dtype):
    """Host numpy -> device array WITHOUT aliasing the host buffer.

    On the CPU backend `jnp.asarray` zero-copies a same-dtype numpy
    array, so the device array would alias memory that `HostAdamW`
    later mutates IN PLACE — with async dispatch the computation can
    read post-update values (observed as a flaky one-extra-step drift
    in tests/test_offload.py under load). An owned copy is safe to
    alias: nothing mutates it after staging. Only same-dtype stagings
    can alias, so only they pay the host memcpy; the common f32-host ->
    bf16-compute staging already allocates a fresh buffer in the
    conversion and is passed through untouched.
    """
    x = np.asarray(x)
    if x.dtype == np.dtype(dtype):
        x = np.array(x, copy=True)
    return jnp.asarray(x, dtype)


class HostAdamW:
    """AdamW on host numpy, matching optax.adamw's update exactly."""

    def __init__(self, params_host, lr=1e-5, b1=0.9, b2=0.999, eps=1e-8,
                 weight_decay=0.0):
        self.lr, self.b1, self.b2 = lr, b1, b2
        self.eps, self.wd = eps, weight_decay
        self.step = 0
        self.mu = _tree_map_np(lambda p: np.zeros_like(p, np.float32),
                               params_host)
        self.nu = _tree_map_np(lambda p: np.zeros_like(p, np.float32),
                               params_host)

    def update_leaf(self, path_mu, path_nu, p, g):
        """In-place AdamW on one leaf; `path_mu`/`path_nu` are the moment
        arrays for this leaf. Caller has already incremented `self.step`."""
        t = self.step
        g = np.asarray(g, np.float32)
        path_mu *= self.b1
        path_mu += (1 - self.b1) * g
        path_nu *= self.b2
        path_nu += (1 - self.b2) * np.square(g)
        mhat = path_mu / (1 - self.b1 ** t)
        nhat = path_nu / (1 - self.b2 ** t)
        upd = mhat / (np.sqrt(nhat) + self.eps)
        if self.wd:
            upd = upd + self.wd * p
        p -= self.lr * upd

    def update_tree(self, sub_params, sub_mu, sub_nu, sub_grads):
        leaves_p = jax.tree_util.tree_leaves(sub_params)
        leaves_m = jax.tree_util.tree_leaves(sub_mu)
        leaves_n = jax.tree_util.tree_leaves(sub_nu)
        leaves_g = jax.tree_util.tree_leaves(sub_grads)
        for p, m, n, g in zip(leaves_p, leaves_m, leaves_n, leaves_g):
            self.update_leaf(m, n, p, g)


class StreamedTrainer:
    """Layer-streamed full-parameter LM fine-tuning for the nano backbone.

    host_params: the plain `init_nano_params`-structured pytree as numpy
    f32 (the master copy; mutated in place by `train_step`).
    """

    def __init__(self, cfg: NanoConfig, host_params: Dict[str, Any], *,
                 lr=1e-5, weight_decay=0.0, compute_dtype=jnp.bfloat16,
                 logits_chunk: int = 2048):
        self.cfg = cfg
        self.host = host_params
        self.dtype = compute_dtype
        self.logits_chunk = logits_chunk
        self.opt = HostAdamW(host_params, lr=lr, weight_decay=weight_decay)
        self._fwd_cache: Dict[str, Any] = {}

    # -- jitted per-layer fns (cached per block type) ---------------------

    def _layer_fwd(self, block_type):
        key = ("fwd", block_type)
        if key not in self._fwd_cache:
            cfg = self.cfg

            @jax.jit
            def fwd(lp, hidden):
                out, _ = _block_forward(
                    lp, cfg, block_type, hidden, seq_idx=None,
                    attn_mask=None, cache_layer=None, fill_cache=False,
                    max_len=0, training=True)
                return out

            self._fwd_cache[key] = fwd
        return self._fwd_cache[key]

    def _layer_bwd(self, block_type):
        key = ("bwd", block_type)
        if key not in self._fwd_cache:
            cfg = self.cfg

            @jax.jit
            def bwd(lp, hidden, dout):
                def f(lp, h):
                    out, _ = _block_forward(
                        lp, cfg, block_type, h, seq_idx=None,
                        attn_mask=None, cache_layer=None, fill_cache=False,
                        max_len=0, training=True)
                    return out

                _, vjp = jax.vjp(f, lp, hidden)
                g_lp, dh = vjp(dout)
                return (jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), g_lp), dh)

            self._fwd_cache[key] = bwd
        return self._fwd_cache[key]

    def _head(self):
        """Loss head: final rms_norm + (tied or separate) lm_head + CE,
        chunked over the sequence so the (L, vocab) logits never
        materialize whole. Returns loss, d(hidden), d(norm_f), d(head)."""
        if "head" not in self._fwd_cache:
            cfg = self.cfg
            C = self.logits_chunk

            @jax.jit
            def head(norm_w, emb_or_head, hidden, labels):
                def loss_fn(norm_w, table, hidden):
                    h = rms_norm(hidden, norm_w, eps=cfg.layer_norm_epsilon)
                    B, L, D = h.shape
                    pad = (-L) % C
                    hp = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
                    lp_ = jnp.pad(labels, ((0, 0), (0, pad)),
                                  constant_values=-100)
                    hc = hp.reshape(B, -1, C, D)
                    lc = lp_.reshape(B, -1, C)

                    def one(args):
                        hc_i, lc_i = args
                        logits = compute_logits(
                            {"embeddings": table}, hc_i)
                        logp = jax.nn.log_softmax(logits, axis=-1)
                        tgt = jnp.clip(lc_i, 0, None)
                        ll = jnp.take_along_axis(
                            logp, tgt[..., None], axis=-1)[..., 0]
                        m = (lc_i != -100).astype(jnp.float32)
                        return (-ll * m).sum(), m.sum()

                    nll, cnt = jax.lax.map(
                        one, (jnp.moveaxis(hc, 1, 0), jnp.moveaxis(lc, 1, 0)))
                    return nll.sum() / jnp.maximum(cnt.sum(), 1.0)

                loss, vjp = jax.vjp(loss_fn, norm_w, emb_or_head, hidden)
                g_norm, g_table, dh = vjp(jnp.ones((), jnp.float32))
                return (loss, g_norm.astype(jnp.float32),
                        g_table.astype(jnp.float32), dh)

            self._fwd_cache["head"] = head
        return self._fwd_cache["head"]

    # -- the step ----------------------------------------------------------

    def train_step(self, input_ids: np.ndarray, labels: np.ndarray,
                   shift: bool = True) -> float:
        """One full AdamW step. Labels -100 are masked; `shift` applies the
        standard next-token shift (labels[i] scored by logits[i-1])."""
        cfg, host = self.cfg, self.host
        if shift:
            input_ids = np.asarray(input_ids)[:, :-1]
            labels = np.asarray(labels)[:, 1:]

        # the optimizer's timestep advances ONCE per step for every leaf
        self.opt.step += 1

        emb_dev = jax.device_put(_stage(host["embeddings"], self.dtype))
        ids_dev = jax.device_put(jnp.asarray(input_ids, jnp.int32))
        h = jnp.take(emb_dev, ids_dev, axis=0)

        push = functools.partial(_tree_map_np,
                                 lambda x: _stage(x, self.dtype))
        kinds = tuple(cfg.layers_block_type)
        hiddens: List[Any] = [h]
        for i, bt in enumerate(kinds):
            h = self._layer_fwd(bt)(push(host["layers"][i]), h)
            hiddens.append(h)

        # head: loss + gradients for norm_f, the tied lm_head (= the
        # embedding table used as output head), and the last hidden
        head_table = host.get("lm_head", {}).get("kernel") \
            if isinstance(host.get("lm_head"), dict) else None
        tied = head_table is None
        table_host = host["embeddings"] if tied else head_table
        table_dev = emb_dev if tied else jax.device_put(
            _stage(table_host, self.dtype))
        loss, g_norm, g_table, dh = self._head()(
            _stage(host["norm_f"]["weight"], jnp.float32),
            (table_dev if tied else table_dev.T),
            hiddens[-1], jax.device_put(jnp.asarray(labels, jnp.int32)))

        # backward: reverse layer stream; host AdamW applied per layer
        for i in reversed(range(len(kinds))):
            g_lp, dh = self._layer_bwd(kinds[i])(
                push(host["layers"][i]), hiddens[i], dh)
            g_np = _tree_map_np(np.asarray, jax.device_get(g_lp))
            self.opt.update_tree(
                host["layers"][i], self.opt.mu["layers"][i],
                self.opt.nu["layers"][i], g_np)
            hiddens[i + 1] = None  # free as we go

        # embedding-input gradient: host scatter-add of dh rows
        dh_np = np.asarray(jax.device_get(dh), np.float32)
        g_emb = np.zeros_like(host["embeddings"], np.float32)
        np.add.at(g_emb, np.asarray(input_ids).reshape(-1),
                  dh_np.reshape(-1, dh_np.shape[-1]))
        if tied:
            g_emb += np.asarray(jax.device_get(g_table))
            self.opt.update_leaf(self.opt.mu["embeddings"],
                                 self.opt.nu["embeddings"],
                                 host["embeddings"], g_emb)
        else:
            self.opt.update_leaf(self.opt.mu["embeddings"],
                                 self.opt.nu["embeddings"],
                                 host["embeddings"], g_emb)
            self.opt.update_leaf(
                self.opt.mu["lm_head"]["kernel"],
                self.opt.nu["lm_head"]["kernel"],
                host["lm_head"]["kernel"],
                np.asarray(jax.device_get(g_table)).T)
        self.opt.update_leaf(self.opt.mu["norm_f"]["weight"],
                             self.opt.nu["norm_f"]["weight"],
                             host["norm_f"]["weight"],
                             np.asarray(jax.device_get(g_norm)))
        return float(loss)
