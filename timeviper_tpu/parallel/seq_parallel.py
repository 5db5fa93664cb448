"""Sequence-parallel long-context prefill over the `seq` mesh axis.

The capability the reference lacks (SURVEY.md §2.3, §5.7): it reaches 10k+
frames through compression only, never sharding the sequence. On TPU the
fused visual+text sequence shards cleanly over ICI:

* **Mamba/SSD layers** — chunk states compose associatively. Each device
  scans its local span with zero initial state (producing local outputs,
  its boundary state, and its total decay), then one `all_gather` of the
  tiny (B, H, P, N) boundary states lets every device compute its inbound
  state by a prefix product — an inter-chip associative scan. A cheap
  correction term (C_i · h_in · exp(local ΣdA)) fixes the local outputs.
  Communication per layer: ndev × state ≈ ndev × 4 MB, independent of L.
* **Attention layers** (4-6 of 52) — K/V are all-gathered across the seq
  axis; queries stay sharded (each device computes its rows of causal
  attention against global KV).
* Everything else is per-token and needs no communication.

The whole prefill runs inside ONE `shard_map` over (data, seq) so each
device executes the single-device Pallas/XLA kernels on its local span —
no GSPMD guessing on the scan structure.

Restriction: packed `seq_idx` is not supported here (long-video prefill is
a single segment); the packed-training path uses the unsharded forward.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.models.nano import (
    _apply_linear,
    compute_logits,
    mlp_mixer_forward,
)
from timeviper_tpu.ops.attention import attention, make_attention_mask
from timeviper_tpu.ops.conv import causal_conv1d
from timeviper_tpu.ops.norms import gated_rms_norm, rms_norm
from timeviper_tpu.ops.ssd import _process_dt
from timeviper_tpu.ops.ssd_pallas import ssd_auto


# ---------------------------------------------------------------------------
# Sequence-sharded SSD (runs INSIDE shard_map; axis_name = the seq axis)
# ---------------------------------------------------------------------------


def ssd_seq_sharded(
    x: jax.Array,      # (B, Lloc, H, P) local span
    dt: jax.Array,     # (B, Lloc, H)
    A: jax.Array,      # (H,)
    B_: jax.Array,     # (B, Lloc, G, N)
    C: jax.Array,      # (B, Lloc, G, N)
    *,
    axis_name: str,
    chunk_size: int,
    D: Optional[jax.Array],
    dt_bias: Optional[jax.Array],
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
) -> jax.Array:
    """Per-device SSD with cross-device state composition (see module doc)."""
    H = x.shape[2]

    # 1. local scan, zero init — ssd_auto: the compiled Pallas kernel on
    # TPU (shard_map bodies run per-device programs, so the kernel sees
    # only the local span), jnp chunked scan elsewhere
    y_local, state_local = ssd_auto(
        x, dt, A, B_, C, chunk_size=chunk_size, D=D, dt_bias=dt_bias,
        dt_softplus=dt_softplus, dt_limit=dt_limit,
        return_final_state=True,
    )

    # total decay over the local span, per head: exp(sum dA)
    dtf = _process_dt(dt, dt_bias, dt_softplus, dt_limit)  # (B, Lloc, H)
    dA_sum = jnp.einsum("blh,h->bh", dtf, A.astype(jnp.float32))
    local_decay = jnp.exp(dA_sum)  # (B, H)

    # 2. gather every device's (decay, state); prefix-compose to my inbound
    ndev = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    decays = jax.lax.all_gather(local_decay, axis_name)  # (ndev, B, H)
    states = jax.lax.all_gather(state_local, axis_name)  # (ndev, B, H, P, N)

    def compose(carry, inp):
        # carry: inbound state for device k; inp: (decay_k, state_k)
        d_k, s_k = inp
        return carry * d_k[..., None, None] + s_k, carry

    # scan over devices 0..ndev-1; carry entering device k = inbound state
    init = jnp.zeros_like(state_local)
    _, inbound_all = jax.lax.scan(compose, init, (decays, states))
    h_in = inbound_all[my]  # (B, H, P, N) state entering my span

    # 3. correction: y_i += C_i · h_in * exp(cumsum dA up to i, inclusive)
    dA_cum = jnp.cumsum(
        dtf * A.astype(jnp.float32)[None, None, :], axis=1
    )  # (B, Lloc, H)
    G = B_.shape[-2]
    Ch = jnp.repeat(C.astype(jnp.float32), H // G, axis=2)  # (B, Lloc, H, N)
    y_corr = jnp.einsum(
        "blhn,bhpn->blhp", Ch, h_in,
        precision=jax.lax.Precision.HIGHEST,
    ) * jnp.exp(dA_cum)[..., None]
    return (y_local.astype(jnp.float32) + y_corr).astype(x.dtype)


# ---------------------------------------------------------------------------
# Attention with all-gathered KV (inside shard_map)
# ---------------------------------------------------------------------------


def attention_seq_sharded(
    q: jax.Array,  # (B, Lloc, Hq, hd)
    k: jax.Array,  # (B, Lloc, Hkv, hd)
    v: jax.Array,
    *,
    axis_name: str,
    q_chunk: int = 1024,
) -> jax.Array:
    """Causal attention with local queries against all-gathered global KV.

    Long sequences stream the local queries in chunks (lax.map) so the
    (Lloc, L) score matrix never materializes whole — O(q_chunk · L)
    memory, which is what lets the 8k-tokens/device dryrun and CPU
    long-context fallback run at all."""
    B, Lloc = q.shape[:2]
    ndev = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    kg = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)  # (B, L, ...)
    vg = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    L = Lloc * ndev
    kv_pos = jnp.arange(L)
    if Lloc <= q_chunk or Lloc % q_chunk != 0:
        q_pos = my * Lloc + jnp.arange(Lloc)
        mask = q_pos[:, None] >= kv_pos[None, :]  # (Lloc, L) causal
        return attention(q, kg, vg, mask[None])

    nchunk = Lloc // q_chunk
    qc = q.reshape(B, nchunk, q_chunk, *q.shape[2:])
    qc = jnp.moveaxis(qc, 1, 0)  # (nchunk, B, q_chunk, Hq, hd)

    def one_chunk(args):
        qi, ci = args
        q_pos = my * Lloc + ci * q_chunk + jnp.arange(q_chunk)
        mask = q_pos[:, None] >= kv_pos[None, :]
        return attention(qi, kg, vg, mask[None])

    out = jax.lax.map(one_chunk, (qc, jnp.arange(nchunk)))
    return jnp.moveaxis(out, 0, 1).reshape(B, Lloc, *out.shape[3:])


# ---------------------------------------------------------------------------
# Full-model sequence-parallel prefill
# ---------------------------------------------------------------------------


def nano_prefill_seq_parallel(
    params: Dict[str, Any],
    cfg: NanoConfig,
    inputs_embeds: jax.Array,  # (B, L, D); L divisible by mesh seq size
    mesh: Mesh,
    *,
    logits_to_keep: int = 1,
):
    """Run the hybrid backbone prefill with the sequence sharded over the
    mesh's `seq` axis. Returns last-`logits_to_keep` logits (gathered)."""

    def local_forward(params, embeds):
        # embeds: (B, Lloc, D) — this device's span
        hidden = embeds
        B, Lloc, _ = hidden.shape
        d_inner = cfg.mamba_intermediate_size
        G, N, H, Pd = (cfg.mamba_n_groups, cfg.ssm_state_size,
                       cfg.mamba_num_heads, cfg.mamba_head_dim)
        for idx, block_type in enumerate(cfg.layers_block_type):
            lp = params["layers"][idx]
            res = hidden
            normed = rms_norm(hidden, lp["norm"]["weight"],
                              eps=cfg.layer_norm_epsilon)
            if block_type == "mamba":
                p = lp["mixer"]
                ip = p["in_proj"]
                gate = _apply_linear(ip["gate"], normed)
                xr = _apply_linear(ip["x"], normed)
                Br = _apply_linear(ip["B"], normed)
                Cr = _apply_linear(ip["C"], normed)
                dtr = _apply_linear(ip["dt"], normed)
                # NOTE: the depthwise conv (K=4) spans the device boundary by
                # K-1 tokens; exchange a 3-token halo with the left neighbor
                cv = p["conv1d"]
                xs = _halo_conv(xr, cv["x"], cfg, "seq")
                Bc = _halo_conv(Br, cv["B"], cfg, "seq")
                Cc = _halo_conv(Cr, cv["C"], cfg, "seq")
                y = ssd_seq_sharded(
                    xs.reshape(B, Lloc, H, Pd), dtr,
                    -jnp.exp(p["A_log"]),
                    Bc.reshape(B, Lloc, G, N), Cc.reshape(B, Lloc, G, N),
                    axis_name="seq", chunk_size=cfg.chunk_size,
                    D=p["D"], dt_bias=p["dt_bias"],
                    dt_limit=cfg.time_step_limit,
                )
                y = y.reshape(B, Lloc, d_inner)
                y = gated_rms_norm(
                    y, gate, p["norm"]["weight"],
                    eps=cfg.layer_norm_epsilon, group_size=d_inner // G,
                )
                out = _apply_linear(p["out_proj"], y)
            elif block_type == "attention":
                p = lp["mixer"]
                Hq, Hkv, hd = (cfg.num_attention_heads,
                               cfg.num_key_value_heads, cfg.head_dim)
                q = _apply_linear(p["q_proj"], normed).reshape(B, Lloc, Hq, hd)
                k = _apply_linear(p["k_proj"], normed).reshape(B, Lloc, Hkv, hd)
                v = _apply_linear(p["v_proj"], normed).reshape(B, Lloc, Hkv, hd)
                o = attention_seq_sharded(q, k, v, axis_name="seq")
                out = _apply_linear(p["o_proj"], o.reshape(B, Lloc, Hq * hd))
            else:
                out = mlp_mixer_forward(lp["mixer"], cfg, normed)
            hidden = res + out
        hidden = rms_norm(hidden, params["norm_f"]["weight"],
                          eps=cfg.layer_norm_epsilon)
        # last device holds the final tokens; gather the tail
        tail = hidden[:, -logits_to_keep:]
        tails = jax.lax.all_gather(tail, "seq")  # (ndev, B, k, D)
        return compute_logits(params, tails[-1])

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P("data", "seq", None)),
        out_specs=P("data"),
        check_rep=False,
    )
    return fn(params, inputs_embeds)


def encode_frames_seq_parallel(
    vparams: Dict[str, Any],
    pparams: Dict[str, Any],
    vcfg,
    pixels: jax.Array,  # (F, H, W, 3); F divisible by mesh seq size
    mesh: Mesh,
    *,
    projector_type: str = "tome_mlp",
    num_compressed_tokens: int = 16,
) -> jax.Array:
    """Vision encode + ToMe + projector sharded over the `seq` axis.

    ToMe merges within a frame (tome.py:86-177) and the projector is
    per-token, so the whole vision stage is frame-local: each device
    encodes its span of frames and emits its local span of fused visual
    tokens — the exact sharding `nano_prefill_seq_parallel` consumes, with
    ZERO collectives (the north star's "visual tokens over ICI",
    BASELINE.md). Returns (1, F*num_compressed_tokens, llm_dim) sharded
    along axis 1."""
    from jax.experimental.shard_map import shard_map

    from timeviper_tpu.models.projector import projector_forward
    from timeviper_tpu.models.vit import vit_forward

    def local(vp, pp, px):
        feats = vit_forward(vp, vcfg, px)  # (Floc, patches, vdim)
        proj = projector_forward(
            pp, feats, projector_type=projector_type,
            num_compressed_tokens=num_compressed_tokens)
        Floc, T_, D_ = proj.shape
        return proj.reshape(1, Floc * T_, D_)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("seq", None, None, None)),
        out_specs=P(None, "seq", None),
        check_rep=False,
    )
    return fn(vparams, pparams, pixels)


def _halo_conv(x, conv_params, cfg, axis_name):
    """Depthwise causal conv with a (K-1)-token halo from the left
    neighbor: shift the last K-1 tokens one device to the right, prepend,
    convolve, drop the halo."""
    K = cfg.mamba_d_conv
    halo = x[:, -(K - 1):, :]
    ndev = jax.lax.psum(1, axis_name)
    # send right: device i's halo -> device i+1
    perm = [(i, i + 1) for i in range(ndev - 1)]
    from_left = jax.lax.ppermute(halo, axis_name, perm)
    # device 0 receives zeros (causal left padding)
    my = jax.lax.axis_index(axis_name)
    from_left = jnp.where(my == 0, jnp.zeros_like(from_left), from_left)
    xp = jnp.concatenate([from_left, x], axis=1)
    y = causal_conv1d(
        xp, conv_params["weight"], conv_params["bias"],
        activation=cfg.mamba_hidden_act,
    )
    return y[:, K - 1:, :]
