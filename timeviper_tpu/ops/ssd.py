"""Mamba-2 SSD (state-space duality) scan.

This replaces the reference's external Triton kernels
``mamba_chunk_scan_combined`` / ``mamba_split_conv1d_scan_combined``
(reference: modeling_nano.py:61-65; algorithm spec: the pure-torch twin at
modeling_nano.py:671-860). Three implementations:

* :func:`ssd_reference` — O(L) sequential recurrence in float32. Slow but
  unambiguous; the test oracle.
* :func:`ssd_chunked`  — the blockwise (chunked) algorithm expressed in jnp:
  intra-chunk "attention" on the MXU + an inter-chunk associative scan over
  chunk-boundary states. XLA fuses this well; it is also the exact algorithm
  the Pallas kernel (ops/ssd_pallas.py) implements.
* :func:`ssd_update_step` — single-token decode update (replaces Triton
  ``selective_state_update``, reference decode path modeling_nano.py:528-539).

Shapes follow the Mamba-2 convention:
  x:  (B, L, H, P)   H = num heads, P = head dim
  dt: (B, L, H)      raw; softplus(dt + dt_bias) then clamp applied inside
  A:  (H,)           negative reals (caller passes -exp(A_log))
  B_: (B, L, G, N)   G = n_groups, N = state size
  C:  (B, L, G, N)
  D:  (H,) skip connection
  seq_idx: (B, L) int32 — packed-segment ids; the state is reset at segment
  boundaries (this honours seq_idx in *both* train and prefill paths, fixing
  the reference defect where prefill passed seq_idx=None, modeling_nano.py:648).

All internal math is float32 (matching the Triton kernels); outputs are cast
back to x.dtype.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# All SSD state math is float32. JAX's default matmul precision may truncate
# f32 operands to bf16 (3-pass) — unacceptable for the state recurrence, so
# every contraction here pins HIGHEST precision with f32 accumulation. With
# bf16 operands this costs nothing extra on the MXU.
_einsum = partial(
    jnp.einsum,
    precision=jax.lax.Precision.HIGHEST,
    preferred_element_type=jnp.float32,
)


def _process_dt(dt, dt_bias, dt_softplus, dt_limit):
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    lo, hi = dt_limit
    if lo > 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)
    return dt


def _expand_groups(t: jax.Array, num_heads: int) -> jax.Array:
    """(B, L, G, N) -> (B, L, H, N) by repeating each group H//G times."""
    B, L, G, N = t.shape
    rep = num_heads // G
    return jnp.repeat(t, rep, axis=2) if rep > 1 else t


def ssd_reference(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B_: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
    seq_idx: Optional[jax.Array] = None,
    initial_state: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sequential SSM recurrence; the correctness oracle.

    h_t = exp(dt_t * A) * h_{t-1} + dt_t * B_t x_t^T ;  y_t = C_t · h_t + D x_t

    Returns (y: (B,L,H,P) in x.dtype, final_state: (B,H,P,N) float32).
    """
    Bsz, L, H, P = x.shape
    N = B_.shape[-1]
    dtf = _process_dt(dt, dt_bias, dt_softplus, dt_limit)  # (B,L,H)
    xf = x.astype(jnp.float32)
    Bf = _expand_groups(B_.astype(jnp.float32), H)  # (B,L,H,N)
    Cf = _expand_groups(C.astype(jnp.float32), H)
    Af = A.astype(jnp.float32)  # (H,)

    if initial_state is None:
        h0 = jnp.zeros((Bsz, H, P, N), jnp.float32)
    else:
        h0 = initial_state.astype(jnp.float32)

    def step(h, inputs):
        xt, dtt, Bt, Ct, reset = inputs  # (B,H,P),(B,H),(B,H,N),(B,H,N),(B,)
        h = jnp.where(reset[:, None, None, None], 0.0, h)
        dA = jnp.exp(dtt * Af)  # (B,H)
        dBx = (dtt[..., None] * Bt)[:, :, None, :] * xt[..., None]  # (B,H,P,N)
        h = h * dA[:, :, None, None] + dBx
        y = _einsum("bhpn,bhn->bhp", h, Ct)
        return h, y

    if seq_idx is None:
        resets = jnp.zeros((L, Bsz), bool)
    else:
        prev = jnp.concatenate([seq_idx[:, :1], seq_idx[:, :-1]], axis=1)
        resets = jnp.swapaxes(seq_idx != prev, 0, 1)

    xs = (
        jnp.swapaxes(xf, 0, 1),
        jnp.swapaxes(dtf, 0, 1),
        jnp.swapaxes(Bf, 0, 1),
        jnp.swapaxes(Cf, 0, 1),
        resets,
    )
    hT, ys = jax.lax.scan(step, h0, xs)
    y = jnp.swapaxes(ys, 0, 1)  # (B,L,H,P)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None, :, None] * xf
    return y.astype(x.dtype), hT


def _segsum(a: jax.Array) -> jax.Array:
    """Stable "segment sum": out[..., i, j] = sum_{k=j+1..i} a[..., k] for
    j < i, 0 on the diagonal, -inf above. a: (..., T)."""
    T = a.shape[-1]
    cs = jnp.cumsum(a, axis=-1)
    out = cs[..., :, None] - cs[..., None, :]
    i = jnp.arange(T)
    mask = i[:, None] >= i[None, :]
    return jnp.where(mask, out, -jnp.inf)


def ssd_chunked(
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B_: jax.Array,
    C: jax.Array,
    chunk_size: int = 256,
    D: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
    seq_idx: Optional[jax.Array] = None,
    initial_state: Optional[jax.Array] = None,
    return_final_state: bool = True,
):
    """Chunked SSD scan (the `mamba_chunk_scan_combined` equivalent).

    The sequence is split into chunks of `chunk_size`. Within a chunk the
    output is a masked "attention" (C_i·B_j·exp(Acs_i−Acs_j)) computed on the
    MXU; across chunks, boundary states compose associatively and are combined
    with `jax.lax.associative_scan` — which is also how the multi-chip
    sequence-parallel prefill passes states over ICI.

    Returns y (B,L,H,P) and, if requested, final_state (B,H,P,N) float32.
    """
    Bsz, L, H, P = x.shape
    G, N = B_.shape[-2], B_.shape[-1]
    cs = chunk_size
    pad = (cs - L % cs) % cs
    Lp = L + pad

    dtf = _process_dt(dt, dt_bias, dt_softplus, dt_limit)  # (B,L,H)
    xf = x.astype(jnp.float32)
    Bf = B_.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    Af = A.astype(jnp.float32)

    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dtf = jnp.pad(dtf, ((0, 0), (0, pad), (0, 0)))
        Bf = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cf = jnp.pad(Cf, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if seq_idx is not None:
            # pad with the last segment id: padded x/dt are zero so they add
            # nothing, and the final state still reflects the last real token
            seq_idx = jnp.pad(seq_idx, ((0, 0), (0, pad)), mode="edge")

    nc = Lp // cs
    # chunked views
    xc = xf.reshape(Bsz, nc, cs, H, P)
    dtc = dtf.reshape(Bsz, nc, cs, H)
    Bc = Bf.reshape(Bsz, nc, cs, G, N)
    Cc = Cf.reshape(Bsz, nc, cs, G, N)

    dA = dtc * Af[None, None, None, :]  # (B,nc,cs,H) = dt*A per position
    # cumulative sum within chunk: (B,nc,H,cs)
    dA_h = jnp.moveaxis(dA, -1, 2)  # (B,nc,H,cs)
    A_cumsum = jnp.cumsum(dA_h, axis=-1)

    if seq_idx is not None:
        sc = seq_idx.reshape(Bsz, nc, cs)
        seg_last = sc[:, :, -1]  # (B,nc) segment id at chunk end
        # previous chunk's last segment id; first chunk gets its own first id
        seg_prev = jnp.concatenate([sc[:, :1, 0], seg_last[:, :-1]], axis=1)
    else:
        sc = seg_last = seg_prev = None

    # ---- 1. intra-chunk (diagonal blocks) -------------------------------
    # L_mat[b,c,h,i,j] = exp(Acs_i - Acs_j) for j <= i
    Lmat = jnp.exp(_segsum(dA_h))  # (B,nc,H,cs,cs)
    if sc is not None:
        same = (sc[:, :, :, None] == sc[:, :, None, :])[:, :, None]  # (B,nc,1,cs,cs)
        Lmat = jnp.where(same, Lmat, 0.0)
    # G[b,c,i,j,g] = C_i · B_j  (grouped); contract over N on the MXU
    CB = _einsum("bcign,bcjgn->bcgij", Cc, Bc)  # (B,nc,G,cs,cs)
    CB = jnp.repeat(CB, H // G, axis=2)  # (B,nc,H,cs,cs)
    M = CB * Lmat
    xdt = xc * dtc[..., None]  # (B,nc,cs,H,P) discretized inputs
    Y_diag = _einsum("bchij,bcjhp->bcihp", M, xdt)

    # ---- 2. chunk states (what each chunk contributes at its boundary) --
    decay_states = jnp.exp(A_cumsum[..., -1:] - A_cumsum)  # (B,nc,H,cs)
    if sc is not None:
        keep = (sc == seg_last[:, :, None])[:, :, None]  # (B,nc,1,cs)
        decay_states = decay_states * keep
    # states[b,c,h,p,n] = sum_j decay_j * dt_j * x_j[p] * B_j[n]
    Bh = jnp.repeat(Bc, H // G, axis=3) if G != H else Bc  # (B,nc,cs,H,N)
    w = jnp.moveaxis(decay_states, 2, -1)  # (B,nc,cs,H)
    states = _einsum("bcjhp,bcjhn->bchpn", xdt * w[..., None], Bh)

    # ---- 3. inter-chunk associative scan over boundary states -----------
    chunk_decay = jnp.exp(A_cumsum[..., -1])  # (B,nc,H)
    if sc is not None:
        # zero the carried state if chunk contains a boundary or starts one
        no_internal_boundary = (sc[:, :, 0] == seg_last) & (seg_prev == sc[:, :, 0])
        chunk_decay = chunk_decay * no_internal_boundary[..., None]

    def combine(a, b):
        # each element: (decay, state); composing two chunk transforms
        da, sa = a
        db, sb = b
        return da * db, sb + sa * db[..., None, None]

    init_state = (
        jnp.zeros((Bsz, H, P, N), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )
    # include initial state as a virtual chunk 0 contribution
    decays = jnp.concatenate(
        [jnp.ones((Bsz, 1, H), jnp.float32), chunk_decay], axis=1
    )
    sts = jnp.concatenate([init_state[:, None], states], axis=1)
    _, scanned = jax.lax.associative_scan(combine, (decays, sts), axis=1)
    # scanned[:, c] = state at the END of chunk c; the state ENTERING chunk c
    # is scanned[:, c-1] -> with the virtual chunk, entering chunk c (0-based
    # data chunk) is scanned[:, c].
    prev_states = scanned[:, :-1]  # (B,nc,H,P,N) state entering each chunk
    final_state = scanned[:, -1]

    # ---- 4. state -> output (off-diagonal contribution) ------------------
    state_decay_out = jnp.exp(A_cumsum)  # (B,nc,H,cs)
    if sc is not None:
        # position i in chunk c sees the inbound state only if its segment
        # continues from the previous chunk's end
        cont = sc == seg_prev[:, :, None]  # (B,nc,cs)
        state_decay_out = state_decay_out * cont[:, :, None]
    Ch = jnp.repeat(Cc, H // G, axis=3) if G != H else Cc  # (B,nc,cs,H,N)
    Y_off = _einsum("bcihn,bchpn->bcihp", Ch, prev_states)
    Y_off = Y_off * jnp.moveaxis(state_decay_out, 2, -1)[..., None]

    y = (Y_diag + Y_off).reshape(Bsz, Lp, H, P)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, None, :, None] * xf
    if pad:
        y = y[:, :L]
    y = y.astype(x.dtype)
    if return_final_state:
        return y, final_state
    return y


def ssd_update_step(
    ssm_state: jax.Array,
    x: jax.Array,
    dt: jax.Array,
    A: jax.Array,
    B_: jax.Array,
    C: jax.Array,
    D: Optional[jax.Array] = None,
    dt_bias: Optional[jax.Array] = None,
    dt_softplus: bool = True,
    dt_limit: Tuple[float, float] = (0.0, float("inf")),
) -> Tuple[jax.Array, jax.Array]:
    """Single-token decode update (selective_state_update equivalent).

    Args:
      ssm_state: (B, H, P, N) float32
      x: (B, H, P); dt: (B, H); A: (H,); B_, C: (B, G, N); D: (H,)
    Returns (y: (B, H, P) in x.dtype, new_state float32).
    """
    Bsz, H, P = x.shape
    G = B_.shape[1]
    dtf = _process_dt(dt, dt_bias, dt_softplus, dt_limit)  # (B,H)
    xf = x.astype(jnp.float32)
    Bf = jnp.repeat(B_.astype(jnp.float32), H // G, axis=1)  # (B,H,N)
    Cf = jnp.repeat(C.astype(jnp.float32), H // G, axis=1)
    dA = jnp.exp(dtf * A.astype(jnp.float32))  # (B,H)
    dBx = (dtf[..., None] * Bf)[:, :, None, :] * xf[..., None]  # (B,H,P,N)
    new_state = ssm_state * dA[:, :, None, None] + dBx
    y = _einsum("bhpn,bhn->bhp", new_state, Cf)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None] * xf
    return y.astype(x.dtype), new_state
