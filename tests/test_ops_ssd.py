"""SSD scan: chunked (fast path) must match the sequential oracle.

Mirrors the reference's validation strategy of slow-twin oracles
(SURVEY.md §4: torch_forward vs cuda_kernels_forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timeviper_tpu.ops.ssd import ssd_chunked, ssd_reference, ssd_update_step


def make_inputs(key, Bsz=2, L=70, H=8, P=8, G=2, N=16, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (Bsz, L, H, P), dtype)
    dt = jax.random.normal(ks[1], (Bsz, L, H), dtype) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (H,)) * 0.5)
    B_ = jax.random.normal(ks[3], (Bsz, L, G, N), dtype) * 0.3
    C = jax.random.normal(ks[4], (Bsz, L, G, N), dtype) * 0.3
    D = jax.random.normal(ks[5], (H,))
    dt_bias = jnp.linspace(-0.5, 0.5, H)
    return x, dt, A, B_, C, D, dt_bias


@pytest.mark.parametrize("L,chunk", [(64, 16), (70, 16), (13, 16), (128, 32)])
def test_chunked_matches_reference(L, chunk):
    x, dt, A, B_, C, D, dt_bias = make_inputs(jax.random.PRNGKey(0), L=L)
    y_ref, h_ref = ssd_reference(x, dt, A, B_, C, D=D, dt_bias=dt_bias)
    y, h = ssd_chunked(x, dt, A, B_, C, chunk_size=chunk, D=D, dt_bias=dt_bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=2e-4, atol=2e-4)


def test_chunked_matches_reference_with_segments():
    x, dt, A, B_, C, D, dt_bias = make_inputs(jax.random.PRNGKey(1), Bsz=1, L=96)
    # three packed segments with boundaries off chunk edges
    seq_idx = jnp.concatenate(
        [jnp.zeros((1, 25), jnp.int32), jnp.ones((1, 40), jnp.int32),
         jnp.full((1, 31), 2, jnp.int32)], axis=1)
    y_ref, _ = ssd_reference(x, dt, A, B_, C, D=D, dt_bias=dt_bias, seq_idx=seq_idx)
    y, _ = ssd_chunked(x, dt, A, B_, C, chunk_size=16, D=D, dt_bias=dt_bias,
                       seq_idx=seq_idx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-4)
    # segment isolation: recomputing segment 1 alone must give identical output
    y_seg, _ = ssd_chunked(x[:, 25:65], dt[:, 25:65], A, B_[:, 25:65], C[:, 25:65],
                           chunk_size=16, D=D, dt_bias=dt_bias)
    np.testing.assert_allclose(np.asarray(y[:, 25:65]), np.asarray(y_seg),
                               rtol=2e-4, atol=2e-4)


def test_decode_step_matches_reference():
    x, dt, A, B_, C, D, dt_bias = make_inputs(jax.random.PRNGKey(2), L=33)
    Bsz, L, H, P = x.shape
    N = B_.shape[-1]
    y_ref, _ = ssd_reference(x, dt, A, B_, C, D=D, dt_bias=dt_bias)
    # prefill the first L-8 tokens chunked, then decode the rest stepwise
    Lp = L - 8
    y_pre, h = ssd_chunked(x[:, :Lp], dt[:, :Lp], A, B_[:, :Lp], C[:, :Lp],
                           chunk_size=16, D=D, dt_bias=dt_bias)
    ys = [y_pre]
    for t in range(Lp, L):
        y_t, h = ssd_update_step(h, x[:, t], dt[:, t], A, B_[:, t], C[:, t],
                                 D=D, dt_bias=dt_bias)
        ys.append(y_t[:, None])
    y = jnp.concatenate(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=3e-4, atol=3e-4)


def test_initial_state_continuation():
    """Chunked prefill split in two with state carry == single prefill."""
    x, dt, A, B_, C, D, dt_bias = make_inputs(jax.random.PRNGKey(3), L=80)
    y_full, h_full = ssd_chunked(x, dt, A, B_, C, chunk_size=16, D=D, dt_bias=dt_bias)
    y1, h1 = ssd_chunked(x[:, :48], dt[:, :48], A, B_[:, :48], C[:, :48],
                         chunk_size=16, D=D, dt_bias=dt_bias)
    y2, h2 = ssd_chunked(x[:, 48:], dt[:, 48:], A, B_[:, 48:], C[:, 48:],
                         chunk_size=16, D=D, dt_bias=dt_bias, initial_state=h1)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([y1, y2], 1)),
                               np.asarray(y_full), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full), rtol=2e-4, atol=2e-4)


def test_bf16_inputs():
    x, dt, A, B_, C, D, dt_bias = make_inputs(
        jax.random.PRNGKey(4), L=64, dtype=jnp.bfloat16)
    y, _ = ssd_chunked(x, dt, A, B_, C, chunk_size=16, D=D, dt_bias=dt_bias)
    assert y.dtype == jnp.bfloat16
    y_ref, _ = ssd_reference(x, dt, A, B_, C, D=D, dt_bias=dt_bias)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref, np.float32),
        rtol=0.1, atol=0.1)


def test_fused_mamba_decode_matches_unfused():
    """ops/decode_fused.py (interpret mode) vs the unfused decode ops at
    the production group topology (per-group channel blocks 128-aligned)."""
    import jax

    from timeviper_tpu.config import NanoConfig
    from timeviper_tpu.ops.conv import causal_conv1d_update
    from timeviper_tpu.ops.decode_fused import fused_mamba_decode
    from timeviper_tpu.ops.norms import gated_rms_norm
    from timeviper_tpu.ops.ssd import ssd_update_step

    cfg = NanoConfig(hidden_size=256, mamba_num_heads=16, mamba_head_dim=16,
                     mamba_n_groups=2, ssm_state_size=128, vocab_size=64,
                     num_hidden_layers=1, hybrid_override_pattern="M")
    G, N, H, P = 2, 128, 16, 16
    d_inner, gn, K = H * P, G * N, cfg.mamba_d_conv
    k = jax.random.split(jax.random.PRNGKey(0), 12)
    B = 2
    xr = jax.random.normal(k[0], (B, d_inner), jnp.float32)
    Br = jax.random.normal(k[1], (B, gn), jnp.float32)
    Cr = jax.random.normal(k[2], (B, gn), jnp.float32)
    dt = jax.random.normal(k[3], (B, H), jnp.float32) * 0.5
    gate = jax.random.normal(k[4], (B, d_inner), jnp.float32)
    cs = {"x": jax.random.normal(k[5], (B, d_inner, K), jnp.float32),
          "B": jax.random.normal(k[6], (B, gn, K), jnp.float32),
          "C": jax.random.normal(k[7], (B, gn, K), jnp.float32)}
    ssm = jax.random.normal(k[8], (B, H, P, N), jnp.float32) * 0.3
    params = {
        "conv1d": {n: {"weight": jax.random.normal(kk, (c, K), jnp.float32)
                       * 0.3,
                       "bias": jnp.linspace(-0.1, 0.1, c)}
                   for n, c, kk in (("x", d_inner, k[9]), ("B", gn, k[10]),
                                    ("C", gn, k[11]))},
        "A_log": jnp.linspace(-1.0, 0.5, H),
        "D": jnp.linspace(0.5, 1.5, H),
        "dt_bias": jnp.linspace(-0.2, 0.2, H),
        "norm": {"weight": jnp.linspace(0.8, 1.2, d_inner)},
    }

    from timeviper_tpu.ops.ssd import _process_dt

    cv = params["conv1d"]
    B_, _ = causal_conv1d_update(Br, cs["B"], cv["B"]["weight"],
                                 cv["B"]["bias"], "silu")
    C_, _ = causal_conv1d_update(Cr, cs["C"], cv["C"]["weight"],
                                 cv["C"]["bias"], "silu")
    dtf = _process_dt(dt, params["dt_bias"], True, cfg.time_step_limit)
    y_f, cs_f, ssm_f = fused_mamba_decode(
        xr, B_, C_, dtf, gate, cs["x"], ssm, params, n_groups=G,
        head_dim=P, eps=cfg.layer_norm_epsilon, interpret=True)

    xs, cs_x = causal_conv1d_update(xr, cs["x"], cv["x"]["weight"],
                                    cv["x"]["bias"], "silu")
    y, ssm2 = ssd_update_step(
        ssm, xs.reshape(B, H, P), dt, -jnp.exp(params["A_log"]),
        B_.reshape(B, G, N), C_.reshape(B, G, N), D=params["D"],
        dt_bias=params["dt_bias"], dt_softplus=True,
        dt_limit=cfg.time_step_limit)
    y = gated_rms_norm(y.reshape(B, d_inner), gate, params["norm"]["weight"],
                       eps=cfg.layer_norm_epsilon, group_size=d_inner // G)

    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ssm_f), np.asarray(ssm2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cs_f), np.asarray(cs_x),
                               rtol=1e-6, atol=1e-6)
