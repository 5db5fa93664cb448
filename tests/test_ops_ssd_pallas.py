"""Pallas SSD kernel vs the jnp chunked-scan oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timeviper_tpu.ops.ssd import ssd_chunked
from timeviper_tpu.ops.ssd_pallas import ssd_pallas


def _inputs(B=2, L=40, H=8, P=16, G=2, N=32, dtype=jnp.float32):
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    return (
        jax.random.normal(k[0], (B, L, H, P), dtype),
        jax.random.normal(k[1], (B, L, H), dtype) * 0.5,
        -jnp.exp(jax.random.normal(k[2], (H,))),
        jax.random.normal(k[3], (B, L, G, N), dtype),
        jax.random.normal(k[4], (B, L, G, N), dtype),
    )


def test_pallas_matches_chunked():
    x, dt, A, Bm, Cm = _inputs()
    D = jnp.ones((x.shape[2],))
    dtb = jnp.full((x.shape[2],), 0.1)
    yr, hr = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=16, D=D, dt_bias=dtb)
    yp, hp = ssd_pallas(x, dt, A, Bm, Cm, chunk_size=16, D=D, dt_bias=dtb,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hp),
                               rtol=1e-4, atol=1e-4)


def test_pallas_packed_segments():
    x, dt, A, Bm, Cm = _inputs()
    B, L = x.shape[:2]
    seq = jnp.concatenate(
        [jnp.zeros((B, 13), jnp.int32), jnp.ones((B, L - 13), jnp.int32)],
        axis=1,
    )
    yr, hr = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=16, seq_idx=seq)
    yp, hp = ssd_pallas(x, dt, A, Bm, Cm, chunk_size=16, seq_idx=seq,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hp),
                               rtol=1e-4, atol=1e-4)


def test_pallas_unpadded_multichunk():
    # L an exact multiple of chunk_size — no padding path
    x, dt, A, Bm, Cm = _inputs(L=48)
    yr, hr = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=16)
    yp, hp = ssd_pallas(x, dt, A, Bm, Cm, chunk_size=16, interpret=True)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hp),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("L,packed", [(512, False), (512, True),
                                      (500, False), (500, True)])
def test_pallas_backward_kernel_matches_autodiff(L, packed):
    """The hand-derived reverse-chunk backward kernel (interpret mode)
    against jax.grad of the jnp oracle — all 7 gradients, incl. packed
    segments and non-multiple-of-chunk padding."""
    from timeviper_tpu.ops.ssd_pallas import _ssd_pallas_bwd, _ssd_pallas_fwd

    B, H, P, G, N, cs = 1, 4, 32, 2, 64, 256
    k = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(k[0], (B, L, H, P), jnp.float32)
    dt = jax.random.normal(k[1], (B, L, H)) * 0.5
    A = -jnp.exp(jax.random.normal(k[2], (H,)))
    Bm = jax.random.normal(k[3], (B, L, G, N))
    Cm = jax.random.normal(k[4], (B, L, G, N))
    D = jax.random.normal(k[5], (H,))
    dtb = jax.random.normal(k[6], (H,)) * 0.1
    seq = (jnp.arange(L)[None] // max(L // 3, 1)).astype(jnp.int32) \
        if packed else None
    gy = jax.random.normal(jax.random.PRNGKey(9), (B, L, H, P), jnp.float32)
    gst = jax.random.normal(jax.random.PRNGKey(10), (B, H, P, N), jnp.float32)

    def ref(x, dt, A, Bm, Cm, D, dtb):
        y, st = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=cs, D=D,
                            dt_bias=dtb, seq_idx=seq, return_final_state=True)
        return (y.astype(jnp.float32) * gy).sum() + (st * gst).sum()

    want = jax.grad(ref, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, dt, A, Bm, Cm, D, dtb)
    _, _, hin = _ssd_pallas_fwd(
        x, dt, A, Bm, Cm, cs, D, dtb, True, (0.0, float("inf")), seq,
        interpret=True, save_prev=True)
    got = _ssd_pallas_bwd(
        x, dt, A, Bm, Cm, D, dtb, seq, hin, gy, gst, cs, True,
        (0.0, float("inf")), interpret=True)
    for name, gw, gg in zip(
            ("dx", "ddt", "dA", "dB", "dC", "dD", "ddt_bias"), want, got):
        gw = np.asarray(gw, np.float64)
        gg = np.asarray(gg, np.float64)
        rms = np.sqrt((gw**2).mean()) or 1.0
        rel = np.sqrt(((gg - gw) ** 2).mean()) / rms
        assert rel < 1e-4, (name, rel)


def test_pallas_backward_dt_limit_clip():
    """dt_limit clipping must zero the dt gradient where saturated."""
    from timeviper_tpu.ops.ssd_pallas import _ssd_pallas_bwd, _ssd_pallas_fwd

    B, L, H, P, G, N, cs = 1, 256, 2, 32, 1, 32, 256
    lim = (0.01, 0.5)
    k = jax.random.split(jax.random.PRNGKey(3), 5)
    x = jax.random.normal(k[0], (B, L, H, P), jnp.float32)
    dt = jax.random.normal(k[1], (B, L, H)) * 2.0  # saturates both ends
    A = -jnp.exp(jax.random.normal(k[2], (H,)))
    Bm = jax.random.normal(k[3], (B, L, G, N))
    Cm = jax.random.normal(k[4], (B, L, G, N))
    gy = jax.random.normal(jax.random.PRNGKey(9), (B, L, H, P), jnp.float32)
    gst = jnp.zeros((B, H, P, N), jnp.float32)

    def ref(x, dt, Bm, Cm):
        y, _ = ssd_chunked(x, dt, A, Bm, Cm, chunk_size=cs, dt_limit=lim,
                           return_final_state=True)
        return (y.astype(jnp.float32) * gy).sum()

    want = jax.grad(ref, argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)
    _, _, hin = _ssd_pallas_fwd(
        x, dt, A, Bm, Cm, cs, None, None, True, lim, None,
        interpret=True, save_prev=True)
    got = _ssd_pallas_bwd(
        x, dt, A, Bm, Cm, jnp.zeros((H,)), jnp.zeros((H,)), None, hin,
        gy, gst, cs, True, lim, interpret=True)
    for name, gw, gg in zip(("dx", "ddt"), (want[0], want[1]),
                            (got[0], got[1])):
        gw = np.asarray(gw, np.float64)
        gg = np.asarray(gg, np.float64)
        rms = np.sqrt((gw**2).mean()) or 1.0
        assert np.sqrt(((gg - gw) ** 2).mean()) / rms < 1e-4, name


@pytest.mark.parametrize("L,packed", [(512, False), (500, True)])
def test_fused_conv_scan_matches_separate(L, packed):
    """ssd_conv_scan_fused (in-kernel conv+SiLU, halo carry, segment
    masking) == causal_conv1d -> ssd_chunked."""
    from timeviper_tpu.ops.conv import causal_conv1d
    from timeviper_tpu.ops.ssd_pallas import ssd_conv_scan_fused

    B, H, P, G, N, K = 1, 4, 32, 2, 64, 4
    d_inner, gn = H * P, G * N
    k = jax.random.split(jax.random.PRNGKey(0), 9)
    xr = jax.random.normal(k[0], (B, L, d_inner), jnp.float32)
    Br = jax.random.normal(k[1], (B, L, gn), jnp.float32)
    Cr = jax.random.normal(k[2], (B, L, gn), jnp.float32)
    dt = jax.random.normal(k[3], (B, L, H)) * 0.5
    A = -jnp.exp(jax.random.normal(k[4], (H,)))
    D = jax.random.normal(k[5], (H,))
    dtb = jax.random.normal(k[6], (H,)) * 0.1
    wx = jax.random.normal(k[7], (d_inner, K)) * 0.3
    wB = jax.random.normal(k[8], (gn, K)) * 0.3
    wC = jnp.roll(wB, 1, axis=0) * 0.7
    bx = jnp.linspace(-0.1, 0.1, d_inner)
    bB = jnp.linspace(0.1, -0.1, gn)
    seq = (jnp.arange(L)[None] // max(L // 3, 1)).astype(jnp.int32) \
        if packed else None

    xs = causal_conv1d(xr, wx, bx, activation="silu", seq_idx=seq)
    Bs = causal_conv1d(Br, wB, bB, activation="silu", seq_idx=seq)
    Cs = causal_conv1d(Cr, wC, None, activation="silu", seq_idx=seq)
    want_y, want_st = ssd_chunked(
        xs.reshape(B, L, H, P), dt, A, Bs.reshape(B, L, G, N),
        Cs.reshape(B, L, G, N), chunk_size=128, D=D, dt_bias=dtb,
        seq_idx=seq, return_final_state=True)

    got_y, got_st = ssd_conv_scan_fused(
        xr.reshape(B, L, H, P), dt, A, Br.reshape(B, L, G, N),
        Cr.reshape(B, L, G, N),
        {"wx": wx, "bx": bx, "wB": wB, "bB": bB, "wC": wC, "bC": None},
        chunk_size=128, D=D, dt_bias=dtb, seq_idx=seq, interpret=True)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got_st), np.asarray(want_st),
                               rtol=3e-4, atol=3e-4)
