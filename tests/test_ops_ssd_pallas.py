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
