"""SSD attention reconstruction: the materialized matrix must reproduce the
scan output when applied to x (the defining property, my_ssd_combined.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.nano import init_nano_params
from timeviper_tpu.ops.ssd import ssd_reference
from timeviper_tpu.visualize import collect_ssm_attention, ssd_attention_matrix


def test_attention_matrix_reproduces_scan():
    B, L, H, P, G, N = 1, 24, 4, 8, 2, 16
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(k[0], (B, L, H, P))
    dt = jax.random.normal(k[1], (B, L, H)) * 0.5
    A = -jnp.exp(jax.random.normal(k[2], (H,)))
    Bm = jax.random.normal(k[3], (B, L, G, N))
    Cm = jax.random.normal(k[4], (B, L, G, N))
    dtb = jnp.full((H,), 0.1)

    y, _ = ssd_reference(x, dt, A, Bm, Cm, dt_bias=dtb)  # no D skip
    attn = ssd_attention_matrix(dt, A, Bm, Cm, dt_bias=dtb)
    y_mat = jnp.einsum("bhij,bjhp->bihp", attn, x)
    np.testing.assert_allclose(
        np.asarray(y_mat), np.asarray(y), rtol=1e-3, atol=1e-3
    )


def test_head_slicing():
    B, L, H, G, N = 1, 12, 4, 2, 8
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    dt = jax.random.normal(k[0], (B, L, H)) * 0.5
    A = -jnp.exp(jax.random.normal(k[1], (H,)))
    Bm = jax.random.normal(k[2], (B, L, G, N))
    Cm = jax.random.normal(k[3], (B, L, G, N))
    full = ssd_attention_matrix(dt, A, Bm, Cm)
    sliced = ssd_attention_matrix(dt, A, Bm, Cm, heads=[1, 3])
    np.testing.assert_allclose(
        np.asarray(full[:, [1, 3]]), np.asarray(sliced), rtol=1e-5, atol=1e-6
    )


def test_collect_over_model_layers():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (1, 16, cfg.hidden_size))
    attns = collect_ssm_attention(params, cfg, embeds, heads=[0, 1])
    assert set(attns) == set(cfg.mamba_layer_indices)
    for a in attns.values():
        a = np.asarray(a)
        assert a.shape == (1, 2, 16, 16)
        # strictly causal-triangular
        assert np.allclose(a[..., *np.triu_indices(16, 1)], 0.0)
