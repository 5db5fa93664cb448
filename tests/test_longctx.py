"""Chunked long-context prefill == the plain forward, exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.longctx import nano_forward_longctx
from timeviper_tpu.models.nano import init_nano_params, nano_forward


def test_longctx_matches_plain_forward():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L = 96
    embeds = jax.random.normal(jax.random.PRNGKey(1),
                               (1, L, cfg.hidden_size), jnp.float32)
    want = nano_forward(params, cfg, inputs_embeds=embeds)["logits"]
    got = nano_forward_longctx(params, cfg, embeds, chunk_tokens=32,
                               logits_to_keep=0)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_longctx_with_pdrop_matches_plain():
    from timeviper_tpu.models.pdrop import make_pdrop_spec

    cfg = tiny_nano_config(use_pdrop=True, pdrop_type="uni_1_0.5")
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L = 96
    embeds = jax.random.normal(jax.random.PRNGKey(1),
                               (1, L, cfg.hidden_size), jnp.float32)
    spec = make_pdrop_spec([(8, 64, 24)], cfg.pdrop_stages)
    want = nano_forward(params, cfg, inputs_embeds=embeds,
                        pdrop_spec=spec, logits_to_keep=1)["logits"]
    got = nano_forward_longctx(params, cfg, embeds, chunk_tokens=32,
                               pdrop_spec=spec, logits_to_keep=1)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_longctx_pdrop_nondivisible_length():
    """After pdrop the length may stop dividing chunk_tokens; layers must
    still chunk (largest divisor) and attention must stay O(L)."""
    from timeviper_tpu.models.pdrop import make_pdrop_spec

    cfg = tiny_nano_config(use_pdrop=True, pdrop_type="uni_1_0.5")
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    L = 96
    embeds = jax.random.normal(jax.random.PRNGKey(1),
                               (1, L, cfg.hidden_size), jnp.float32)
    # 30 visual tokens -> keep 15 -> L becomes 81 (odd)
    spec = make_pdrop_spec([(8, 30, 58)], cfg.pdrop_stages)
    want = nano_forward(params, cfg, inputs_embeds=embeds,
                        pdrop_spec=spec, logits_to_keep=1)["logits"]
    got = nano_forward_longctx(params, cfg, embeds, chunk_tokens=32,
                               pdrop_spec=spec, logits_to_keep=1)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
