"""Sequence-parallel prefill over the `seq` mesh axis vs unsharded forward."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.nano import init_nano_params, nano_forward
from timeviper_tpu.parallel.seq_parallel import nano_prefill_seq_parallel
from timeviper_tpu.parallel.sharding import make_mesh


def test_seq_parallel_prefill_matches_unsharded():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    B, L = 1, 64  # 8 devices x 8 tokens/device
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, L, cfg.hidden_size))

    ref = nano_forward(params, cfg, inputs_embeds=embeds, logits_to_keep=4)

    mesh = make_mesh(data=1, model=1, seq=8)
    sp = nano_prefill_seq_parallel(
        params, cfg, embeds, mesh, logits_to_keep=4
    )
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref["logits"]), rtol=2e-3, atol=2e-3
    )


def test_seq_parallel_prefill_seq2():
    cfg = tiny_nano_config()
    params = init_nano_params(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    B, L = 2, 32
    embeds = jax.random.normal(jax.random.PRNGKey(4), (B, L, cfg.hidden_size))
    ref = nano_forward(params, cfg, inputs_embeds=embeds, logits_to_keep=1)
    mesh = make_mesh(data=2, model=1, seq=4)
    sp = nano_prefill_seq_parallel(params, cfg, embeds, mesh, logits_to_keep=1)
    np.testing.assert_allclose(
        np.asarray(sp), np.asarray(ref["logits"]), rtol=2e-3, atol=2e-3
    )
