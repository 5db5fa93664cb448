"""pdrop over PACKED rows: each sample drops independently, like the
reference's pdrop_pack splitting by sample_seq_lens (modeling_nano.py:2097+)."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import tiny_nano_config
from timeviper_tpu.models.nano import init_nano_params, nano_forward
from timeviper_tpu.models.pdrop import make_pdrop_spec


def test_packed_pdrop_matches_per_sample():
    cfg = tiny_nano_config(use_pdrop=True, pdrop_type="uni_1_0.5")
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    D = cfg.hidden_size

    # sample A: 2 text + 4 visual + 3 text; sample B: 1 text + 8 visual + 2
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    emb_a = jax.random.normal(ka, (1, 9, D))
    emb_b = jax.random.normal(kb, (1, 11, D))

    spec_a = make_pdrop_spec([(2, 4, 3)], cfg.pdrop_stages)
    spec_b = make_pdrop_spec([(1, 8, 2)], cfg.pdrop_stages)
    out_a = nano_forward(params, cfg, inputs_embeds=emb_a, pdrop_spec=spec_a)
    out_b = nano_forward(params, cfg, inputs_embeds=emb_b, pdrop_spec=spec_b)

    packed = jnp.concatenate([emb_a, emb_b], axis=1)
    seq_idx = jnp.concatenate(
        [jnp.zeros((1, 9), jnp.int32), jnp.ones((1, 11), jnp.int32)], axis=1)
    spec_p = make_pdrop_spec([(2, 4, 3), (1, 8, 2)], cfg.pdrop_stages)
    out_p = nano_forward(params, cfg, inputs_embeds=packed, seq_idx=seq_idx,
                         pdrop_spec=spec_p)

    # after uni_1_0.5: A keeps 2 of 4 -> len 7; B keeps 4 of 8 -> len 7
    la = out_a["logits"].shape[1]
    lb = out_b["logits"].shape[1]
    assert la == 7 and lb == 7
    assert out_p["logits"].shape[1] == la + lb
    np.testing.assert_allclose(
        np.asarray(out_p["logits"][:, :la]), np.asarray(out_a["logits"]),
        rtol=3e-3, atol=3e-3)
    np.testing.assert_allclose(
        np.asarray(out_p["logits"][:, la:]), np.asarray(out_b["logits"]),
        rtol=3e-3, atol=3e-3)
