"""pdrop/TransV inside the sequence-sharded prefill (VERDICT r2 ask #5).

The sharded implementation is MASKED: dropped tokens stay in their slots
but become exact no-ops (conv compacts over valid tokens via
_compact_conv, SSD zeroes their dt, attention masks them from KV). Since
nano attention has no RoPE, a masked forward computes the same function
as the reference's physical compaction — asserted here against the
single-chip pdrop prefill (models/pdrop.py), stage ranking, TransV merge,
decode-time ca-KV and all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timeviper_tpu.config import NanoConfig
from timeviper_tpu.models.nano import (
    init_nano_params,
    nano_decode_step,
    nano_forward,
)
from timeviper_tpu.models.pdrop import init_merge_modules, make_pdrop_spec
from timeviper_tpu.parallel.seq_parallel import nano_prefill_seq_parallel
from timeviper_tpu.parallel.sharding import make_mesh


def _cfg(pdrop_type, merge="CrossAttention"):
    return NanoConfig(
        vocab_size=256,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=6,
        hybrid_override_pattern="M-M*M-",
        num_attention_heads=2,
        head_dim=16,
        num_key_value_heads=1,
        ssm_state_size=16,
        mamba_num_heads=4,
        mamba_n_groups=2,
        mamba_head_dim=8,
        chunk_size=16,
        use_pdrop=True,
        pdrop_type=pdrop_type,
        merge_module=merge,
    )


@pytest.mark.parametrize("pdrop_type,merge", [
    ("uni_2_0.5", "no_merge"),
    # attn ranking uses the stage layer's q/k — layer 3 is the attention
    # layer of the "M-M*M-" pattern
    ("uni_1_0.5-attn_3_0.25", "CrossAttention"),
    ("attn_3_0.5", "CrossAttention"),
])
def test_sharded_pdrop_matches_unsharded(pdrop_type, merge):
    cfg = _cfg(pdrop_type, merge)
    params = init_nano_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    merge_params = init_merge_modules(jax.random.PRNGKey(1), cfg,
                                     dtype=jnp.float32)
    if merge_params is not None:
        # nonzero alpha so the TransV path actually contributes
        merge_params = [
            dict(m, alpha=jnp.asarray(0.7, jnp.float32))
            if m is not None else None for m in merge_params
        ]
    mesh = make_mesh(data=1, seq=8)

    vs, nv, ts = 7, 32, 9  # prefix text | visual | suffix text
    L_real = vs + nv + ts
    pad = 8 * ((L_real + 7) // 8) - L_real + 8  # left-pad to a multiple of 8
    L = L_real + pad
    embeds_real = jax.random.normal(
        jax.random.PRNGKey(2), (1, L_real, cfg.hidden_size), jnp.float32)
    embeds_pad = jnp.concatenate(
        [jnp.full((1, pad, cfg.hidden_size), 5.0), embeds_real], axis=1)
    cache_len = L + 8
    qpos = L_real - 1

    spec = make_pdrop_spec([(vs, nv, ts)], cfg.pdrop_stages,
                           query_positions=[qpos])
    ref = nano_forward(
        params, cfg, inputs_embeds=embeds_real,
        pdrop_spec=spec, pdrop_params=merge_params,
        fill_cache=True, cache_max_len=cache_len, logits_to_keep=1)

    logits_sp, cache_sp = nano_prefill_seq_parallel(
        params, cfg, embeds_pad, mesh, logits_to_keep=1,
        valid_from=pad, fill_cache=True, cache_max_len=cache_len,
        cache_dtype=jnp.float32,
        use_pdrop=True,
        pdrop_vision_start=pad + vs,
        pdrop_num_vision=nv,
        pdrop_query_pos=pad + qpos,
        merge_params=merge_params,
    )

    np.testing.assert_allclose(
        np.asarray(logits_sp[:, -1]), np.asarray(ref["logits"][:, -1]),
        rtol=3e-4, atol=3e-4)

    # SSM states match: masked drops were exact no-ops in the scan
    for idx, bt in enumerate(cfg.layers_block_type):
        if bt == "mamba":
            np.testing.assert_allclose(
                np.asarray(cache_sp["layers"][idx]["ssm_state"]),
                np.asarray(ref["cache"]["layers"][idx]["ssm_state"]),
                rtol=3e-4, atol=3e-4)

    # decode continues identically (incl. decode-time TransV re-merge)
    step = jax.jit(lambda p, t, c: nano_decode_step(
        p, cfg, t, c, pdrop_params=merge_params))
    tok_ref = jnp.argmax(ref["logits"][:, -1], -1)[:, None].astype(jnp.int32)
    tok_sp = jnp.argmax(logits_sp[:, -1], -1)[:, None].astype(jnp.int32)
    assert int(tok_ref[0, 0]) == int(tok_sp[0, 0])
    cache_ref = ref["cache"]
    for _ in range(4):
        lr, cache_ref = step(params, tok_ref, cache_ref)
        ls, cache_sp = step(params, tok_sp, cache_sp)
        np.testing.assert_allclose(
            np.asarray(ls), np.asarray(lr), rtol=5e-4, atol=5e-4)
        tok_ref = jnp.argmax(lr, -1)[:, None].astype(jnp.int32)
        tok_sp = jnp.argmax(ls, -1)[:, None].astype(jnp.int32)
        assert int(tok_ref[0, 0]) == int(tok_sp[0, 0])
