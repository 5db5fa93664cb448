"""Decode-path parity at the 9B group topology (n_groups > 1).

The reference's full-sequence torch oracle maps head h to B/C group
`h mod n_groups` while the production Triton kernels and the reference's
own DECODE path (modeling_nano.py:737-739, expand+reshape) map
`h // (H/G)` — for n_groups > 1 the oracle computes a different function
(SURVEY.md "known defects"), which is why the round-1 parity suite pinned
n_groups=1. The decode path is clean, so this suite steps the reference
token-by-token through its cache path at H/G = 16/8 (the 9B ratio) and
requires per-step logits parity.

Token 0 must still flow through the reference's broken prefill oracle (it
initializes the cache); to avoid inheriting that defect, the reference's
post-token-0 cache is CONVERTED into our cache layout and both sides then
step tokens 1..N independently.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

GEOM = dict(mamba_num_heads=16, mamba_head_dim=8, n_groups=8,
            ssm_state_size=16)


def _our_cfg():
    from timeviper_tpu.config import tiny_nano_config

    return tiny_nano_config(
        mamba_num_heads=16, mamba_head_dim=8, mamba_n_groups=8,
        ssm_state_size=16)


def _import_ref_cache_cls():
    import nano.modeling_nano as mn

    return mn.HybridMambaAttentionDynamicCache


def _convert_ref_cache(cache, cfg, max_len):
    """Reference HybridMambaAttentionDynamicCache -> our fixed-shape cache
    pytree. Conv states store the last K raw [x|B|C] inputs oldest-first in
    both (modeling_nano.py:717-730 vs ops/conv.py)."""
    layers = []
    d_inner = cfg.mamba_intermediate_size
    gn = cfg.mamba_n_groups * cfg.ssm_state_size
    length = 1
    for i, bt in enumerate(cfg.layers_block_type):
        if bt == "mamba":
            conv = cache.conv_states[i].numpy()  # (B, d_inner+2gn, K)
            layers.append({
                "conv_state": {
                    "x": jnp.asarray(conv[:, :d_inner]),
                    "B": jnp.asarray(conv[:, d_inner:d_inner + gn]),
                    "C": jnp.asarray(conv[:, d_inner + gn:]),
                },
                "ssm_state": jnp.asarray(
                    cache.ssm_states[i].numpy().astype(np.float32)),
            })
        elif bt == "attention":
            k = cache.key_cache[i].numpy()  # (B, Hkv, T, hd)
            v = cache.value_cache[i].numpy()
            T = k.shape[2]
            pad = max_len - T
            k = np.transpose(k, (0, 2, 1, 3))
            v = np.transpose(v, (0, 2, 1, 3))
            layers.append({
                "k": jnp.asarray(np.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))),
                "v": jnp.asarray(np.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))),
            })
        else:
            layers.append({})
    return {"layers": layers,
            "length": jnp.asarray(length, jnp.int32),
            "valid_from": jnp.asarray(0, jnp.int32)}


def test_decode_parity_ngroups8_vs_reference_cache_path():
    from tests.ref_stubs import build_ref_nano

    model = build_ref_nano(use_cache=True, **GEOM)
    cache_cls = _import_ref_cache_cls()
    cfg_t = model.config
    cache = cache_cls(cfg_t, 1, dtype=torch.float32)

    torch.manual_seed(1)
    ids = torch.randint(3, 500, (1, 9))
    with torch.no_grad():
        out = model(input_ids=ids[:, :1], use_cache=True,
                    past_key_values=cache,
                    cache_position=torch.arange(0, 1))
    cache = out.past_key_values

    # As-shipped defect: the decode branch reads `ssm_states.device` but
    # ssm_states is a python list (modeling_nano.py:718 — dead code on GPU
    # where the Triton path runs). Give the list a device attribute.
    class _DeviceList(list):
        @property
        def device(self):
            return torch.device("cpu")

    cache.ssm_states = _DeviceList(cache.ssm_states)

    # ---- our side: converted params + converted post-token-0 cache ----
    from timeviper_tpu.models.nano import nano_decode_step
    from timeviper_tpu.train.convert import convert_nano

    cfg = _our_cfg()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    max_len = 32
    our_cache = _convert_ref_cache(cache, cfg, max_len)

    step = jax.jit(lambda p, t, c: nano_decode_step(p, cfg, t, c))
    for t in range(1, ids.shape[1]):
        with torch.no_grad():
            out = model(input_ids=ids[:, t:t + 1], use_cache=True,
                        past_key_values=cache,
                        cache_position=torch.arange(t, t + 1))
        cache = out.past_key_values
        ref_logits = out.logits[:, -1].numpy()

        our_logits, our_cache = step(
            params, jnp.asarray(ids[:, t:t + 1].numpy()), our_cache)
        np.testing.assert_allclose(
            np.asarray(our_logits), ref_logits, rtol=3e-4, atol=3e-4,
            err_msg=f"step {t}")
    # greedy agreement over the whole stepped run
    assert np.asarray(our_logits).argmax(-1).tolist() == \
        ref_logits.argmax(-1).tolist()
