"""Full-width live-torch parity at the PRODUCTION 9B layer geometry.

Prior live parity ran at toy widths (hidden≈64, n_groups=1, where the
reference oracle's group-mapping defect is moot). This suite runs the
actual reference torch model (CPU, f32) at the real Nemotron-Nano-9B-v2
layer geometry — hidden 4096, d_inner 8192, H=128 mamba heads × P=64,
G=8 groups, N=128 state, GQA 32q/8kv × head_dim 128, MLP 21504
(reference configuration_nano.py:133-180) — one layer of each type
(M / * / -) in one 3-layer model, plus a reduced-width model with the
FULL 52-layer hybrid pattern stepped through prefill + decode.

Group-mapping note (SURVEY.md "known defects"): the reference
full-sequence oracle maps head h to B/C group `h mod G` via
`B.repeat(1, 1, H//G, 1)` (modeling_nano.py:784-785) while its own decode
path (:737-739, expand+reshape) and the production mamba-ssm Triton
kernels map `h // (H/G)`. For G>1 parity against the *production*
function, `production_group_mapping()` patches exactly those two tiled
repeats to interleaves. This turns the round-1 "verified manually" claim
into a test.

The 3-layer forward at production width allocates ~0.5 GB oracle
intermediates (chunk 64) and runs in ~1 min on CPU; marked `slow` but not
gated — it is the accuracy-target keystone.
"""

import contextlib
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/timeviper/model/llm/llm_repo"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

# Production layer geometry (reference configuration_nano.py:133-180),
# with chunk_size reduced 256->64: the chunk size is an algorithm tile,
# not part of the computed function, and the oracle materializes
# (l=chunk, s=chunk, H, N) f32 intermediates — 4.3 GB at 256, 0.27 GB
# at 64. vocab shrunk (131072 -> 512): the lm_head is geometry-neutral.
PROD = dict(
    hidden_size=4096, intermediate_size=21504,
    num_attention_heads=32, head_dim=128, num_key_value_heads=8,
    mamba_num_heads=128, mamba_head_dim=64, n_groups=8, ssm_state_size=128,
    chunk_size=64, vocab_size=512,
)


@contextlib.contextmanager
def production_group_mapping(repeats: int):
    """Patch the oracle's B/C `.repeat(1, 1, H//G, 1)` group tiling
    (modeling_nano.py:784-785) to the production interleave mapping.
    Scoped: only 4-D tensors repeated exactly (1, 1, `repeats`, 1) —
    the only such calls in the reference forward are those two."""
    orig = torch.Tensor.repeat

    def patched(self, *sizes):
        if (len(sizes) == 4 and self.dim() == 4
                and tuple(sizes) == (1, 1, repeats, 1)):
            return torch.repeat_interleave(self, repeats, dim=2)
        return orig(self, *sizes)

    torch.Tensor.repeat = patched
    try:
        yield
    finally:
        torch.Tensor.repeat = orig


def _our_cfg(**overrides):
    from timeviper_tpu.config import NanoConfig

    base = dict(
        hidden_size=4096, intermediate_size=21504,
        num_attention_heads=32, head_dim=128, num_key_value_heads=8,
        mamba_num_heads=128, mamba_head_dim=64, mamba_n_groups=8,
        ssm_state_size=128, chunk_size=64, vocab_size=512,
    )
    base.update(overrides)
    return NanoConfig(**base)


def _logit_close(ours, ref, tol, msg):
    """Compare logits with a scale-aware tolerance: both sides are f32
    but reduce ~36k-term dot products in different orders."""
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=tol,
                               err_msg=msg)


def test_prod_geometry_one_layer_each_type():
    """hidden 4096 / d_inner 8192 / H=128 / G=8 / N=128: one Mamba-2, one
    GQA attention, one MLP layer (pattern 'M*-'), 80 tokens (2 chunks +
    pad — exercises the inter-chunk state recurrence at full width)."""
    from tests.ref_stubs import build_ref_nano

    model = build_ref_nano(num_hidden_layers=3,
                           hybrid_override_pattern="M*-", **PROD)
    torch.manual_seed(2)
    ids_t = torch.randint(0, 512, (1, 80))
    with production_group_mapping(repeats=128 // 8):
        with torch.no_grad():
            ref_logits = model(input_ids=ids_t).logits.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    from timeviper_tpu.models.nano import nano_forward
    from timeviper_tpu.train.convert import convert_nano

    cfg = _our_cfg(num_hidden_layers=3, hybrid_override_pattern="M*-")
    params = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    ours = np.asarray(
        nano_forward(params, cfg,
                     input_ids=jnp.asarray(ids_t.numpy()))["logits"])
    _logit_close(ours, ref_logits, 2e-4, "prod-width M*- logits")
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()


def test_full_52layer_pattern_prefill_and_decode():
    """The complete 9B hybrid_override_pattern (52 layers, 4 attention
    interleavings) at reduced width but production G=8 / N=128 topology:
    prefill 12 tokens, then 6 cache-stepped decode tokens, logits parity
    at every step. The oracle prefill is patched to the production group
    mapping so both sides compute the deployed function; the reference
    decode path already uses it natively (modeling_nano.py:737-739)."""
    from tests.ref_stubs import build_ref_nano

    from timeviper_tpu.config import NanoConfig

    full_pattern = NanoConfig().hybrid_override_pattern
    assert len(full_pattern) == 52 and full_pattern.count("*") == 4

    geom = dict(
        hidden_size=256, intermediate_size=512,
        num_attention_heads=4, head_dim=64, num_key_value_heads=2,
        mamba_num_heads=16, mamba_head_dim=16,
        ssm_state_size=128, chunk_size=32, vocab_size=512,
    )
    ref_geom = {("n_groups" if k == "mamba_n_groups" else k): v
                for k, v in geom.items()}
    model = build_ref_nano(num_hidden_layers=52,
                           hybrid_override_pattern=full_pattern,
                           use_cache=True, n_groups=8, **ref_geom)
    import nano.modeling_nano as mn

    cache = mn.HybridMambaAttentionDynamicCache(
        model.config, 1, dtype=torch.float32)

    class _DeviceList(list):  # as-shipped defect: list lacks .device
        @property
        def device(self):
            return torch.device("cpu")

    torch.manual_seed(3)
    ids = torch.randint(3, 500, (1, 12))
    with production_group_mapping(repeats=16 // 8):
        with torch.no_grad():
            out = model(input_ids=ids, use_cache=True, past_key_values=cache,
                        cache_position=torch.arange(12))
    cache = out.past_key_values
    cache.ssm_states = _DeviceList(cache.ssm_states)
    ref_logits = out.logits[:, -1].numpy()

    from timeviper_tpu.models.nano import nano_decode_step, nano_forward
    from timeviper_tpu.train.convert import convert_nano

    cfg = _our_cfg(num_hidden_layers=52, hybrid_override_pattern=full_pattern,
                   mamba_n_groups=8, **geom)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    out = nano_forward(params, cfg, input_ids=jnp.asarray(ids.numpy()),
                       fill_cache=True, cache_max_len=32, logits_to_keep=1)
    our_cache = out["cache"]
    _logit_close(np.asarray(out["logits"][:, -1]), ref_logits, 3e-4,
                 "52L prefill last-token logits")

    step = jax.jit(lambda p, t, c: nano_decode_step(p, cfg, t, c))
    tok = int(ref_logits.argmax(-1)[0])
    for t in range(6):
        pos = 12 + t
        with torch.no_grad():
            o = model(input_ids=torch.tensor([[tok]]), use_cache=True,
                      past_key_values=cache,
                      cache_position=torch.arange(pos, pos + 1))
        cache = o.past_key_values
        ref_step = o.logits[:, -1].numpy()
        our_logits, our_cache = step(
            params, jnp.asarray([[tok]]), our_cache)
        _logit_close(np.asarray(our_logits).reshape(ref_step.shape),
                     ref_step, 3e-4, f"decode step {t}")
        nxt = int(ref_step.argmax(-1)[0])
        assert int(np.asarray(our_logits).reshape(-1, ref_step.shape[-1])
                   .argmax(-1)[0]) == nxt, f"greedy diverged at step {t}"
        tok = nxt
