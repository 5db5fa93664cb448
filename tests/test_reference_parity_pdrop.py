"""Golden parity for pdrop against the actual reference code (CPU torch).

Covers the core paper mechanism: layerwise visual-token dropping. The
`uni` stage runs through the FULL model (post-drop Mamba recompute and
final logits compared); the `attn` ranking is compared at the
flash_rank_drop function level (the reference's own downstream eager-attn
path is broken after a drop — stale mask, see tests/ref_stubs.py).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/timeviper/model/llm/llm_repo"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)

# layout for every case: 3 prefix text + 8 visual + 5 suffix text = 16
LAYOUT = (3, 8, 5)
QPOS = 15  # inference ranking query: text_prompt(8) + image_tokens(8) - 1


def _pdrop_args():
    import torch

    return {
        "is_interleaved": False,
        "num_vision_tokens": [8],
        "first_vision_token_positions": [torch.tensor(LAYOUT[0])],
        "text_prompt_lens": [LAYOUT[0] + LAYOUT[2]],
    }


def test_uni_pdrop_full_model_parity():
    import torch

    from tests.ref_stubs import build_ref_nano

    model = build_ref_nano(use_pdrop=True, pdrop_type="uni_4_0.5",
                           merge_module="no_merge")
    ids_t = torch.randint(0, 500, (1, 16))
    with torch.no_grad():
        ref_logits = model(
            input_ids=ids_t, train_pdrop_args=_pdrop_args()).logits.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from timeviper_tpu.config import tiny_nano_config
    from timeviper_tpu.models.nano import nano_forward
    from timeviper_tpu.models.pdrop import make_pdrop_spec
    from timeviper_tpu.train.convert import convert_nano

    cfg = tiny_nano_config(mamba_n_groups=1, use_pdrop=True,
                           pdrop_type="uni_4_0.5")
    params = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    spec = make_pdrop_spec([LAYOUT], cfg.pdrop_stages, query_positions=[QPOS])
    ours = np.asarray(nano_forward(
        params, cfg, input_ids=jnp.asarray(ids_t.numpy()),
        pdrop_spec=spec)["logits"])
    assert ours.shape == ref_logits.shape  # 4 of 8 visual tokens dropped
    np.testing.assert_allclose(ours, ref_logits, rtol=3e-4, atol=3e-4)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()


def test_attn_rank_drop_function_parity():
    import torch

    from tests.ref_stubs import build_ref_nano

    model = build_ref_nano(use_pdrop=True, pdrop_type="attn_3_0.5",
                           merge_module="no_merge")
    bb = model.backbone
    torch.manual_seed(2)
    h_t = torch.randn(1, 16, 64)
    with torch.no_grad():
        _, _, new_h, _, _ = bb.flash_rank_drop(
            cur_num=0, rank_layer=3, features=h_t.clone(), position_ids=None,
            attention_mask=None, labels=None, is_packed=False, seq_idx=None,
            train_pdrop_args=_pdrop_args(),
        )
    ref_out = new_h.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from timeviper_tpu.config import tiny_nano_config
    from timeviper_tpu.models.pdrop import apply_pdrop_stage, make_pdrop_spec
    from timeviper_tpu.train.convert import convert_nano

    cfg = tiny_nano_config(mamba_n_groups=1, use_pdrop=True,
                           pdrop_type="attn_3_0.5")
    params = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    spec = make_pdrop_spec([LAYOUT], cfg.pdrop_stages, query_positions=[QPOS])
    new_hidden, _, _, _ = apply_pdrop_stage(
        jnp.asarray(h_t.numpy()), None, None, spec, cfg.pdrop_stages[0], 0,
        cfg=cfg, attn_params=params["layers"][3]["mixer"], merge_params=None,
    )
    assert new_hidden.shape == ref_out.shape
    np.testing.assert_allclose(
        np.asarray(new_hidden), ref_out, rtol=2e-4, atol=2e-4)


def test_transv_merge_full_model_parity():
    """pdrop + TransV cross-attention merge (nonzero alpha gate) through the
    full model vs the reference (merge_modules converted incl. the shared
    alpha vector)."""
    import torch

    from tests.ref_stubs import build_ref_nano

    model = build_ref_nano(use_pdrop=True, pdrop_type="uni_4_0.5",
                           merge_module="CrossAttention")
    with torch.no_grad():
        model.backbone.alpha[0] = 0.7  # make the merge contribute
    ids_t = torch.randint(0, 500, (1, 16))
    with torch.no_grad():
        ref_logits = model(
            input_ids=ids_t, train_pdrop_args=_pdrop_args()).logits.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from timeviper_tpu.config import tiny_nano_config
    from timeviper_tpu.models.nano import nano_forward
    from timeviper_tpu.models.pdrop import make_pdrop_spec
    from timeviper_tpu.train.convert import (
        convert_nano,
        convert_nano_merge_modules,
    )

    cfg = tiny_nano_config(mamba_n_groups=1, use_pdrop=True,
                           pdrop_type="uni_4_0.5",
                           merge_module="CrossAttention")
    params = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    merge = jax.tree_util.tree_map(
        jnp.asarray, convert_nano_merge_modules(sd, cfg))
    spec = make_pdrop_spec([LAYOUT], cfg.pdrop_stages, query_positions=[QPOS])
    ours = np.asarray(nano_forward(
        params, cfg, input_ids=jnp.asarray(ids_t.numpy()),
        pdrop_spec=spec, pdrop_params=merge)["logits"])
    np.testing.assert_allclose(ours, ref_logits, rtol=3e-4, atol=3e-4)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()
