"""More cross-implementation golden parity: ToMe merging and the Qwen2
backbone, against the actual reference torch code (CPU)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not mounted"
)


def _load_ref_tome():
    spec = importlib.util.spec_from_file_location(
        "ref_tome", f"{REF_ROOT}/timeviper/model/projector/tome.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tome_merge_matches_reference():
    import torch

    rt = _load_ref_tome()
    torch.manual_seed(0)
    B, P, C = 3, 64, 32  # heads=16 -> metric dim 2
    x_t = torch.randn(B, P, C)

    ref_mod = rt.ToMe16_mlp_hd64(C, 48, num_compressed_tokens=16)
    with torch.no_grad():
        ref_merged = ref_mod.merge_tokens(x_t.clone(), 16, "raw").numpy()

    import jax.numpy as jnp

    from timeviper_tpu.ops.tome import tome_merge

    ours = np.asarray(tome_merge(
        jnp.asarray(x_t.numpy()), 16, num_attention_heads=16))
    np.testing.assert_allclose(ours, ref_merged, rtol=2e-4, atol=2e-4)


def test_tome_merge_ordering_matches_reference():
    import torch

    rt = _load_ref_tome()
    torch.manual_seed(1)
    x_t = torch.randn(2, 48, 32)
    ref_mod = rt.ToMe16_mlp_hd64(32, 48, num_compressed_tokens=8,
                                 token_order="descending")
    with torch.no_grad():
        ref_merged = ref_mod.merge_tokens(x_t.clone(), 8, "descending").numpy()

    import jax.numpy as jnp

    from timeviper_tpu.ops.tome import tome_merge

    ours = np.asarray(tome_merge(
        jnp.asarray(x_t.numpy()), 8, num_attention_heads=16,
        token_order="descending"))
    np.testing.assert_allclose(ours, ref_merged, rtol=2e-4, atol=2e-4)


def test_qwen2_logits_match_reference():
    import torch

    sys.path.insert(0, f"{REF_ROOT}/timeviper/model/llm/llm_repo")
    import qwen2.modeling_qwen2 as rq
    from qwen2.configuration_qwen2 import Qwen2Config as RefCfg

    ref_cfg = RefCfg(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, rope_theta=1000000.0,
        use_cache=False, tie_word_embeddings=False,
    )
    ref_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = rq.Qwen2ForCausalLM(ref_cfg).eval().float()
    ids_t = torch.randint(0, 512, (1, 20))
    with torch.no_grad():
        ref_logits = model(input_ids=ids_t).logits.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from timeviper_tpu.config import tiny_qwen2_config
    from timeviper_tpu.models.qwen2 import qwen2_forward
    from timeviper_tpu.train.convert import convert_qwen2

    cfg = tiny_qwen2_config()
    params = jax.tree_util.tree_map(jnp.asarray, convert_qwen2(sd, cfg))
    ours = np.asarray(qwen2_forward(
        params, cfg, input_ids=jnp.asarray(ids_t.numpy()))["logits"])
    np.testing.assert_allclose(ours, ref_logits, rtol=3e-4, atol=3e-4)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()
