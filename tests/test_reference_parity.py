"""Cross-implementation golden parity against the ACTUAL reference code.

Runs the reference's pure-torch NemotronHForCausalLM (CPU) on a tiny
config, converts its state dict with train/convert.py, and requires our
JAX forward to reproduce the reference logits.

Setup notes:
* The reference hard-imports mamba_ssm/Triton (modeling_nano.py:61-77);
  its `torch_forward` naive path never calls those kernels except
  `rmsnorm_fn`, which we provide as a pure-torch stub.
* modeling_nano.py:938 pins a CUDA stream unconditionally — no-op'd here.
* **Reference defect found by this test** (documented, not reproduced):
  torch_forward maps head h to B/C group (h mod n_groups) via
  `B.repeat(1, 1, H//G, 1)` (modeling_nano.py:784-785) while its own
  decode path (modeling_nano.py:737-739, expand+reshape) and the
  production mamba-ssm Triton kernels map h -> group h // (H/G). We
  follow the production mapping; this test uses n_groups == 1, where the
  two mappings coincide, so parity is exact. With n_groups > 1 our
  pipeline reproduces torch_forward to 0 ulp when patched to the tile
  mapping (verified manually) — the residual is only the reference
  oracle's inconsistency.

Skipped when the reference tree is absent.
"""

import contextlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/timeviper/model/llm/llm_repo"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def _stub_mamba_ssm():
    import torch

    def rmsnorm_fn(x, weight, bias, z=None, eps=1e-5, group_size=None,
                   norm_before_gate=False, **kw):
        if z is not None and not norm_before_gate:
            x = x * torch.nn.functional.silu(z)
        shape = x.shape
        if group_size is not None and group_size != shape[-1]:
            xg = x.view(*shape[:-1], shape[-1] // group_size, group_size)
            var = xg.pow(2).mean(-1, keepdim=True)
            xg = xg * torch.rsqrt(var + eps)
            x = xg.view(shape)
        else:
            var = x.pow(2).mean(-1, keepdim=True)
            x = x * torch.rsqrt(var + eps)
        out = x * weight
        if z is not None and norm_before_gate:
            out = out * torch.nn.functional.silu(z)
        return out

    names = [
        "mamba_ssm", "mamba_ssm.ops", "mamba_ssm.ops.triton",
        "mamba_ssm.ops.triton.ssd_combined",
        "mamba_ssm.ops.triton.selective_state_update",
        "mamba_ssm.ops.triton.layernorm_gated",
    ]
    for n in names:
        sys.modules.setdefault(n, types.ModuleType(n))
    sys.modules["mamba_ssm.ops.triton.ssd_combined"].mamba_chunk_scan_combined = None
    sys.modules["mamba_ssm.ops.triton.ssd_combined"].mamba_split_conv1d_scan_combined = None
    sys.modules["mamba_ssm.ops.triton.selective_state_update"].selective_state_update = None
    sys.modules["mamba_ssm.ops.triton.layernorm_gated"].rmsnorm_fn = rmsnorm_fn
    torch.cuda.stream = lambda *a, **k: contextlib.nullcontext()
    torch.cuda.default_stream = lambda *a, **k: None


def test_nano_logits_match_reference():
    import torch

    _stub_mamba_ssm()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import nano.modeling_nano as mn
    from nano.configuration_nano import NemotronHConfig

    # n_groups=1: tile/interleave group mappings coincide (see module doc)
    ref_cfg = NemotronHConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, hybrid_override_pattern="M-M*M-",
        num_attention_heads=4, head_dim=16, num_key_value_heads=2,
        ssm_state_size=16, mamba_num_heads=8, n_groups=1, mamba_head_dim=8,
        chunk_size=16, use_cache=False,
    )
    ref_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = mn.NemotronHForCausalLM(ref_cfg).eval().float()
    ids_t = torch.randint(0, 512, (1, 24))
    with torch.no_grad():
        ref_logits = model(input_ids=ids_t).logits.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from timeviper_tpu.config import tiny_nano_config
    from timeviper_tpu.models.nano import nano_forward
    from timeviper_tpu.train.convert import convert_nano

    cfg = tiny_nano_config(mamba_n_groups=1)
    params = jax.tree_util.tree_map(jnp.asarray, convert_nano(sd, cfg))
    ours = np.asarray(
        nano_forward(params, cfg, input_ids=jnp.asarray(ids_t.numpy()))["logits"]
    )
    np.testing.assert_allclose(ours, ref_logits, rtol=2e-4, atol=2e-4)
    assert (ours.argmax(-1) == ref_logits.argmax(-1)).all()
