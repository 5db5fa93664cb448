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

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/timeviper/model/llm/llm_repo"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted"
)


def test_nano_logits_match_reference():
    import torch

    from tests.ref_stubs import build_ref_nano

    # n_groups=1: tile/interleave group mappings coincide (see module doc)
    model = build_ref_nano()
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
