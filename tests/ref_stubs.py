"""Shared helpers to run the reference's torch model on CPU for parity
tests: stubs the Triton/CUDA deps and works around as-shipped defects.

Defects worked around here (all documented in SURVEY.md):
* hard import of mamba_ssm (modeling_nano.py:61-77) — torch_forward only
  needs rmsnorm_fn, provided as a pure-torch stub;
* unconditional CUDA stream pin (modeling_nano.py:938) — no-op'd;
* pdrop reads `self.pdrop_layers`/`pdrop_ratios`/`pdrop_compress_types`
  that only `self.pdrop_args` carries (modeling_nano.py:1639 vs 1465-1480)
  — attributes mirrored onto the instance;
* post-pdrop `_update_causal_mask` uses the stale pre-drop cache_position
  (modeling_nano.py:1664, :2228) — patched to the current length.
"""

from __future__ import annotations

import contextlib
import sys
import types

REF_LLM = "/root/reference/timeviper/model/llm/llm_repo"


def stub_mamba_ssm():
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

    for n in ["mamba_ssm", "mamba_ssm.ops", "mamba_ssm.ops.triton",
              "mamba_ssm.ops.triton.ssd_combined",
              "mamba_ssm.ops.triton.selective_state_update",
              "mamba_ssm.ops.triton.layernorm_gated"]:
        sys.modules.setdefault(n, types.ModuleType(n))
    sys.modules["mamba_ssm.ops.triton.ssd_combined"].mamba_chunk_scan_combined = None
    sys.modules["mamba_ssm.ops.triton.ssd_combined"].mamba_split_conv1d_scan_combined = None
    sys.modules["mamba_ssm.ops.triton.selective_state_update"].selective_state_update = None
    sys.modules["mamba_ssm.ops.triton.layernorm_gated"].rmsnorm_fn = rmsnorm_fn
    torch.cuda.stream = lambda *a, **k: contextlib.nullcontext()
    torch.cuda.default_stream = lambda *a, **k: None


def build_ref_nano(**cfg_overrides):
    """Construct the reference NemotronHForCausalLM on CPU (eager attn)."""
    import torch

    stub_mamba_ssm()
    if REF_LLM not in sys.path:
        sys.path.insert(0, REF_LLM)
    import nano.modeling_nano as mn
    from nano.configuration_nano import NemotronHConfig

    base = dict(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, hybrid_override_pattern="M-M*M-",
        num_attention_heads=4, head_dim=16, num_key_value_heads=2,
        ssm_state_size=16, mamba_num_heads=8, n_groups=1, mamba_head_dim=8,
        chunk_size=16, use_cache=False,
    )
    base.update(cfg_overrides)
    cfg = NemotronHConfig(**base)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = mn.NemotronHForCausalLM(cfg).eval().float()
    bb = model.backbone
    if base.get("use_pdrop"):
        for k in ("pdrop_layers", "pdrop_ratios", "pdrop_compress_types"):
            setattr(bb, k, bb.pdrop_args[k])
        orig = bb._update_causal_mask
        bb._update_causal_mask = lambda am, it, cp: orig(
            am, it, torch.arange(it.shape[1]))
    return model
