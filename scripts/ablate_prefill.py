"""Ablation timing of the 52-layer int8 W8A8 prefill (the bench's LLM phase).

Same method as ablate_encode.py: time the full prefill and variants with one
component monkeypatched to (nearly) free math, so each component's true wall
share is the delta. Also A/Bs `fuse_decode_in_proj` on the prefill path —
the five in_proj splits (gate 8192 | x 8192 | B 1024 | C 1024 | dt 128)
share one input, and the three skinny ones run at poor MXU efficiency as
separate dispatches.

Run on the TPU: `PYTHONPATH=. python scripts/ablate_prefill.py`.
Env: ABLATE_SEQ (16384), ABLATE_LAYERS (52), ABLATE_STEPS (3),
ABLATE_VARIANTS (comma list to restrict).
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import timeviper_tpu.models.nano as nano
from timeviper_tpu.config import NanoConfig
from timeviper_tpu.train.quantize import (
    calibrate_act_scales,
    fuse_decode_in_proj,
    quantize_params_int8,
)

L = int(os.environ.get("ABLATE_SEQ", 16384))
n_layers = int(os.environ.get("ABLATE_LAYERS", 52))
STEPS = int(os.environ.get("ABLATE_STEPS", 3))

full_pat = "M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M-"
pattern = (full_pat * (n_layers // len(full_pat) + 1))[:n_layers]
cfg = NanoConfig(num_hidden_layers=n_layers, hybrid_override_pattern=pattern,
                 vocab_size=2048,
                 chunk_size=int(os.environ.get("ABLATE_CHUNK", 256)))


def _sync(a):
    return float(np.asarray(a.reshape(-1)[0], np.float32))


def timeit(fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / STEPS * 1000


params = jax.jit(lambda k: quantize_params_int8(
    nano.init_nano_params(k, cfg, dtype=jnp.bfloat16)))(jax.random.PRNGKey(0))
embeds = jax.random.normal(
    jax.random.PRNGKey(1), (1, L, cfg.hidden_size), jnp.bfloat16)
params = calibrate_act_scales(
    lambda p, e: nano.nano_forward(p, cfg, inputs_embeds=e,
                                   logits_to_keep=1)["logits"],
    params, [embeds[:, :4096]])
jax.block_until_ready(params)


def make_prefill(p):
    copts = None
    if os.environ.get("ABLATE_VMEM_KIB"):
        copts = {"xla_tpu_scoped_vmem_limit_kib":
                 int(os.environ["ABLATE_VMEM_KIB"])}

    @functools.partial(jax.jit, compiler_options=copts)
    def prefill(params, embeds):
        return nano.nano_forward(params, cfg, inputs_embeds=embeds,
                                 logits_to_keep=1)["logits"]
    return lambda e: prefill(p, e)


# -- component stubs (monkeypatched around a fresh jit trace) ---------------
def stub_conv(x, w, b, activation=None, seq_idx=None):
    return x


def stub_ssd(x, dt, A, B, C, chunk_size=0, D=None, dt_bias=None,
             dt_softplus=True, dt_limit=None, seq_idx=None,
             return_final_state=False, initial_state=None):
    y = x * 0.5
    if return_final_state:
        return y, jnp.zeros(
            (x.shape[0], x.shape[2], x.shape[3], B.shape[-1]), jnp.float32)
    return y


def stub_rms(x, w, eps=1e-5):
    return x


def stub_grms(y, gate, w, eps=1e-5, group_size=0):
    return y


def stub_mlp(p, cfg_, x):
    return x


def stub_attn(p, cfg_, x, segment_ids=None, attn_mask=None, cache_layer=None,
              fill_cache=False, max_len=0):
    return x, None


VARIANTS = {
    "full": {},
    "no_conv": {"causal_conv1d": stub_conv},
    "no_scan": {"ssd_chunked": stub_ssd},
    "no_norms": {"rms_norm": stub_rms, "gated_rms_norm": stub_grms},
    "no_mlp": {"mlp_mixer_forward": stub_mlp},
    "no_attn": {"attention_mixer_forward": stub_attn},
}

only = os.environ.get("ABLATE_VARIANTS")
if only:
    VARIANTS = {k: v for k, v in VARIANTS.items()
                if k in only.split(",") or k == "full"}

results = {}
for name, patches in VARIANTS.items():
    saved = {k: getattr(nano, k) for k in patches}
    try:
        for k, v in patches.items():
            setattr(nano, k, v)
        results[f"{name}_ms"] = timeit(make_prefill(params), embeds)
    finally:
        for k, v in saved.items():
            setattr(nano, k, v)

if not only or "fused_inproj" in (only or "").split(","):
    fused = fuse_decode_in_proj(params)
    jax.block_until_ready(fused)
    results["fused_inproj_ms"] = timeit(make_prefill(fused), embeds)

full_ms = results.get("full_ms")
if full_ms:
    for name in list(results):
        base = name[: -len("_ms")]
        if base not in ("full", "fused_inproj"):
            results[f"{base[3:]}_share_ms"] = full_ms - results[name]
    results["tokens_per_sec"] = L / (full_ms / 1000)
results.update(seq=L, layers=n_layers)
print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                  for k, v in results.items()}, indent=1))
