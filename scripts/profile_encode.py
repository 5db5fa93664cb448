"""On-chip component profile of the int8 SigLIP encode.

Breaks the encode wall-clock into per-component costs (patchify, qkv,
attention wrapper vs kernel, MLP, LayerNorm, ToMe+projector) and prints a
per-layer ledger next to the measured full forward, so regressions can be
attributed to a specific op. Run on the TPU: `python scripts/profile_encode.py`.
Methodology per docs/PERFORMANCE.md: ops are chained REPS times inside one
jit and the ~30 ms tunnel dispatch+fetch latency is subtracted.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from timeviper_tpu.config import SIGLIP_SO400M_384, NanoConfig
from timeviper_tpu.models.projector import init_projector_params, projector_forward
from timeviper_tpu.models.vit import (
    _apply_linear, _layer_norm, init_vit_params, vit_forward,
)
from timeviper_tpu.ops.vit_attention import encoder_attention, vit_attention
from timeviper_tpu.train.quantize import calibrate_act_scales, quantize_params_int8


def _sync(a):
    return float(np.asarray(a.reshape(-1)[0], np.float32))


def _timeit(fn, steps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(steps):
        fn()
    return (time.perf_counter() - t0) / steps


cfg = SIGLIP_SO400M_384
F = 64
REPS = 6
T, D, I = 729, cfg.hidden_size, cfg.intermediate_size
nh, hd = cfg.num_attention_heads, cfg.hidden_size // cfg.num_attention_heads

params = jax.jit(lambda k: quantize_params_int8(
    init_vit_params(k, cfg, jnp.bfloat16)))(jax.random.PRNGKey(0))
pixels = jax.random.normal(jax.random.PRNGKey(1), (F, 384, 384, 3), jnp.bfloat16)
params = calibrate_act_scales(
    lambda p, px: vit_forward(p, cfg, px), params, [pixels[:32]])
jax.block_until_ready(params)

results = {}

# full forward
full = jax.jit(lambda p, px: vit_forward(p, cfg, px))
results["full_vit_fwd_ms"] = _timeit(lambda: _sync(full(params, pixels))) * 1000

# patchify
patch = jax.jit(lambda px, p: jax.lax.conv_general_dilated(
    px.astype(jnp.bfloat16), p["patch_embed"]["kernel"],
    window_strides=(14, 14), padding="VALID",
    dimension_numbers=("NHWC", "HWIO", "NHWC")))
results["patchify_ms"] = _timeit(lambda: _sync(patch(pixels, params))) * 1000

x = jax.random.normal(jax.random.PRNGKey(2), (F, T, D), jnp.bfloat16)
layer = jax.tree.map(lambda a: a, params["layers"][0])  # first layer leaves


def chain(fn, x0, steps=3):
    @jax.jit
    def run(x):
        y = x
        for _ in range(REPS):
            y = fn(y)
        return y
    dt = _timeit(lambda: _sync(run(x0)), steps)
    return (dt * 1000 - 30) / REPS  # subtract tunnel dispatch


# qkv int8: (F*T, D) @ (D, 3D) -> keep shape by slicing back
results["qkv_ms"] = chain(
    lambda y: _apply_linear(layer["attn"]["qkv"], y)[..., :D], x)
results["proj_ms"] = chain(lambda y: _apply_linear(layer["attn"]["proj"], y), x)
results["mlp_ms"] = chain(
    lambda y: _apply_linear(
        layer["mlp"]["fc2"],
        jax.nn.gelu(_apply_linear(layer["mlp"]["fc1"], y), approximate=True)), x)
results["ln_ms"] = chain(lambda y: _layer_norm(y, layer["norm1"], 1e-6), x)

# attention: wrapper (pad+transpose+kernel) vs kernel alone
q = jax.random.normal(jax.random.PRNGKey(3), (F, T, nh, hd), jnp.bfloat16)
results["attn_wrapper_ms"] = chain(
    lambda y: encoder_attention(y, y, y), q)
qp = jnp.transpose(
    jnp.pad(q, ((0, 0), (0, 39), (0, 0), (0, 128 - hd))), (0, 2, 1, 3))


def _kernel_only(y):
    o = vit_attention(
        jnp.transpose(y, (0, 2, 1, 3))[..., :hd],
        jnp.transpose(y, (0, 2, 1, 3))[..., :hd],
        jnp.transpose(y, (0, 2, 1, 3))[..., :hd])
    return jnp.pad(jnp.transpose(o, (0, 2, 1, 3)), ((0, 0), (0, 0), (0, 0), (0, 128 - hd)))


# ToMe + projector
lcfg = NanoConfig(vocab_size=2048)
pparams = jax.jit(lambda k: init_projector_params(
    k, D, lcfg.hidden_size, "tome_mlp", dtype=jnp.bfloat16))(jax.random.PRNGKey(4))
feats = jax.random.normal(jax.random.PRNGKey(5), (F, T, D), jnp.bfloat16)
tomep = jax.jit(functools.partial(
    projector_forward, projector_type="tome_mlp", num_compressed_tokens=16))
results["tome_proj_ms"] = _timeit(lambda: _sync(tomep(pparams, feats))) * 1000

L = cfg.num_hidden_layers - 1
ledger = (results["qkv_ms"] + results["proj_ms"] + results["mlp_ms"]
          + 2 * results["ln_ms"] + results["attn_wrapper_ms"]) * L \
    + results["patchify_ms"] + results["tome_proj_ms"]
results["ledger_ms"] = ledger
results["layers"] = L
results["frames"] = F
for k, v in results.items():
    if isinstance(v, float):
        results[k] = round(v, 2)
print(json.dumps(results, indent=1))
print("full f/s:", round(F / (results["full_vit_fwd_ms"] / 1000), 1))
