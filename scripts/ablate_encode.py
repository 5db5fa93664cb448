"""Ablation timing of the int8 SigLIP encode at the bench clip shape.

Times the full encode_clip (vit+ToMe+proj) and variants with one component
replaced by (nearly) free math, so each component's true share of the wall
is the delta — no dispatch-subtraction guesswork like profile_encode.py.
Run on the TPU: `PYTHONPATH=. python scripts/ablate_encode.py`.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from timeviper_tpu.config import SIGLIP_SO400M_384, NanoConfig
from timeviper_tpu.models.projector import init_projector_params, projector_forward
from timeviper_tpu.models import vit as vitmod
from timeviper_tpu.models.vit import _apply_linear, _layer_norm, init_vit_params
from timeviper_tpu.ops.vit_attention import encoder_attention_qkv
from timeviper_tpu.train.quantize import calibrate_act_scales, quantize_params_int8

cfg = SIGLIP_SO400M_384
F = int(os.environ.get("ABLATE_FRAMES", 256))
STEPS = int(os.environ.get("ABLATE_STEPS", 5))
lcfg = NanoConfig(vocab_size=2048)


def _sync(a):
    return float(np.asarray(a.reshape(-1)[0], np.float32))


def timeit(fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / STEPS * 1000


params = jax.jit(lambda k: quantize_params_int8(
    init_vit_params(k, cfg, jnp.bfloat16)))(jax.random.PRNGKey(0))
pixels = jax.random.normal(jax.random.PRNGKey(1), (F, 384, 384, 3), jnp.bfloat16)
params = calibrate_act_scales(
    lambda p, px: vitmod.vit_forward(p, cfg, px), params, [pixels[:32]])
pparams = jax.jit(lambda k: init_projector_params(
    k, cfg.hidden_size, lcfg.hidden_size, "tome_mlp",
    dtype=jnp.bfloat16))(jax.random.PRNGKey(2))
jax.block_until_ready((params, pparams))


def vit_fwd_ablate(params, pixels, *, attn="kernel", mlp=True, ln=True):
    """vit_forward clone with components stubbed for ablation."""
    B, H, W, _ = pixels.shape
    grid = H // cfg.patch_size
    p = cfg.patch_size
    kernel = params["patch_embed"]["kernel"]
    crop = pixels[:, : grid * p, : grid * p].astype(kernel.dtype)
    patches = (crop.reshape(B, grid, p, grid, p, 3)
               .transpose(0, 1, 3, 2, 4, 5)
               .reshape(B, grid * grid, p * p * 3))
    x = jnp.einsum("bpk,kd->bpd", patches,
                   kernel.reshape(p * p * 3, cfg.hidden_size))
    x = x + params["patch_embed"]["bias"].astype(x.dtype)
    pos = vitmod._resize_pos_embed(params["pos_embed"], cfg, grid)
    x = x + pos.astype(x.dtype)
    act = lambda y: jax.nn.gelu(y, approximate=True)
    nh = cfg.num_attention_heads
    hd = cfg.hidden_size // nh
    D = cfg.hidden_size
    for layer in params["layers"][: cfg.num_hidden_layers - 1]:
        res = x
        n = _layer_norm(x, layer["norm1"], cfg.layer_norm_eps) if ln else x
        qkv = _apply_linear(layer["attn"]["qkv"], n)
        if attn == "kernel":
            out = encoder_attention_qkv(qkv, nh, hd)
        elif attn == "none":  # qkv matmul kept, attention math skipped
            out = qkv[..., :D]
        out = _apply_linear(layer["attn"]["proj"], out)
        x = res + out
        res = x
        n = _layer_norm(x, layer["norm2"], cfg.layer_norm_eps) if ln else x
        if mlp:
            out = _apply_linear(layer["mlp"]["fc2"],
                                act(_apply_linear(layer["mlp"]["fc1"], n)))
        else:
            out = n
        x = res + out
    return x[:, cfg.num_prefix_tokens:]


results = {}
full = jax.jit(lambda pr, px: vitmod.vit_forward(pr, cfg, px))
results["vit_full_ms"] = timeit(full, params, pixels)

no_attn = jax.jit(lambda pr, px: vit_fwd_ablate(pr, px, attn="none"))
results["vit_no_attn_ms"] = timeit(no_attn, params, pixels)

no_mlp = jax.jit(lambda pr, px: vit_fwd_ablate(pr, px, mlp=False))
results["vit_no_mlp_ms"] = timeit(no_mlp, params, pixels)

no_ln = jax.jit(lambda pr, px: vit_fwd_ablate(pr, px, ln=False))
results["vit_no_ln_ms"] = timeit(no_ln, params, pixels)

# encode_clip = vit + ToMe16 + MLP projector (what bench.py runs per clip)
def encode_clip(vp, pp, px):
    feats = vitmod.vit_forward(vp, cfg, px)
    proj = projector_forward(pp, feats, projector_type="tome_mlp",
                             num_compressed_tokens=16)
    return proj.reshape(1, F * 16, -1).astype(jnp.bfloat16)

enc = jax.jit(encode_clip)
results["encode_clip_ms"] = timeit(enc, params, pparams, pixels)
results["tome_proj_ms"] = results["encode_clip_ms"] - results["vit_full_ms"]
results["attn_share_ms"] = results["vit_full_ms"] - results["vit_no_attn_ms"]
results["mlp_share_ms"] = results["vit_full_ms"] - results["vit_no_mlp_ms"]
results["ln_share_ms"] = results["vit_full_ms"] - results["vit_no_ln_ms"]
results["frames"] = F
results["encode_fps"] = F / (results["encode_clip_ms"] / 1000)
print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                  for k, v in results.items()}, indent=1))
