"""Microbenchmark of ViT attention kernel variants at SigLIP shapes.

Probes where the 331 ms/clip attention share (ablate_encode.py) actually
goes: unaligned 72-wide head slices, softmax VPU cost, or MXU padding.
Run: `PYTHONPATH=.:$PYTHONPATH python scripts/microbench_vit_attn.py`.
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timeviper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B = int(os.environ.get("MB_FRAMES", 256))
T, H, HD = 729, 16, 72
COLS = H * HD
STEPS = 10


def _sync(a):
    return float(np.asarray(a.reshape(-1)[0], np.float32))


def timeit(fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / STEPS * 1000


key = jax.random.PRNGKey(0)
qkv = jax.random.normal(key, (B, T, 3 * COLS), jnp.bfloat16) * 0.3

results = {}

# 1. current production kernel (head loop with 72-wide unaligned slices)
from timeviper_tpu.ops.vit_attention import vit_attention_qkv

cur = jax.jit(lambda x: vit_attention_qkv(x, H, HD))
results["current_qkv_ms"] = timeit(cur, qkv)


def pad_heads(x, hd_new):
    x = x.reshape(B, T, 3, H, HD)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 0), (0, hd_new - HD)))
    return x.reshape(B, T, 3 * H * hd_new)


qkv128 = jax.jit(functools.partial(pad_heads, hd_new=128))(qkv)
jax.block_until_ready(qkv128)


# 2. head-gridded kernel at hd=128: each program gets HPP heads as
# 128-aligned column bands straight from the fused qkv layout; all
# slicing is done by BlockSpec index maps (DMA), none in-kernel.
def _headgrid_kernel(q_ref, k_ref, v_ref, o_ref, *, hpp, hd, scale,
                     t_valid, do_exp):
    Tk = k_ref.shape[0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, Tk), 1)
    colmask = (jj < t_valid).astype(jnp.float32)
    ones8 = jnp.ones((Tk, 8), q_ref.dtype)
    for h in range(hpp):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, sl] * jnp.asarray(scale, q_ref.dtype)
        s = jax.lax.dot_general(qh, k_ref[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if do_exp:
            p = (jnp.exp(jnp.minimum(s, 75.0)) * colmask).astype(q_ref.dtype)
            l = jax.lax.dot_general(p, ones8, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)[:, :1]
        else:
            p = (s * 0.01).astype(q_ref.dtype)
            l = jnp.ones((p.shape[0], 1), jnp.float32)
        o = jax.lax.dot_general(p, v_ref[:, sl], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, sl] = (o * (1.0 / jnp.maximum(l, 1e-30))).astype(o_ref.dtype)


def headgrid_attention(x, hd, hpp, do_exp=True):
    cols = H * hd
    band = hpp * hd
    ng = H // hpp
    kernel = functools.partial(_headgrid_kernel, hpp=hpp, hd=hd,
                               scale=1.0 / (HD ** 0.5), t_valid=T,
                               do_exp=do_exp)
    return pl.pallas_call(
        kernel,
        grid=(B, ng),
        in_specs=[
            pl.BlockSpec((None, T, band), lambda b, g: (b, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, band), lambda b, g: (b, 0, ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, T, band), lambda b, g: (b, 0, 2 * ng + g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, T, band), lambda b, g: (b, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, cols), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, x, x)


for hpp in (1, 2, 4):
    fn = jax.jit(functools.partial(headgrid_attention, hd=128, hpp=hpp))
    results[f"hd128_grid_hpp{hpp}_ms"] = timeit(fn, qkv128)

fn = jax.jit(functools.partial(headgrid_attention, hd=128, hpp=2,
                               do_exp=False))
results["hd128_grid_hpp2_noexp_ms"] = timeit(fn, qkv128)

# 3. extra qkv-projection cost of emitting 128-padded heads (the price of
# the hd128 layout at the model level): bf16 and int8-MXU versions
w72 = jax.random.normal(key, (COLS, 3 * COLS), jnp.bfloat16) * 0.02
w128 = jax.random.normal(key, (COLS, 3 * H * 128), jnp.bfloat16) * 0.02
x_in = jax.random.normal(key, (B, T, COLS), jnp.bfloat16)
mm = jax.jit(lambda x, w: jnp.einsum("btd,de->bte", x, w))
results["qkvproj_72_bf16_ms"] = timeit(mm, x_in, w72)
results["qkvproj_128_bf16_ms"] = timeit(mm, x_in, w128)


def mm_int8(x, wq):
    xq = jnp.clip(jnp.round(x * 16.0), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("btd,de->bte", xq, wq,
                     preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * 2e-4).astype(jnp.bfloat16)


w72q = jnp.round(w72 * 500).astype(jnp.int8)
w128q = jnp.round(w128 * 500).astype(jnp.int8)
mi = jax.jit(mm_int8)
results["qkvproj_72_int8_ms"] = timeit(mi, x_in, w72q)
results["qkvproj_128_int8_ms"] = timeit(mi, x_in, w128q)

for k_ in list(results):
    results[k_] = round(results[k_], 2)
results["note"] = f"B={B} T={T} H={H} hd={HD}"
print(json.dumps(results, indent=1))
