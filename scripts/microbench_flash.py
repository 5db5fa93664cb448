"""Microbenchmark: causal flash attention at the 80k-prefill shape.

The 5k-frame headline's four full-attention layers are the only
superlinear term in the 80k prefill (scripts/ablate_prefill.py: 87 ms of
1195 ms at L=16k -> ~2.2 s of 7.34 s at L=80k by L^2 scaling). This
probes the bundled Pallas kernel's block-size space at that shape.

Run: `PYTHONPATH=.:$PYTHONPATH python scripts/microbench_flash.py`.
Env: MB_SEQ (81920), MB_HEADS (32), MB_KV (8), MB_STEPS (3).
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

from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes,
    flash_attention as jax_flash,
)

L = int(os.environ.get("MB_SEQ", 81920))
Hq = int(os.environ.get("MB_HEADS", 32))
Hkv = int(os.environ.get("MB_KV", 8))
D = 128
STEPS = int(os.environ.get("MB_STEPS", 3))


def _sync(a):
    return float(np.asarray(a.reshape(-1)[0], np.float32))


def timeit(fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / STEPS * 1000


key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (1, Hq, L, D), jnp.bfloat16) * 0.3
k = jax.random.normal(key, (1, Hkv, L, D), jnp.bfloat16) * 0.3
v = jax.random.normal(key, (1, Hkv, L, D), jnp.bfloat16) * 0.3
kr = jnp.repeat(k, Hq // Hkv, axis=1)
vr = jnp.repeat(v, Hq // Hkv, axis=1)
jax.block_until_ready((q, kr, vr))

# causal MACs: L(L+1)/2 per (QK + PV) pair
flops = 2 * 2 * Hq * D * (L * (L + 1) // 2) * 2 / 2
results = {}


def run_blk(bq, bk):
    sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    fn = jax.jit(functools.partial(
        jax_flash, causal=True, sm_scale=D ** -0.5, block_sizes=sizes))
    ms = timeit(fn, q, kr, vr)
    results[f"blk_q{bq}_k{bk}_ms"] = round(ms, 1)
    results[f"blk_q{bq}_k{bk}_tfs"] = round(flops / (ms / 1e3) / 1e12, 1)


for bq, bk in tuple(eval(os.environ.get('MB_BLOCKS',
        '((512,512),(1024,512),(512,1024),(1024,1024),(2048,512),(1024,2048),(2048,1024))'))):
    if L % bq == 0 and L % bk == 0:
        try:
            run_blk(bq, bk)
        except Exception as e:  # noqa: BLE001 - probe space freely
            results[f"blk_q{bq}_k{bk}_ms"] = f"fail: {type(e).__name__}"

results["note"] = f"L={L} Hq={Hq} Hkv={Hkv} D={D} causal bf16, repeat-KV GQA"
print(json.dumps(results, indent=1))
