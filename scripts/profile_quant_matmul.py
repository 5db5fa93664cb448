"""Measure W8A8 vs weight-only-int8 vs bf16 matmul rates at nano prefill shapes.

Times the three dominant projection shapes of the 9B hybrid backbone
(in_proj, out_proj, MLP up) at a 16k-token chunk under each quantization
scheme, reporting ms and effective TFLOP/s. This is the measurement that
justified W8A8 (int8 MXU ~1.35x the bf16 matmul rate on v5e) for the LLM
prefill and the ViT (ops/int8_linear.py). Run on the TPU:
`python scripts/profile_quant_matmul.py`.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _sync(a):
    return float(np.asarray(a.reshape(-1)[0], np.float32))


def _timeit(fn, steps=3):
    fn()
    t0 = time.perf_counter()
    for _ in range(steps):
        fn()
    return (time.perf_counter() - t0) / steps


# nano mamba layer projection shapes at chunk=16k tokens:
#   in_proj  4096 -> 8192+... (gate 8192 + x 8192 + B/C/dt small)
#   out_proj 8192 -> 4096
# mlp: 4096 -> 21504 -> 4096 (few layers). Use the two dominant shapes.
M = 16384
shapes = {"in_proj_gate_x": (4096, 8192), "out_proj": (8192, 4096),
          "mlp_up": (4096, 21504)}
REPS = 4
results = {}
for name, (K, N) in shapes.items():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (K, N)) * 0.02).astype(jnp.bfloat16)
    amax = jnp.abs(w.astype(jnp.float32)).max(0)
    ws = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / ws), -127, 127).astype(jnp.int8)
    act_inv = jnp.float32(127.0 / 4.0)

    def _recycle(out, K=K, N=N):
        if N < K:
            out = jnp.tile(out, (1, -(-K // N)))
        return out[:, :K]

    def bf16(y, w=w):
        return _recycle(y @ w).astype(jnp.bfloat16)

    def wonly(y, wq=wq, ws=ws):
        wd = wq.astype(jnp.bfloat16) * ws.astype(jnp.bfloat16)
        return _recycle(y @ wd).astype(jnp.bfloat16)

    def w8a8(y, wq=wq, ws=ws):
        yq = jnp.clip(jnp.round(y * act_inv), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (ws / act_inv)
        return _recycle(out).astype(jnp.bfloat16)

    for label, fn in (("bf16", bf16), ("w8_weight_only", wonly), ("w8a8", w8a8)):
        @jax.jit
        def chain(y, fn=fn):
            for _ in range(REPS):
                y = fn(y)
            return y
        dt = _timeit(lambda: _sync(chain(x)))
        ms = (dt * 1000 - 30) / REPS
        gflop = 2 * M * K * N / 1e9
        results[f"{name}_{label}"] = {
            "ms": round(ms, 2), "tflops": round(gflop / ms, 1)}
        print(f"{name}_{label}: {results[f'{name}_{label}']}", flush=True)

print(json.dumps(results, indent=1))
