"""Headline benchmark: FULL Nemotron-Nano-9B-v2-scale hybrid backbone
prefill on one TPU chip.

Measures the TimeViper hot path — the 52-layer hybrid (Mamba-2 /
attention / MLP) backbone prefill over a long fused visual+text sequence
(16k tokens = 1000 frames x 16 ToMe tokens/frame; see BASELINE.md). The
attached chip is a 16 GB v5e, so weights run int8 (weight-only per-channel
quantization, train/quantize.py) — prefill is compute-bound, so the number
matches bf16 throughput while the full 52-layer model fits on-chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/sec", "vs_baseline": N}

`vs_baseline` compares against an A100 reference estimate for the same
workload: mamba-ssm chunked-scan prefill on the 9B hybrid sustains roughly
20k tokens/sec/GPU at 16k context (A100 80GB, bf16; derived from the
reference stack's published kernel throughput envelope — no in-repo number
exists, BASELINE.md). Note v5e peak bf16 (197 TFLOP/s) is 63% of A100's.

Env overrides: BENCH_SEQ_LEN (16384), BENCH_LAYERS (52), BENCH_HIDDEN
(4096), BENCH_STEPS (3), BENCH_BATCH (1), BENCH_DTYPE (int8|bf16).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

A100_BASELINE_TOK_S = 20000.0


def main():
    import numpy as np

    from timeviper_tpu.config import NanoConfig
    from timeviper_tpu.models.nano import init_nano_params, nano_forward
    from timeviper_tpu.train.quantize import quantize_params_int8

    L = int(os.environ.get("BENCH_SEQ_LEN", 16384))
    n_layers = int(os.environ.get("BENCH_LAYERS", 52))
    hidden = int(os.environ.get("BENCH_HIDDEN", 4096))
    steps = int(os.environ.get("BENCH_STEPS", 3))
    B = int(os.environ.get("BENCH_BATCH", 1))
    wdtype = os.environ.get("BENCH_DTYPE", "int8")

    full = "M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M-"
    pattern = (full * (n_layers // len(full) + 1))[:n_layers]
    cfg = NanoConfig(
        num_hidden_layers=n_layers,
        hybrid_override_pattern=pattern,
        hidden_size=hidden,
        intermediate_size=hidden * 21504 // 4096,
        mamba_num_heads=hidden // 32,
        # vocab small: the lm_head is excluded from the prefill-path metric
        vocab_size=2048,
    )

    def make_params(key):
        p = init_nano_params(key, cfg, dtype=jnp.bfloat16)
        return quantize_params_int8(p) if wdtype == "int8" else p

    params = jax.jit(make_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (B, L, cfg.hidden_size), jnp.bfloat16
    )

    @jax.jit
    def prefill(params, embeds):
        out = nano_forward(params, cfg, inputs_embeds=embeds, logits_to_keep=1)
        return out["logits"]

    # NOTE: on this image block_until_ready() returns before device
    # completion (axon tunnel); a host fetch of one element is the only
    # reliable sync, so that's what we time.
    def run():
        out = prefill(params, embeds)
        return float(np.asarray(out[0, -1, 0], np.float32))

    run()
    t0 = time.perf_counter()
    for _ in range(steps):
        run()
    dt = (time.perf_counter() - t0) / steps

    tok_s = B * L / dt
    print(json.dumps({
        "metric": f"nano9b_{n_layers}L_{wdtype}_prefill_{L}tok",
        "value": round(tok_s, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tok_s / A100_BASELINE_TOK_S, 3),
    }))


if __name__ == "__main__":
    main()
