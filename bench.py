"""Headline benchmark: hybrid-backbone prefill throughput on one TPU chip.

Measures the TimeViper hot path — the Nemotron-Nano-9B-v2-scale hybrid
(Mamba-2 / attention / MLP) backbone prefill over a long fused
visual+text sequence (the 5k-frame regime is 5k frames x 16 ToMe
tokens/frame; see BASELINE.md). Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "tokens/sec", "vs_baseline": N}

`vs_baseline` compares against an A100 reference estimate for the same
workload: mamba-ssm chunked-scan prefill on the 9B hybrid sustains roughly
20k tokens/sec/GPU at 16k context (A100 80GB, bf16; derived from the
reference stack's published kernel throughput envelope — no in-repo number
exists, BASELINE.md). Target is >= 2x.

The attached chip (v5e, 16 GB HBM) cannot hold the full 9B bf16 model, so
the default measures a structurally-identical half-depth model (26 of 52
layers) and reports the depth-extrapolated full-model tokens/sec (per-token
cost is linear in depth; the metric name records both).

Env overrides: BENCH_SEQ_LEN (default 8192), BENCH_LAYERS (default 26),
BENCH_EXTRAPOLATE_LAYERS (52), BENCH_HIDDEN (default 4096), BENCH_STEPS
(default 3), BENCH_BATCH (1).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

A100_BASELINE_TOK_S = 20000.0


def main():
    from timeviper_tpu.config import NanoConfig
    from timeviper_tpu.models.nano import init_nano_params, nano_forward

    L = int(os.environ.get("BENCH_SEQ_LEN", 16384))
    n_layers = int(os.environ.get("BENCH_LAYERS", 26))
    full_layers = int(os.environ.get("BENCH_EXTRAPOLATE_LAYERS", 52))
    steps = int(os.environ.get("BENCH_STEPS", 3))
    hidden = int(os.environ.get("BENCH_HIDDEN", 4096))
    B = int(os.environ.get("BENCH_BATCH", 1))

    # Nemotron-Nano-9B-v2 pattern truncated/extended to n_layers
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

    params = jax.jit(
        lambda k: init_nano_params(k, cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (B, L, cfg.hidden_size), jnp.bfloat16
    )

    @jax.jit
    def prefill(params, embeds):
        out = nano_forward(params, cfg, inputs_embeds=embeds, logits_to_keep=1)
        return out["logits"]

    # compile + warmup. NOTE: on this image block_until_ready() returns
    # before device completion (axon tunnel); a host fetch of one element is
    # the only reliable sync, so that's what we time.
    import numpy as np

    def run():
        out = prefill(params, embeds)
        return float(np.asarray(out[0, -1, 0], np.float32))

    run()
    t0 = time.perf_counter()
    for _ in range(steps):
        run()
    dt = (time.perf_counter() - t0) / steps

    tok_s = B * L / dt
    # depth-linear extrapolation to the full model (see module docstring)
    tok_s_full = tok_s * n_layers / full_layers
    print(json.dumps({
        "metric": (
            f"nano9b_prefill_{L}tok_tokens_per_sec"
            f"_extrap_from_{n_layers}L"
        ),
        "value": round(tok_s_full, 1),
        "unit": "tokens/sec",
        "vs_baseline": round(tok_s_full / A100_BASELINE_TOK_S, 3),
    }))


if __name__ == "__main__":
    main()
