"""Headline benchmark: END-TO-END 5k-frame time-to-first-token on one chip.

The north-star workload (BASELINE.md; reference operating point
evaluate.py:100-139, clip-chunked vision generic_vlm.py:274-281):

  5000 frames -> SigLIP-SO400M-384 encode (256-frame clips)
              -> ToMe compression to 16 tokens/frame + MLP projector
              -> 80k fused visual tokens
              -> full 52-layer Nemotron-Nano-9B hybrid prefill (int8
                 weights: the attached chip is a 16 GB v5e)
              -> first-token logits.

Reports frames/sec over the whole pipeline plus the phase split. The
prior headline (backbone-only prefill tokens/sec) remains available as
BENCH_MODE=prefill.

`vs_baseline` divides by a roofline-derived A100-80GB estimate for the
same end-to-end bf16 workload — 157 frames/s, the midpoint of a 40-55%
MFU band over the derived per-phase FLOPs (642 GF/frame encode,
~20 GF/token prefill; full arithmetic and the band in BASELINE.md).
No in-repo or paper number exists; rounds 1-3 used 141 f/s, which
assumed an impossible 20k tok/s A100 prefill (360 TF/s > peak) against
a too-slow encode — the re-derivation nets out HARDER. v5e peak bf16 is
0.63x A100; the int8 MXU (394 TOPS) is the edge that beats it.

Env: BENCH_MODE (e2e|prefill), BENCH_FRAMES (5000), BENCH_CLIP (256),
BENCH_STREAM (0; 1 = per-clip encode->prefill streaming),
BENCH_STEPS (1 e2e / 3 prefill) + the prefill-mode knobs below.
"""

from __future__ import annotations

import functools
import json
import os
import time

import jax
import jax.numpy as jnp

A100_PREFILL_TOK_S = 7000.0  # 45-55% MFU midpoint at ~20 GF/token
A100_E2E_FRAMES_S = 157.0    # BASELINE.md "A100 baseline derivation"

# Fallbacks taken this run; emitted as "degraded" in the JSON when
# non-empty so a crash-adjacent run still reports an honest number with
# its provenance. (Round-4 lesson: the headline instrument OOM'd once
# near the 16 GB ceiling and the round shipped no perf evidence. The
# reference's timing instrument always completes, evaluate.py:681-693.)
DEGRADED: list = []


def _is_oom(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return "RESOURCE_EXHAUSTED" in s or "Resource exhausted" in s


def _guard(phase: str, thunk, fallback=None, fallback_tag: str = ""):
    """Run thunk; on device OOM take the fallback (or return None) and
    record the degradation instead of killing the instrument."""
    import sys
    import traceback

    try:
        return thunk()
    except Exception as e:  # noqa: BLE001 - instrument must survive
        if not _is_oom(e):
            raise
        traceback.print_exc(file=sys.stderr)
        DEGRADED.append(fallback_tag or f"{phase}_skipped_oom")
        print(f"[bench] OOM in {phase}; falling back"
              f" ({fallback_tag or 'skip'})", file=sys.stderr)
        return fallback() if fallback is not None else None


def _sync(arr):
    import numpy as np

    return float(np.asarray(arr.reshape(-1)[0], np.float32))


def bench_e2e():
    from timeviper_tpu.config import SIGLIP_SO400M_384, NanoConfig
    from timeviper_tpu.models.nano import init_nano_params, nano_forward
    from timeviper_tpu.models.projector import init_projector_params, projector_forward
    from timeviper_tpu.models.vit import init_vit_params, vit_forward
    from timeviper_tpu.train.quantize import quantize_params_int8

    F = int(os.environ.get("BENCH_FRAMES", 5000))
    clip = int(os.environ.get("BENCH_CLIP", 256))
    steps = int(os.environ.get("BENCH_STEPS", 1))
    tokens_per_frame = 16

    vcfg = SIGLIP_SO400M_384
    full = "M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M-"
    lcfg = NanoConfig(vocab_size=2048)  # lm_head excluded from the metric

    # vision in int8 by default: encode is ~79% of the e2e wall and
    # compute-bound; W8A8 with static calibrated activation scales runs
    # the int8 MXU at 1.35x the bf16 matmul rate (ops/int8_linear.py).
    # BENCH_VIT_DTYPE=bf16 reverts.
    vit_int8 = os.environ.get("BENCH_VIT_DTYPE", "int8") == "int8"
    vparams = jax.jit(
        lambda k: (quantize_params_int8 if vit_int8 else (lambda p: p))(
            init_vit_params(k, vcfg, jnp.bfloat16))
    )(jax.random.PRNGKey(0))
    pparams = jax.jit(
        lambda k: init_projector_params(
            k, vcfg.hidden_size, lcfg.hidden_size, "tome_mlp",
            dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(1))

    # one clip of pixels, reused per clip step (decode/IO is host-side and
    # overlapped in production; this measures the device pipeline)
    pixels = jax.random.normal(
        jax.random.PRNGKey(3), (clip, 384, 384, 3), jnp.bfloat16)

    if vit_int8:
        from timeviper_tpu.train.quantize import calibrate_act_scales

        # one-time static activation-scale calibration (offline in a real
        # deployment; here on the bench's own input distribution). Runs
        # BEFORE the 9 GB LLM params exist — the r4 crash was this phase
        # with lparams resident — and degrades to weight-only int8 (exact
        # dequant, no act error) rather than dying if it OOMs anyway.
        vparams = _guard(
            "vit_calibration",
            lambda: calibrate_act_scales(
                lambda p, px: vit_forward(p, vcfg, px), vparams,
                [pixels[: min(32, clip)]]),
            fallback=lambda: vparams,
            fallback_tag="vit_w8a8->weight_only_int8")

    # W8A8 for the LLM prefill projections too (BENCH_LLM_W8A8=0 reverts
    # to weight-only int8): calibrated below on real projector outputs.
    llm_w8a8 = os.environ.get("BENCH_LLM_W8A8", "1") == "1"

    @jax.jit
    def encode_clip(vparams, pparams, pixels):
        feats = vit_forward(vparams, vcfg, pixels)      # (clip, 729, 1152)
        proj = projector_forward(                       # ToMe-16 + MLP
            pparams, feats, projector_type="tome_mlp",
            num_compressed_tokens=tokens_per_frame)     # (clip, 16, llm_d)
        return proj.reshape(1, clip * tokens_per_frame, -1).astype(
            jnp.bfloat16)

    # one clip's worth of real projector outputs (4k tokens) for the LLM
    # calibration — produced before lparams exist to keep peak HBM low
    cal_embeds = encode_clip(vparams, pparams, pixels) if llm_w8a8 else None

    lparams = jax.jit(
        lambda k: quantize_params_int8(
            init_nano_params(k, lcfg, dtype=jnp.bfloat16))
    )(jax.random.PRNGKey(2))

    if llm_w8a8:
        from timeviper_tpu.train.quantize import calibrate_act_scales

        lparams = _guard(
            "llm_calibration",
            lambda: calibrate_act_scales(
                lambda p, e: nano_forward(
                    p, lcfg, inputs_embeds=e, logits_to_keep=1)["logits"],
                lparams, [cal_embeds]),
            fallback=lambda: lparams,
            fallback_tag="llm_w8a8->weight_only_int8")
        del cal_embeds

    n_clips = -(-F // clip)
    L = F * tokens_per_frame

    if os.environ.get("BENCH_STREAM", "0") == "1":
        return bench_e2e_stream(vparams, pparams, lparams, lcfg, encode_clip,
                                pixels, F, clip, n_clips, steps)

    # beyond ~6k frames the per-layer wide intermediates exceed HBM next
    # to the int8 weights; the chunked long-context forward streams them
    # (models/longctx.py) — this is what puts 10k frames on one chip
    longctx = os.environ.get("BENCH_LONGCTX") == "1" or L > 98304
    chunk_tokens = 16384

    def make_prefill(use_longctx):
        if use_longctx:
            from timeviper_tpu.models.longctx import nano_forward_longctx

            @functools.partial(jax.jit, donate_argnums=(1,))
            def prefill(lparams, embeds):
                out = nano_forward_longctx(
                    lparams, lcfg, embeds, chunk_tokens=chunk_tokens,
                    logits_to_keep=1)
                return out["logits"]
        else:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def prefill(lparams, embeds):
                out = nano_forward(lparams, lcfg, inputs_embeds=embeds,
                                   logits_to_keep=1)
                return out["logits"]
        return prefill

    def lpad_for(use_longctx):
        return (-(-L // chunk_tokens) * chunk_tokens if use_longctx
                else -(-L // 1024) * 1024)

    prefill, Lpad = make_prefill(longctx), lpad_for(longctx)

    def run():
        t0 = time.perf_counter()
        clips = []
        for i in range(n_clips):
            clips.append(encode_clip(vparams, pparams, pixels))
        _sync(clips[-1])  # vision phase boundary
        t1 = time.perf_counter()
        embeds = jnp.concatenate(clips, axis=1)[:, :L]
        clips.clear()  # free 0.7 GB of clip buffers before the prefill
        embeds = jnp.pad(embeds, ((0, 0), (0, Lpad - L), (0, 0)))
        logits = prefill(lparams, embeds)
        _sync(logits)
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1

    try:
        run()  # warmup / compile
    except Exception as e:  # noqa: BLE001 - instrument must survive
        if not _is_oom(e) or longctx:
            raise
        # full-length prefill didn't fit: the chunked layer-major forward
        # computes the same function at O(chunk) wide-intermediate memory
        DEGRADED.append("prefill->longctx_chunked")
        longctx = True
        prefill, Lpad = make_prefill(True), lpad_for(True)
        run()

    vis_s = llm_s = 0.0
    for _ in range(steps):
        v, l = run()
        vis_s += v / steps
        llm_s += l / steps

    total = vis_s + llm_s
    fps = F / total
    rec = {
        "metric": f"e2e_{F}frames_first_token",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / A100_E2E_FRAMES_S, 3),
        "phases": {"vision_encode_s": round(vis_s, 2),
                   "llm_prefill_s": round(llm_s, 2),
                   "tokens": L},
    }
    if DEGRADED:
        rec["degraded"] = list(DEGRADED)
    print(json.dumps(rec))


def bench_e2e_stream(vparams, pparams, lparams, lcfg, encode_clip, pixels,
                     F, clip, n_clips, steps):
    """Streaming e2e: each clip's fused tokens enter the backbone as soon
    as they exist, via the prefix-cache continuation (the same carried
    conv/SSM state + KV-append machinery serving uses). The host never
    syncs between phases — encode_clip(i+1) is dispatched while the
    device still runs prefill_chunk(i) — and the wide per-layer
    intermediates exist only at chunk size, so 10k+ frames fit without
    the layer-major longctx path. Reference seam: clip-chunked eval
    encode, generic_vlm.py:274-281 (which still runs its phases
    back-to-back)."""
    import functools

    from timeviper_tpu.models.nano import nano_forward
    from timeviper_tpu.models.prefix_cache import nano_forward_continue

    tokens_per_frame = 16
    S = clip * tokens_per_frame
    L = F * tokens_per_frame
    cache_len = n_clips * S

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_first(lparams, embeds):
        out = nano_forward(lparams, lcfg, inputs_embeds=embeds,
                           fill_cache=True, cache_max_len=cache_len,
                           logits_to_keep=1)
        return out["logits"], out["cache"]

    # continuation variants per KV bucket: early chunks attend a short
    # prefix — a static bucket >= length+S caps the flash prefix part at
    # the bucket instead of full capacity (one compile per bucket)
    buckets = [b for b in (8192, 16384, 32768, 65536) if b < cache_len]
    buckets.append(cache_len)

    def bucket_for(end):
        return next(b for b in buckets if b >= end)

    conts = {}

    def prefill_cont(kb):
        if kb not in conts:
            @functools.partial(jax.jit, donate_argnums=(1, 2))
            def cont(lparams, embeds, cache, _kb=kb):
                logits, cache = nano_forward_continue(
                    lparams, lcfg, embeds, cache,
                    jnp.asarray(S, jnp.int32), kv_bucket=_kb)
                return logits, cache

            conts[kb] = cont
        return conts[kb]

    def run():
        t0 = time.perf_counter()
        logits = cache = None
        for i in range(n_clips):
            emb = encode_clip(vparams, pparams, pixels)
            if cache is None:
                logits, cache = prefill_first(lparams, emb)
            else:
                logits, cache = prefill_cont(
                    bucket_for((i + 1) * S))(lparams, emb, cache)
        _sync(logits)
        del cache
        return time.perf_counter() - t0

    run()  # warmup / compile
    total = 0.0
    for _ in range(steps):
        total += run() / steps

    # phase attribution: encode-only wall, measured separately (the
    # streamed run itself has no phase boundary to time)
    _sync(encode_clip(vparams, pparams, pixels))
    t0 = time.perf_counter()
    for _ in range(n_clips):
        e = encode_clip(vparams, pparams, pixels)
    _sync(e)
    enc_s = time.perf_counter() - t0

    fps = F / total
    rec = {
        "metric": f"e2e_{F}frames_first_token",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / A100_E2E_FRAMES_S, 3),
        "phases": {"total_s": round(total, 2),
                   "vision_encode_s": round(enc_s, 2),
                   "llm_stream_s": round(total - enc_s, 2),
                   "tokens": L},
        "note": "streaming: encode and chunked prefill interleaved "
                "per 256-frame clip (prefix-cache continuation)",
    }
    if DEGRADED:
        rec["degraded"] = list(DEGRADED)
    print(json.dumps(rec))


def bench_prefill():
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
        vocab_size=2048,
    )

    def make_params(key):
        p = init_nano_params(key, cfg, dtype=jnp.bfloat16)
        return quantize_params_int8(p) if wdtype == "int8" else p

    params = jax.jit(make_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (B, L, cfg.hidden_size), jnp.bfloat16)

    @jax.jit
    def prefill(params, embeds):
        out = nano_forward(params, cfg, inputs_embeds=embeds,
                           logits_to_keep=1)
        return out["logits"]

    def run():
        return _sync(prefill(params, embeds))

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
        "vs_baseline": round(tok_s / A100_PREFILL_TOK_S, 3),
    }))


def _rescue_reexec() -> bool:
    """Last line of defense: re-run this script in a fresh process with
    the leanest e2e configuration (weight-only int8 LLM, no calibration
    passes, chunked layer-major prefill), staged down in frame count.
    Returns True if some stage emitted a JSON line on stdout. A fresh
    process matters: it releases every HBM buffer and compilation handle
    the crashed attempt held."""
    import subprocess
    import sys

    stages = [
        {"BENCH_LLM_W8A8": "0", "BENCH_LONGCTX": "1"},
        {"BENCH_LLM_W8A8": "0", "BENCH_LONGCTX": "1",
         "BENCH_VIT_DTYPE": "bf16"},
        {"BENCH_LLM_W8A8": "0", "BENCH_LONGCTX": "1",
         "BENCH_VIT_DTYPE": "bf16", "BENCH_FRAMES": "2560",
         "BENCH_CLIP": "128"},
    ]
    for stage in stages:
        env = dict(os.environ, BENCH_RESCUE="1", BENCH_STREAM="0", **stage)
        print(f"[bench] rescue re-exec with {stage}", file=sys.stderr)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            # a hung stage (compile livelock near the HBM ceiling) must
            # not kill the rescue: move on to the next, leaner stage
            print(f"[bench] rescue stage timed out: {stage}",
                  file=sys.stderr)
            continue
        sys.stderr.write(proc.stderr)
        out = [ln for ln in proc.stdout.splitlines()
               if ln.startswith("{")]
        if proc.returncode == 0 and out:
            rec = json.loads(out[-1])
            rec.setdefault("degraded", []).append(
                "rescue_reexec:" + ",".join(f"{k}={v}"
                                            for k, v in stage.items()))
            print(json.dumps(rec))
            return True
    return False


def main():
    # warm starts: the e2e compile set (vision clip + 80k prefill) takes
    # minutes cold through the remote helper; the persistent cache carries
    # it across processes on the same machine
    from timeviper_tpu.utils.cache import enable_compilation_cache

    try:
        enable_compilation_cache()
    except Exception:
        pass
    mode = os.environ.get("BENCH_MODE", "e2e")
    if mode == "prefill":
        bench_prefill()
        return
    try:
        bench_e2e()
    except Exception as e:  # noqa: BLE001 - emit a number or die trying
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        # rescue only memory exhaustion: a deterministic bug would fail
        # all three stages identically and just delay the real traceback
        # by three compile cycles
        if (os.environ.get("BENCH_RESCUE") == "1" or not _is_oom(e)
                or not _rescue_reexec()):
            raise


if __name__ == "__main__":
    main()
