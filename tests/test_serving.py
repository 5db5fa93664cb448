"""Serving engine: continuous batching must reproduce the model's greedy
continuations.

Note on tolerance: the engine's stepwise cached decode and the full forward
compile to different (correct) programs whose fp32 results drift ~5e-3
apart after a few steps; with random weights, logits are near-uniform so
ranks flip on such ties. Each served token is therefore checked as a
MARGIN against teacher-forced full-forward logits — a slot/state bug
(wrong position, stale cache, cross-request leak) shifts logits O(0.3+).
Bitwise equality across engine runs is deliberately NOT asserted: XLA:CPU's
oneDNN matmul custom-calls pick alignment-dependent kernels at runtime, so
the same executable on equal values in different buffers can differ in the
last bits (observed empirically; on TPU execution is deterministic).
"""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import VLMConfig, tiny_nano_config, tiny_vit_config
from timeviper_tpu.models.nano import nano_forward
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params
from timeviper_tpu.serving import Request, ServingEngine


def test_continuous_batching_matches_teacher_forcing():
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)

    prompts = [[5 + i, 6, 7, 8] for i in range(5)]
    # 5 requests through 2 slots forces queueing + slot reuse; bursts of 4
    # with max_new 6 forces a mid-burst stop
    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=6, cache_dtype=jnp.float32, steps_per_sync=4,
    )
    reqs = [Request(request_id=i, input_ids=p, max_new_tokens=6)
            for i, p in enumerate(prompts)]
    out = eng.run(reqs)
    assert all(r.done for r in out)
    assert all(len(r.output_ids) == 6 for r in out)

    _check_teacher_forced(params, arch, prompts, out)

    # second engine run: same scheduling, same lengths, and every token
    # again teacher-forced-valid (see module docstring for why bitwise
    # equality is not asserted on XLA:CPU)
    eng2 = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=6, cache_dtype=jnp.float32, steps_per_sync=4,
    )
    reqs2 = [Request(request_id=i, input_ids=p, max_new_tokens=6)
             for i, p in enumerate(prompts)]
    out2 = eng2.run(reqs2)
    assert [len(r.output_ids) for r in out2] == [len(r.output_ids) for r in out]
    _check_teacher_forced(params, arch, prompts, out2)


def _check_teacher_forced(params, arch, prompts, out):
    """Every served token must be within fp-noise margin of the argmax of
    the teacher-forced full forward at its position."""
    for p, r in zip(prompts, out):
        seq = jnp.asarray([p + r.output_ids[:-1]])
        logits = np.asarray(
            nano_forward(params["llm_backbone"], arch.llm,
                         input_ids=seq)["logits"][0])
        for t, tok in enumerate(r.output_ids):
            row = logits[len(p) - 1 + t]
            assert row[tok] >= row.max() - 5e-2, (
                t, tok, int(row.argmax()), float(row.max() - row[tok]))


def test_engine_with_seq_mesh_matches_teacher_forcing():
    """ServingEngine(mesh=...) — sequence-sharded prefill feeding the slot
    decode (the vLLM-TP serving analog) — must serve teacher-forced-valid
    tokens and complete every request, same as the mesh-less engine."""
    from timeviper_tpu.parallel.sharding import make_mesh

    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    prompts = [[5 + i, 6, 7, 8, 9, 10] for i in range(3)]

    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=5, cache_dtype=jnp.float32, steps_per_sync=4,
        mesh=make_mesh(data=1, seq=8),
    )
    out = eng.run([Request(request_id=i, input_ids=p, max_new_tokens=5)
                   for i, p in enumerate(prompts)])
    assert all(r.done for r in out)
    assert all(len(r.output_ids) == 5 for r in out)
    _check_teacher_forced(params, arch, prompts, out)


def test_batched_prefill_mixed_buckets_and_pixels():
    """Batched same-bucket prefill: 7 requests across two buckets plus a
    pixels request (serial path) through 4 slots — power-of-two group
    splitting, row-indexed slot inserts, and the serial fallback must all
    serve teacher-forced-valid tokens; batch_prefill=False must give the
    same output lengths."""
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    prompts = ([[5 + i, 6, 7, 8] for i in range(3)]          # bucket A
               + [[9 + i] * 40 for i in range(3)])           # bucket B
    import numpy as _np

    pixels = _np.random.default_rng(0).random((2, 28, 28, 3)).astype(
        _np.float32)

    def make_reqs():
        reqs = [Request(request_id=i, input_ids=p, max_new_tokens=4)
                for i, p in enumerate(prompts)]
        reqs.append(Request(request_id=50, input_ids=[5, 500, 500, 9],
                            pixels=pixels, image_token_id=500,
                            max_new_tokens=4))
        return reqs

    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=4, max_len=256,
        max_new_tokens=4, cache_dtype=jnp.float32, steps_per_sync=2,
    )
    assert eng.batch_prefill
    out = eng.run(make_reqs())
    assert all(r.done and not r.error for r in out)
    assert all(len(r.output_ids) == 4 for r in out)
    _check_teacher_forced(params, arch, prompts, out[:6])

    eng2 = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=4, max_len=256,
        max_new_tokens=4, cache_dtype=jnp.float32, steps_per_sync=2,
        batch_prefill=False,
    )
    out2 = eng2.run(make_reqs())
    assert [len(r.output_ids) for r in out2] == \
        [len(r.output_ids) for r in out]
    _check_teacher_forced(params, arch, prompts, out2[:6])


def test_chunked_prefill_long_prompt():
    """prefill_chunk_tokens: a long prompt advances one chunk per round
    through the continuation path while short requests keep decoding.
    The chunked result must be teacher-forced-valid, identical in length
    to the whole-prefill engine, and short streams must complete."""
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    long_prompt = rng.integers(3, 250, (100,)).tolist()  # > 2 chunks of 32
    shorts = [[5 + i, 6, 7, 8] for i in range(3)]

    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=3, max_len=256,
        max_new_tokens=4, cache_dtype=jnp.float32, steps_per_sync=2,
        prefill_chunk_tokens=32,
    )
    reqs = [Request(request_id=0, input_ids=long_prompt, max_new_tokens=4)]
    reqs += [Request(request_id=1 + i, input_ids=p, max_new_tokens=4)
             for i, p in enumerate(shorts)]
    out = eng.run(reqs)
    assert all(r.done and not r.error for r in out)
    assert all(len(r.output_ids) == 4 for r in out)
    _check_teacher_forced(params, arch, [long_prompt] + shorts, out)

    # two long prompts: the second waits (requeued) and still completes
    eng2 = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=3, cache_dtype=jnp.float32, steps_per_sync=2,
        prefill_chunk_tokens=32,
    )
    longs = [rng.integers(3, 250, (70,)).tolist() for _ in range(2)]
    out2 = eng2.run([Request(request_id=i, input_ids=p, max_new_tokens=3)
                     for i, p in enumerate(longs)])
    assert all(r.done and not r.error and len(r.output_ids) == 3
               for r in out2)
    _check_teacher_forced(params, arch, longs, out2)

    # capacity rejection stays per-request
    eng3 = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=64,
        max_new_tokens=4, cache_dtype=jnp.float32,
        prefill_chunk_tokens=32,
    )
    bad = eng3.run([Request(request_id=9, input_ids=[5] * 80,
                            max_new_tokens=4)])
    assert bad[0].error and "exceeds engine max_len" in bad[0].error


def test_terminator_stops_early():
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(1), arch, dtype=jnp.float32)
    # make every token a terminator: requests finish after 1 token
    eng = ServingEngine(
        params, arch, terminator_ids=list(range(arch.llm.vocab_size)),
        num_slots=2, max_len=256, max_new_tokens=6,
        cache_dtype=jnp.float32, steps_per_sync=4,
    )
    reqs = [Request(request_id=i, input_ids=[5, 6, 7], max_new_tokens=6)
            for i in range(3)]
    out = eng.run(reqs)
    assert all(r.done for r in out)
    assert all(len(r.output_ids) == 1 for r in out)


def test_continuous_batching_qwen2_family():
    """Same engine over the pure-KV qwen2 cache (different slot pytree)."""
    from timeviper_tpu.config import tiny_qwen2_config
    from timeviper_tpu.models.qwen2 import qwen2_forward

    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_qwen2_config(),
        llm_family="qwen2",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    prompts = [[5 + i, 6, 7, 8] for i in range(3)]
    # max_len must cover bucket(128) + max_new; an undersized engine
    # rejects the REQUEST (marks it failed) without aborting the batch —
    # like the reference vLLM path's per-request failures
    bad = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=128,
        max_new_tokens=4, cache_dtype=jnp.float32, steps_per_sync=2,
    )
    rejected = bad.run([Request(request_id=0, input_ids=prompts[0],
                                max_new_tokens=4)])
    assert rejected[0].done
    assert rejected[0].error and "exceeds engine max_len" in rejected[0].error
    assert rejected[0].output_ids == []
    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=4, cache_dtype=jnp.float32, steps_per_sync=2,
    )
    out = eng.run([Request(request_id=i, input_ids=p, max_new_tokens=4)
                   for i, p in enumerate(prompts)])
    assert all(r.done for r in out)
    assert all(len(r.output_ids) == 4 for r in out)
    for p, r in zip(prompts, out):
        seq = jnp.asarray([p + r.output_ids[:-1]])
        logits = np.asarray(
            qwen2_forward(params["llm_backbone"], arch.llm,
                          input_ids=seq)["logits"][0])
        for t, tok in enumerate(r.output_ids):
            row = logits[len(p) - 1 + t]
            assert row[tok] >= row.max() - 5e-2, (
                t, tok, int(row.argmax()), float(row.max() - row[tok]))


def test_engine_pdrop_requests_match_offline_generator():
    """ServingEngine(pdrop_frames=...): vision requests run the bucketed
    pdrop prefill (compacted cache + per-layer kv_len + TransV ca_kv) and
    decode re-merges the dropped rows per slot — tokens must match the
    offline pdrop Generator greedily, with a text-only request sharing
    the batch (its zeroed ca_kv rows must be inert). The reference's vLLM
    path cannot serve pdrop at all (SURVEY.md #27). Pattern places an
    attention layer BEFORE the drop stage (the 9B layout) so the
    pre-drop-rows decode path is exercised in slots."""
    from timeviper_tpu.models.generate import Generator

    llm = tiny_nano_config(
        num_hidden_layers=6, hybrid_override_pattern="M-*M-*",
        use_pdrop=True, pdrop_type="uni_3_0.5",
        merge_module="CrossAttention",
    )
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=llm,
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)
    img = 500
    rng = np.random.default_rng(0)
    frames = 2
    pixels = rng.random(
        (frames, arch.vision.image_size, arch.vision.image_size, 3)
    ).astype(np.float32)
    vid_prompt = [5, img, img, 9, 10, 11]

    from timeviper_tpu.ops.sampling import SamplingParams

    greedy = SamplingParams(temperature=0.0)
    gen = Generator(params, arch, terminator_ids=[2], pad_token_id=0,
                    max_new_tokens=5, cache_dtype=jnp.float32,
                    sampling=greedy)
    want = gen.generate(vid_prompt, pixels=pixels, image_token_id=img,
                        use_pdrop=True)

    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=5, cache_dtype=jnp.float32, steps_per_sync=2,
        sampling=greedy, pdrop_frames=frames,
    )
    reqs = [
        Request(request_id=0, input_ids=vid_prompt, pixels=pixels,
                image_token_id=img, max_new_tokens=5),
        Request(request_id=1, input_ids=[6, 7, 8, 9], max_new_tokens=5),
    ]
    out = eng.run(reqs)
    assert all(r.done and r.error is None for r in out), \
        [(r.request_id, r.error) for r in out]
    assert out[0].output_ids == list(want.token_ids), (
        out[0].output_ids, list(want.token_ids))
    # the text-only co-tenant must be teacher-forced valid
    _check_teacher_forced(params, arch, [reqs[1].input_ids], [out[1]])
