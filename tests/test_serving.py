"""Serving engine: continuous batching must reproduce the model's greedy
continuations.

Note on tolerance: the engine's vmapped decode and the offline generator's
while_loop compile to different (correct) programs; with random weights,
near-tie logits can flip argmax between them. Each served token is checked
against teacher-forced full-forward logits (top-2 membership + logit gap),
which still fails loudly on any cache/state corruption, plus exact
determinism across engine runs.
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

    # teacher-forced check: every served token must be (near-)argmax of the
    # full forward at its position
    for p, r in zip(prompts, out):
        seq = jnp.asarray([p + r.output_ids[:-1]])
        logits = np.asarray(
            nano_forward(params["llm_backbone"], arch.llm,
                         input_ids=seq)["logits"][0])
        for t, tok in enumerate(r.output_ids):
            pos = len(p) - 1 + t
            row = logits[pos]
            top2 = row.argsort()[-2:]
            assert tok in top2, (t, tok, row.argmax())
            # if not the argmax, it must be a near-tie
            if tok != row.argmax():
                assert row[row.argmax()] - row[tok] < 1e-3

    # engine determinism: identical second run
    eng2 = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=6, cache_dtype=jnp.float32, steps_per_sync=4,
    )
    reqs2 = [Request(request_id=i, input_ids=p, max_new_tokens=6)
             for i, p in enumerate(prompts)]
    out2 = eng2.run(reqs2)
    assert [r.output_ids for r in out] == [r.output_ids for r in out2]


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
        num_slots=2, max_len=128, max_new_tokens=6,
        cache_dtype=jnp.float32, steps_per_sync=4,
    )
    reqs = [Request(request_id=i, input_ids=[5, 6, 7], max_new_tokens=6)
            for i in range(3)]
    out = eng.run(reqs)
    assert all(r.done for r in out)
    assert all(len(r.output_ids) == 1 for r in out)
