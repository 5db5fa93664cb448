"""Serving engine: continuous batching must match the offline generator."""

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import VLMConfig, tiny_nano_config, tiny_vit_config
from timeviper_tpu.models.generate import Generator
from timeviper_tpu.models.vlm import VLMArch, init_vlm_params
from timeviper_tpu.serving import Request, ServingEngine


def test_continuous_batching_matches_offline():
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)

    prompts = [[5 + i, 6, 7, 8] for i in range(5)]
    gen = Generator(params, arch, terminator_ids=[2], max_new_tokens=6,
                    cache_dtype=jnp.float32)
    offline = [gen.generate(p).token_ids.tolist() for p in prompts]

    # 5 requests through 2 slots forces queueing + slot reuse
    eng = ServingEngine(
        params, arch, terminator_ids=[2], num_slots=2, max_len=256,
        max_new_tokens=6, cache_dtype=jnp.float32,
    )
    reqs = [Request(request_id=i, input_ids=p, max_new_tokens=6)
            for i, p in enumerate(prompts)]
    out = eng.run(reqs)
    assert all(r.done for r in out)
    served = [r.output_ids for r in out]
    assert served == offline, (served, offline)
