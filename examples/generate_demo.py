"""End-to-end generation through the public API, on synthetic weights.

Shows the pieces a reference (`xiaomi-research/timeviper`) user touches —
build the arch from registry names, make a processor-style prompt with
`<image>` placeholders, run `Generator.generate` with pixels, and
optionally shard the prefill over a device mesh — without needing real
checkpoints or videos (weights are random; tokens are meaningless but the
plumbing is the production one: ViT -> ToMe projector -> fused hybrid
prefill -> cached decode).

Run anywhere:         python examples/generate_demo.py
Multi-chip (8 CPUs):  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                      python examples/generate_demo.py --mesh_seq 8

With real weights, replace init_vlm_params with
train/convert.py:convert_* outputs and the tokenizer ids with the real
processor's (data/processor.py); the eval CLI (eval/evaluate.py) wires
all of that for the 14 benchmarks.
"""

import argparse
import os
import sys

import numpy as np

# runnable as `python examples/generate_demo.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh_seq", type=int, default=1)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--max_new_tokens", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # a tiny-model plumbing demo gains nothing from an accelerator: pin CPU
    # (and do it via config, not env — a sitecustomize-registered TPU plugin
    # outranks JAX_PLATFORMS in some images, incl. the dev one)
    jax.config.update("jax_platforms", "cpu")

    from timeviper_tpu.config import (
        VLMConfig, tiny_nano_config, tiny_vit_config)
    from timeviper_tpu.models.generate import Generator
    from timeviper_tpu.models.vlm import VLMArch, init_vlm_params

    # scaled-down configs so the demo runs in seconds; swap in
    # config.py's registry entries (SIGLIP_SO400M_384, NanoConfig()) +
    # converted checkpoints for the real model
    arch = VLMArch(
        vlm=VLMConfig(arch_specifier="tome_mlp-2"),
        vision=tiny_vit_config(),
        llm=tiny_nano_config(),
        llm_family="nano",
    )
    params = init_vlm_params(jax.random.PRNGKey(0), arch, dtype=jnp.float32)

    mesh = None
    if args.mesh_seq > 1:
        from timeviper_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(data=1, seq=args.mesh_seq)

    gen = Generator(params, arch, terminator_ids=[2],
                    max_new_tokens=args.max_new_tokens,
                    cache_dtype=jnp.float32, mesh=mesh)

    img_id = arch.llm.vocab_size - 1  # the <image> placeholder id
    prompt = [5, 6] + [img_id] * args.frames + [9, 10, 11]
    pixels = np.random.RandomState(0).rand(
        args.frames, arch.vision.image_size, arch.vision.image_size, 3,
    ).astype(np.float32)

    out = gen.generate(prompt, pixels=pixels, image_token_id=img_id)
    print(f"prompt ids : {prompt}")
    print(f"new tokens : {out.token_ids.tolist()}")
    if mesh is not None:
        print(f"mesh       : {dict(mesh.shape)} (sequence-sharded prefill)")


if __name__ == "__main__":
    main()
