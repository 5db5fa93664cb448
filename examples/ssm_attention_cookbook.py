"""SSM attention visualization cookbook (script form of the reference's
nano_attention_visualization_cookbook.ipynb).

Loads a model (or builds a random tiny one), runs a prompt, materializes
the Mamba-2 mixing matrices for chosen layers, and plots attention across
depth. Saves a grid of heatmaps to --out.

    python examples/ssm_attention_cookbook.py --out attn.png
    python examples/ssm_attention_cookbook.py --checkpoint ckpts/model \
        --prompt "Describe the video." --layers 0 8 16 24
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--prompt", default="What happens in the video?")
    ap.add_argument("--layers", type=int, nargs="*", default=None)
    ap.add_argument("--heads", type=int, nargs="*", default=[0])
    ap.add_argument("--out", default="ssm_attention.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from timeviper_tpu.visualize import collect_ssm_attention

    if args.checkpoint:
        from timeviper_tpu.models.api import load_pretrained_vlm

        model = load_pretrained_vlm(args.checkpoint)
        cfg = model.arch.llm
        params = model.params["llm_backbone"]
        ids = model.processor.tokenize(
            model.template.prompt_for_generation(args.prompt))
        embeds = jnp.take(
            params["embeddings"], jnp.asarray([ids]), axis=0)
    else:
        from timeviper_tpu.config import tiny_nano_config
        from timeviper_tpu.models.nano import init_nano_params

        cfg = tiny_nano_config()
        params = init_nano_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        embeds = jax.random.normal(
            jax.random.PRNGKey(1), (1, 48, cfg.hidden_size))

    layers = args.layers or list(cfg.mamba_layer_indices)[:6]
    attns = collect_ssm_attention(
        params, cfg, embeds, layer_indices=layers, heads=args.heads)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(attns)
    fig, axes = plt.subplots(
        len(args.heads), n, figsize=(3 * n, 3 * len(args.heads)),
        squeeze=False)
    for col, (layer, a) in enumerate(sorted(attns.items())):
        a = np.abs(np.asarray(a[0], np.float32))
        for row in range(len(args.heads)):
            m = a[row]
            axes[row][col].imshow(
                np.log1p(m), cmap="viridis", interpolation="nearest")
            axes[row][col].set_title(f"layer {layer} head {args.heads[row]}")
            axes[row][col].axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"saved {args.out} ({n} layers x {len(args.heads)} heads)")


if __name__ == "__main__":
    main()
