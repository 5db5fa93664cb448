"""High-level model API: load a checkpoint, get a text-in/text-out model.

The reference's equivalent is `GenericTimeViperVLM.from_pretrained`
(generic_vlm.py:874-910) + the registry factories (model/__init__.py:40-133).
A checkpoint directory contains:

* `config.json` — {"model_id", "vision_backbone_id", "llm_backbone_id",
  "arch_specifier", "conv_template", ...} (same keys the reference persists)
* model weights — torch `.bin`/`.safetensors` (converted on load via
  train/convert.py) or an orbax sharded checkpoint under `orbax/`
* tokenizer files readable by HF AutoTokenizer
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import (
    VLMConfig,
    get_llm_backbone_config,
    get_vision_backbone_config,
)
from timeviper_tpu.data.conversation import CONV_TEMPLATES, ChatTemplate
from timeviper_tpu.data.image_processing import transform_for_family
from timeviper_tpu.data.processor import Processor
from timeviper_tpu.models.generate import Generator
from timeviper_tpu.models.vlm import VLMArch
from timeviper_tpu.ops.sampling import SamplingParams


def build_arch(vlm_cfg: VLMConfig) -> VLMArch:
    ventry = get_vision_backbone_config(vlm_cfg.vision_backbone_id)
    lentry = get_llm_backbone_config(vlm_cfg.llm_backbone_id)
    if ventry["family"] == "multi":
        towers = []
        for bid in ventry["backbones"]:
            sub = get_vision_backbone_config(bid)
            towers.append((bid, sub["family"], sub["config"]))
        return VLMArch(
            vlm=vlm_cfg,
            vision=towers[0][2],
            llm=lentry["config"],
            llm_family=lentry["family"],
            vision_family="multi",
            vision_backbones=tuple(towers),
        )
    return VLMArch(
        vlm=vlm_cfg,
        vision=ventry["config"],
        llm=lentry["config"],
        llm_family=lentry["family"],
        vision_family=ventry["family"],
    )


@dataclass
class TimeViperModel:
    """Loaded VLM + processor + generation engine."""

    arch: VLMArch
    params: Dict[str, Any]
    processor: Processor
    template: ChatTemplate
    generator: Generator
    default_use_pdrop: bool = False

    def prefill_video_prefix(
        self,
        input_ids: Sequence[int] | np.ndarray,
        pixels: np.ndarray,
        suffix_budget: int = 1024,
    ):
        """Prefill a shared `system + <video>` prefix once; returns a
        PrefixState reusable by generate(prefix=...) for every question on
        the same video (models/prefix_cache.py)."""
        return self.generator.prefill_prefix(
            list(np.asarray(input_ids).tolist()),
            pixels=pixels,
            image_token_id=self.processor.image_token_id,
            suffix_budget=suffix_budget,
            use_pdrop=self.default_use_pdrop,
        )

    def generate(
        self,
        input_ids: Sequence[int] | np.ndarray,
        pixels: Optional[np.ndarray] = None,
        answer_prompt: Optional[str] = None,
        rng_seed: int = 0,
        use_pdrop: Optional[bool] = None,
        prefix=None,
    ) -> str:
        """One prompt -> decoded completion text. With `prefix`,
        `input_ids` is the post-video suffix only."""
        answer_ids = None
        if answer_prompt:
            answer_ids = self.processor.tokenize(answer_prompt)
        out = self.generator.generate(
            list(np.asarray(input_ids).tolist()),
            pixels=pixels,
            image_token_id=self.processor.image_token_id,
            answer_prompt_ids=answer_ids,
            use_pdrop=(self.default_use_pdrop if use_pdrop is None
                       else use_pdrop),
            rng_seed=rng_seed,
            prefix=prefix,
        )
        toks = [
            int(t) for t in out.token_ids
            if t >= 0 and t not in self.processor.terminator_ids
        ]
        return self.processor.decode(toks).strip()

    def chat(self, user_text: str, frames: Optional[np.ndarray] = None,
             **kw) -> str:
        nf = 0 if frames is None else frames.shape[0]
        prompt = self.template.prompt_for_generation(
            ("<image>" * nf + "\n" if nf else "") + user_text
        )
        enc = self.processor(
            prompt, videos=[list(frames)] if nf else None
        )
        return self.generate(enc["input_ids"], pixels=enc["pixels"], **kw)


def load_pretrained_vlm(
    checkpoint: str,
    conv_template: Optional[str] = None,
    max_new_tokens: int = 128,
    use_pdrop: bool = False,
    dtype=jnp.bfloat16,
    sampling: SamplingParams = SamplingParams(),
    quantize_int8: bool = False,
    mesh=None,
    speculative: Optional[str] = None,
    n_draft: int = 7,
) -> TimeViperModel:
    """Load a VLM checkpoint dir (see module docstring for layout).

    `quantize_int8=True` applies weight-only int8 to the LLM backbone
    (train/quantize.py) — halves weight HBM so the 9B fits one 16 GB chip
    and roughly doubles bandwidth-bound decode.

    `speculative="ngram"` turns on prompt-lookup speculative decoding for
    greedy single-prompt generation (models/speculative.py): K drafted
    tokens verified per forward, token-identical output. No reference
    equivalent — its HF loop is one token per forward and its vLLM path
    cannot speculate over mamba caches (modeling_nano.py:484-546).

    `mesh`: multi-chip inference (the vLLM TP=n_gpus analog,
    vllm_infer.py:44-60). A `model` axis > 1 shards the params with the
    TP rules (prefill + decode partition via GSPMD); a `seq` axis > 1
    runs the sequence-sharded prefill (parallel/seq_parallel.py).
    """
    with open(os.path.join(checkpoint, "config.json")) as f:
        meta = json.load(f)
    vlm_cfg = VLMConfig(
        model_id=meta.get("model_id", "timeviper"),
        vision_backbone_id=meta.get(
            "vision_backbone_id", "siglip-vit-so400m-384px"),
        llm_backbone_id=meta.get("llm_backbone_id", "nano-9b-v2"),
        arch_specifier=meta.get("arch_specifier", "tome_mlp-16"),
    )
    arch = build_arch(vlm_cfg)
    # pdrop settings persist on the checkpoint config like the reference
    # carries them on NemotronHConfig (configuration_nano.py:179)
    if use_pdrop or meta.get("use_pdrop"):
        import dataclasses as _dc

        arch = _dc.replace(arch, llm=_dc.replace(
            arch.llm,
            use_pdrop=True,
            pdrop_type=meta.get("pdrop_type", arch.llm.pdrop_type),
            merge_module=meta.get("merge_module", arch.llm.merge_module),
        ))

    # weights
    orbax_dir = os.path.join(checkpoint, "orbax")
    if os.path.isdir(orbax_dir):
        from timeviper_tpu.train.checkpoint import restore_params

        params = restore_params(orbax_dir)
    else:
        from timeviper_tpu.train.convert import (
            convert_vlm_checkpoint,
            load_torch_state_dict,
        )

        weight_files = [
            f for f in os.listdir(checkpoint)
            if f.endswith((".bin", ".pt", ".safetensors"))
        ]
        sd: Dict[str, np.ndarray] = {}
        for wf in sorted(weight_files):
            sd.update(load_torch_state_dict(os.path.join(checkpoint, wf)))
        params = convert_vlm_checkpoint(sd, arch, dtype=np.dtype("float32"))
        import jax

        params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, dtype) if getattr(x, "ndim", 0) >= 2
            else jnp.asarray(x), params)

    if quantize_int8:
        import jax as _jax

        from timeviper_tpu.train.quantize import quantize_params_int8

        params["llm_backbone"] = _jax.jit(quantize_params_int8)(
            params["llm_backbone"])

    # tokenizer + processor
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(checkpoint, use_fast=True)
    ventry = get_vision_backbone_config(vlm_cfg.vision_backbone_id)
    transform = transform_for_family(
        ventry["family"] if ventry["family"] != "multi" else "siglip",
        arch.vision.image_size,
    )
    processor = Processor.build(tokenizer, transform, arch.llm_family)

    template = CONV_TEMPLATES[
        conv_template or meta.get(
            "conv_template",
            "nano_base" if arch.llm_family == "nano" else "qwen2")
    ]
    if mesh is not None and int(mesh.shape.get("model", 1)) > 1:
        from timeviper_tpu.parallel.sharding import shard_params

        params = shard_params(params, mesh, fsdp_params=False)
    generator = Generator(
        params, arch,
        terminator_ids=processor.terminator_ids,
        pad_token_id=tokenizer.pad_token_id or 0,
        max_new_tokens=max_new_tokens,
        sampling=sampling,
        mesh=mesh,
        speculative=speculative,
        n_draft=n_draft,
    )
    return TimeViperModel(
        arch=arch, params=params, processor=processor, template=template,
        generator=generator,
        default_use_pdrop=bool(use_pdrop or meta.get("use_pdrop")),
    )
