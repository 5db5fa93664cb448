"""Typed configuration dataclasses and string registries.

Mirrors the reference's config surface (reference: timeviper/model/llm/llm_repo/
nano/configuration_nano.py:133-258, timeviper/model/vit/registry.py:23-113,
timeviper/model/llm/llm_registry.py:64-97) as frozen dataclasses that are safe
to close over in jitted functions (hashable, static).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


# ---------------------------------------------------------------------------
# pdrop micro-DSL
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PdropStage:
    """One pdrop stage parsed from the `type_layer_ratio` micro-DSL.

    Reference semantics (modeling_nano.py:1465-1480): `pdrop_type` is e.g.
    ``"uni_14_0.8-attn_21_0.6"``: at layer 14 keep 80% of visual tokens chosen
    uniformly; at layer 21 keep 60% ranked by the last instruction token's
    attention (using that layer's q/k projections — layer must be attention).
    """

    compress_type: str  # "uni" | "attn"
    layer: int
    ratio: float


def parse_pdrop_type(pdrop_type: str) -> Tuple[PdropStage, ...]:
    stages = []
    for part in pdrop_type.split("-"):
        typ, layer, ratio = part.split("_")
        stages.append(PdropStage(typ, int(layer), float(ratio)))
    return tuple(stages)


# ---------------------------------------------------------------------------
# LLM backbone configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NanoConfig:
    """Nemotron-H hybrid (Mamba-2 / attention / MLP) backbone config.

    Defaults are the Nemotron-Nano-9B-v2 scale (reference:
    configuration_nano.py:133-180).  `hybrid_override_pattern` chars:
    M = Mamba-2 mixer, * = attention, - = MLP.
    """

    vocab_size: int = 131072
    hidden_size: int = 4096
    intermediate_size: int = 21504
    num_hidden_layers: int = 52
    hybrid_override_pattern: str = (
        "M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M*-M-M-M-M-M-"
    )
    num_attention_heads: int = 32
    head_dim: int = 128
    num_key_value_heads: int = 8
    mlp_hidden_act: str = "relu2"
    attention_bias: bool = False
    mlp_bias: bool = False
    use_bias: bool = False
    layer_norm_epsilon: float = 1e-5
    residual_in_fp32: bool = False
    rescale_prenorm_residual: bool = True
    # Mamba-2 mixer
    ssm_state_size: int = 128
    mamba_num_heads: int = 128
    mamba_n_groups: int = 8
    mamba_head_dim: int = 64
    mamba_d_conv: int = 4
    mamba_expand: int = 2
    mamba_hidden_act: str = "silu"
    time_step_limit: Tuple[float, float] = (0.0, float("inf"))
    time_step_min: float = 0.001
    time_step_max: float = 0.1
    time_step_floor: float = 1e-4
    use_conv_bias: bool = True
    mamba_proj_bias: bool = False
    chunk_size: int = 256
    # compression
    use_pdrop: bool = False
    pdrop_type: Optional[str] = None
    merge_module: str = "no_merge"  # "no_merge" | "CrossAttention"
    # misc
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False

    def __post_init__(self):
        assert len(self.hybrid_override_pattern) == self.num_hidden_layers
        assert re.match(r"^[*\-M]+$", self.hybrid_override_pattern)

    @property
    def mamba_intermediate_size(self) -> int:
        return self.mamba_num_heads * self.mamba_head_dim

    @property
    def conv_dim(self) -> int:
        return self.mamba_intermediate_size + 2 * self.mamba_n_groups * self.ssm_state_size

    @property
    def layers_block_type(self) -> Tuple[str, ...]:
        return tuple(
            {"M": "mamba", "*": "attention", "-": "mlp"}[c]
            for c in self.hybrid_override_pattern
        )

    @property
    def attention_layer_indices(self) -> Tuple[int, ...]:
        return tuple(
            i for i, c in enumerate(self.hybrid_override_pattern) if c == "*"
        )

    @property
    def mamba_layer_indices(self) -> Tuple[int, ...]:
        return tuple(
            i for i, c in enumerate(self.hybrid_override_pattern) if c == "M"
        )

    @property
    def pdrop_stages(self) -> Tuple[PdropStage, ...]:
        if not self.use_pdrop or self.pdrop_type is None:
            return ()
        return parse_pdrop_type(self.pdrop_type)

def tiny_nano_config(**overrides) -> NanoConfig:
    """A tiny Nano config for tests (same structure, small dims)."""
    base = dict(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=6,
        hybrid_override_pattern="M-M*M-",
        num_attention_heads=4,
        head_dim=16,
        num_key_value_heads=2,
        ssm_state_size=16,
        mamba_num_heads=8,
        mamba_n_groups=2,
        mamba_head_dim=8,
        chunk_size=16,
    )
    base.update(overrides)
    return NanoConfig(**base)


@dataclass(frozen=True)
class Qwen2Config:
    """Qwen2/Qwen2.5 transformer backbone config (reference:
    timeviper/model/llm/llm_repo/qwen2/configuration_qwen2.py)."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    head_dim: int = 128
    hidden_act: str = "silu"
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    attention_bias: bool = True  # Qwen2 uses QKV bias
    tie_word_embeddings: bool = False
    # compression (same machinery grafted in as nano; modeling_qwen2.py:408-480)
    use_pdrop: bool = False
    pdrop_type: Optional[str] = None
    merge_module: str = "no_merge"

    @property
    def layers_block_type(self) -> Tuple[str, ...]:
        return tuple("attention" for _ in range(self.num_hidden_layers))

    @property
    def pdrop_stages(self) -> Tuple[PdropStage, ...]:
        if not self.use_pdrop or self.pdrop_type is None:
            return ()
        return parse_pdrop_type(self.pdrop_type)


def tiny_qwen2_config(**overrides) -> Qwen2Config:
    base = dict(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=2048,
    )
    base.update(overrides)
    return Qwen2Config(**base)


# ---------------------------------------------------------------------------
# Vision backbone configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ViTConfig:
    """Generic ViT config covering SigLIP / DINOv2 variants.

    Features are taken from the *penultimate* transformer block, matching the
    reference's timm monkey-patch (base_vision.py:165-170).
    """

    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-6
    use_class_token: bool = False
    num_register_tokens: int = 0
    qkv_bias: bool = True
    # SigLIP uses gelu_tanh; DINOv2 uses exact gelu
    hidden_act: str = "gelu_tanh"
    # DINOv2 uses LayerScale
    use_layer_scale: bool = False
    layer_scale_init: float = 1e-5

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.use_class_token else 0) + self.num_register_tokens


SIGLIP_SO400M_384 = ViTConfig(
    image_size=384, patch_size=14, hidden_size=1152, intermediate_size=4304,
    num_hidden_layers=27, num_attention_heads=16, use_class_token=False,
    hidden_act="gelu_tanh",
)
SIGLIP_SO400M_224 = dataclasses.replace(SIGLIP_SO400M_384, image_size=224)
SIGLIP_B16_384 = ViTConfig(
    image_size=384, patch_size=16, hidden_size=768, intermediate_size=3072,
    num_hidden_layers=12, num_attention_heads=12, use_class_token=False,
    hidden_act="gelu_tanh",
)
SIGLIP_B16_256 = dataclasses.replace(SIGLIP_B16_384, image_size=256)
SIGLIP_B16_224 = dataclasses.replace(SIGLIP_B16_384, image_size=224)
DINOV2_L_384 = ViTConfig(
    image_size=384, patch_size=14, hidden_size=1024, intermediate_size=4096,
    num_hidden_layers=24, num_attention_heads=16, use_class_token=True,
    num_register_tokens=4, hidden_act="gelu", use_layer_scale=True,
)


def tiny_vit_config(**overrides) -> ViTConfig:
    base = dict(
        image_size=28, patch_size=14, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=2,
    )
    base.update(overrides)
    return ViTConfig(**base)


@dataclass(frozen=True)
class InternVideo2Config:
    """InternVideo2-1B video-native ViT-g (reference:
    timeviper/model/vit/internvideo2/vit_scale_clean.py:464)."""

    image_size: int = 224
    patch_size: int = 14
    tubelet_size: int = 1
    num_frames: int = 4
    hidden_size: int = 1408
    intermediate_size: int = 6144  # mlp_ratio 48/11 * 1408
    num_hidden_layers: int = 40
    num_attention_heads: int = 16
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = False
    # penultimate features: effective depth = depth + x_vis_return_idx + 1
    # (reference vit_scale_clean.py:505)
    x_vis_return_idx: int = -2
    use_checkpoint: bool = False
    # CLIP-aligned attention-pooling head (vit_scale_clean.py:588-597);
    # unused when x_vis_only (the TimeViper VLM path) but carried by full
    # InternVideo2 checkpoints
    clip_embed_dim: int = 768
    attn_pool_num_heads: int = 16
    # checkpoints are pretrained at 8 temporal positions (pos_embed.py:125)
    pretrain_t_size: int = 8

    @property
    def effective_depth(self) -> int:
        return self.num_hidden_layers + self.x_vis_return_idx + 1

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def hidden_act(self) -> str:
        return "gelu"


# ---------------------------------------------------------------------------
# Registries (string ids → configs), mirroring reference registries
# ---------------------------------------------------------------------------

VISION_MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {
    # reference: timeviper/model/vit/registry.py:23-83
    "siglip-vit-b16-224px": {"family": "siglip", "config": SIGLIP_B16_224},
    "siglip-vit-b16-256px": {"family": "siglip", "config": SIGLIP_B16_256},
    "siglip-vit-b16-384px": {"family": "siglip", "config": SIGLIP_B16_384},
    "siglip-vit-so400m": {"family": "siglip", "config": SIGLIP_SO400M_224},
    "siglip-vit-so400m-384px": {"family": "siglip", "config": SIGLIP_SO400M_384},
    "dinov2-vit-l": {"family": "dinov2", "config": DINOV2_L_384},
    "internvideo2-1b-16-224px": {
        "family": "internvideo2",
        "config": InternVideo2Config(),
    },
    "dinosiglip-vit-so-384px": {
        "family": "multi",
        "backbones": ["dinov2-vit-l", "siglip-vit-so400m-384px"],
    },
    # tiny debug tower: CI/integration tests and smoke runs
    "debug-vit-tiny": {
        "family": "siglip",
        "config": ViTConfig(
            image_size=28, patch_size=14, hidden_size=32,
            intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=2,
        ),
    },
}


def get_vision_backbone_config(vision_backbone_id: str) -> Dict[str, Any]:
    """Resolve a vision backbone id, supporting the `"a+b"` dual-encoder
    composition syntax (reference: registry.py:86-99)."""
    if "+" in vision_backbone_id:
        backbones = vision_backbone_id.split("+")
        for b in backbones:
            if b not in VISION_MODEL_REGISTRY:
                raise ValueError(f"Vision backbone `{b}` is not supported!")
        return {"family": "multi", "backbones": backbones,
                "identifier": vision_backbone_id}
    if vision_backbone_id not in VISION_MODEL_REGISTRY:
        raise ValueError(
            f"Vision backbone `{vision_backbone_id}` is not supported!"
        )
    entry = dict(VISION_MODEL_REGISTRY[vision_backbone_id])
    entry["identifier"] = vision_backbone_id
    return entry


LLM_MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {
    # reference: timeviper/model/llm/llm_registry.py:64-97
    "nano-9b-v2": {"family": "nano", "config": NanoConfig()},
    "nano-9b-v2-base": {"family": "nano", "config": NanoConfig()},
    "nemotron-h-8b-base": {"family": "nano", "config": NanoConfig(
        num_hidden_layers=52,
    )},
    "qwen2.5-7b-instruct": {"family": "qwen2", "config": Qwen2Config()},
    "qwen2.5-7b-base": {"family": "qwen2", "config": Qwen2Config()},
    "qwen2.5-3b-instruct": {"family": "qwen2", "config": Qwen2Config(
        hidden_size=2048, intermediate_size=11008, num_hidden_layers=36,
        num_attention_heads=16, num_key_value_heads=2, tie_word_embeddings=True,
    )},
    "qwen2-7b": {"family": "qwen2", "config": Qwen2Config(
        rope_theta=1000000.0, vocab_size=152064,
    )},
    "qwen2-1.5b": {"family": "qwen2", "config": Qwen2Config(
        hidden_size=1536, intermediate_size=8960, num_hidden_layers=28,
        num_attention_heads=12, num_key_value_heads=2, tie_word_embeddings=True,
    )},
    # tiny debug backbone: CI/integration tests and smoke runs
    "debug-nano-tiny": {"family": "nano", "config": None},  # filled below
}
LLM_MODEL_REGISTRY["debug-nano-tiny"]["config"] = tiny_nano_config(
    vocab_size=128)


def get_llm_backbone_config(llm_backbone_id: str) -> Dict[str, Any]:
    if llm_backbone_id not in LLM_MODEL_REGISTRY:
        raise ValueError(f"LLM backbone `{llm_backbone_id}` is not supported!")
    entry = dict(LLM_MODEL_REGISTRY[llm_backbone_id])
    entry["identifier"] = llm_backbone_id
    return entry


# ---------------------------------------------------------------------------
# VLM config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class VLMConfig:
    """Top-level VLM assembly config (reference: generic_vlm.py:60-143).

    `arch_specifier` follows the reference micro-DSL, e.g. ``"tome_mlp-16"``
    (ToMe compression to 16 tokens/frame then MLP) or ``"gelu_mlp"``.
    """

    model_id: str = "timeviper"
    vision_backbone_id: str = "siglip-vit-so400m-384px"
    llm_backbone_id: str = "nano-9b-v2"
    arch_specifier: str = "tome_mlp-16"
    visual_token_order: str = "raw"  # raw | ascending | descending
    image_token: str = "<image>"
    disable_data_packing: bool = False

    @property
    def num_compressed_tokens(self) -> int:
        parts = self.arch_specifier.split("-")
        if parts[-1].isdigit():
            return int(parts[-1])
        return -1

    @property
    def projector_type(self) -> str:
        return self.arch_specifier.split("-")[0]
