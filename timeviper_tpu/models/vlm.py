"""TimeViper VLM assembly: vision → projector → fuse → LLM.

TPU re-design of GenericTimeViperVLM / HybridTimeViperVLM
(timeviper/model/generic_vlm.py:60-972, hybrid_vlm.py:28-50). The reference
splices tensors dynamically per batch; here the host builds a static
`FusionPlan` (data/fusion.py) and the jitted forward applies one gather.

Family dispatch mirrors the reference factory (model/__init__.py:102-133):
`nano` → hybrid cache backbone, `qwen2` → transformer backbone; both hide
behind the same functional interface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from timeviper_tpu.config import (
    NanoConfig,
    Qwen2Config,
    ViTConfig,
    VLMConfig,
)
from timeviper_tpu.data.fusion import IGNORE_INDEX, FusionPlan
from timeviper_tpu.models import nano as nano_mod
from timeviper_tpu.models import qwen2 as qwen2_mod
from timeviper_tpu.models import vit as vit_mod
from timeviper_tpu.models.cache import init_nano_cache, init_qwen2_cache
from timeviper_tpu.models.pdrop import (
    PdropSampleSpec,
    PdropSpec,
    init_merge_modules,
    make_pdrop_spec,
)
from timeviper_tpu.models.projector import (
    init_projector_params,
    projector_forward,
)


@dataclass(frozen=True)
class VLMArch:
    """Static bundle of configs for the assembled model.

    Single-tower models set `vision`; multi-encoder models (the reference's
    "dinosiglip" / "a+b" registry syntax, vit/registry.py:74-99 and the
    reconstructed MultiViT, SURVEY.md §2.1 #15) set `vision_backbones` to a
    tuple of (backbone_id, family, config) and `vision` to the primary
    (first) tower for sizing.
    """

    vlm: VLMConfig
    vision: Any  # ViTConfig | InternVideo2Config
    llm: Any  # NanoConfig | Qwen2Config
    llm_family: str  # "nano" | "qwen2"
    vision_family: str = "siglip"
    vision_backbones: Optional[Tuple[Tuple[str, str, Any], ...]] = None

    @property
    def tokens_per_frame(self) -> int:
        n = self.vlm.num_compressed_tokens
        if n > 0:
            n_towers = len(self.vision_backbones) if self.vision_backbones else 1
            return n * n_towers
        return self.vision.num_patches

    @property
    def local_num_frames(self) -> int:
        """Frames jointly compressed per ToMe call (InternVideo2 clips)."""
        return (
            self.vision.num_frames if self.vision_family == "internvideo2"
            else 1
        )


def _init_one_tower(key, family: str, cfg, dtype):
    if family == "internvideo2":
        from timeviper_tpu.models.internvideo2 import init_internvideo2_params

        return init_internvideo2_params(key, cfg, dtype)
    return vit_mod.init_vit_params(key, cfg, dtype)


def _tower_forward(params, family: str, cfg, pixels):
    if family == "internvideo2":
        from timeviper_tpu.models.internvideo2 import encode_frames_iv2

        F = pixels.shape[0]
        clip_feats = encode_frames_iv2(params, cfg, pixels)
        # (F/T, T*g^2, D) -> per-frame (F, g^2, D); the projector re-groups
        # with local_num_frames for clip-joint ToMe merging
        return clip_feats.reshape(F, -1, clip_feats.shape[-1])
    return vit_mod.vit_forward(params, cfg, pixels)


def init_vlm_params(key, arch: VLMArch, dtype=jnp.bfloat16) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    if arch.llm_family == "nano":
        llm_params = nano_mod.init_nano_params(ks[0], arch.llm, dtype)
    else:
        llm_params = qwen2_mod.init_qwen2_params(ks[0], arch.llm, dtype)

    if arch.vision_backbones:
        # MultiViT (reconstructed reference component, SURVEY.md §2.1 #15):
        # one tower + one projector per backbone id
        vks = jax.random.split(ks[1], len(arch.vision_backbones))
        pks = jax.random.split(ks[2], len(arch.vision_backbones))
        vision_params = {
            bid.replace("-", "_").replace("+", "_"): _init_one_tower(
                vk, fam, cfg, dtype)
            for vk, (bid, fam, cfg) in zip(vks, arch.vision_backbones)
        }
        projector = {
            bid.replace("-", "_").replace("+", "_"): init_projector_params(
                pk, cfg.hidden_size, arch.llm.hidden_size,
                arch.vlm.projector_type, dtype)
            for pk, (bid, fam, cfg) in zip(pks, arch.vision_backbones)
        }
    else:
        vision_params = _init_one_tower(
            ks[1], arch.vision_family, arch.vision, dtype)
        projector = init_projector_params(
            ks[2], arch.vision.hidden_size, arch.llm.hidden_size,
            arch.vlm.projector_type, dtype,
        )
    params = {
        "vision_backbone": vision_params,
        "projector": projector,
        "llm_backbone": llm_params,
    }
    merge = init_merge_modules(ks[3], arch.llm, dtype)
    if merge is not None:
        params["merge_modules"] = merge
    return params


def encode_visual(
    params: Dict[str, Any],
    arch: VLMArch,
    pixels: jax.Array,
    clip_size: int = 0,
) -> jax.Array:
    """pixels: (frames, H, W, 3) -> (frames, tokens_per_frame, llm_dim).

    `clip_size` > 0 chunks frames through the tower to bound activations at
    eval (reference generic_vlm.py:274-281 splits into 256-frame clips) —
    chunking happens at the caller (python loop over jit calls) to keep each
    compiled program small.

    Multi-encoder: per-tower features -> per-tower ToMe+MLP -> interleave
    (reference MultiToMe16_mlp_hd64, projector/tome.py:180-231).
    """
    n_comp = arch.vlm.num_compressed_tokens
    if arch.vision_backbones:
        outs = []
        for bid, fam, cfg in arch.vision_backbones:
            k = bid.replace("-", "_").replace("+", "_")
            feats = _tower_forward(params["vision_backbone"][k], fam, cfg,
                                   pixels)
            outs.append(projector_forward(
                params["projector"][k], feats,
                projector_type=arch.vlm.projector_type,
                num_compressed_tokens=n_comp if n_comp > 0 else feats.shape[1],
                token_order=arch.vlm.visual_token_order,
                compress="tome" in arch.vlm.projector_type,
            ))
        if len(outs) == 1:
            return outs[0]
        # interleave per-frame tokens (same counts) or concatenate
        if all(o.shape == outs[0].shape for o in outs):
            stacked = jnp.stack(outs, axis=2)  # (F, n, towers, D)
            return stacked.reshape(outs[0].shape[0], -1, outs[0].shape[-1])
        return jnp.concatenate(outs, axis=1)

    feats = _tower_forward(
        params["vision_backbone"], arch.vision_family, arch.vision, pixels)
    lnf = arch.local_num_frames
    out = projector_forward(
        params["projector"], feats,
        projector_type=arch.vlm.projector_type,
        num_compressed_tokens=n_comp if n_comp > 0 else feats.shape[1],
        local_num_frames=lnf,
        token_order=arch.vlm.visual_token_order,
        compress="tome" in arch.vlm.projector_type,
    )
    return out


def fuse_embeddings(
    params: Dict[str, Any],
    arch: VLMArch,
    input_ids: jax.Array,  # (Lt,)
    visual_embeddings: jax.Array,  # (Nv, D) flattened projected tokens
    plan: FusionPlan,
) -> jax.Array:
    """Apply the host-built fusion plan: one gather (1, fused_len, D)."""
    emb_table = params["llm_backbone"]["embeddings"]
    text = jnp.take(emb_table, input_ids, axis=0)
    src = jnp.concatenate(
        [text, visual_embeddings.astype(text.dtype)], axis=0
    )
    fused = jnp.take(src, jnp.asarray(plan.gather_idx), axis=0)
    return fused[None]


def vlm_forward(
    params: Dict[str, Any],
    arch: VLMArch,
    *,
    input_ids: jax.Array,  # (Lt,) flat row (batch=1 semantics like reference)
    plan: FusionPlan,
    pixels: Optional[jax.Array] = None,  # (frames, H, W, 3)
    visual_embeddings: Optional[jax.Array] = None,  # precomputed (Nv, D)
    labels: Optional[jax.Array] = None,  # (fused_len,) already fused
    use_pdrop: bool = False,
    pdrop_query_positions: Optional[Tuple[Optional[int], ...]] = None,
    pdrop_vision_start: Optional[jax.Array] = None,  # traced scalar
    pdrop_query_pos: Optional[jax.Array] = None,  # traced scalar
    fill_cache: bool = False,
    cache_max_len: int = 0,
    remat: bool = False,
    valid_from: int = 0,
    fused_conv: bool = False,
):
    """Training / prefill forward over one fused row.

    Mirrors GenericTimeViperVLM.forward (generic_vlm.py:221-399): encodes
    pixels unless precomputed visual embeddings are given, fuses via the
    static plan, and runs the LLM with packing seq_idx + pdrop args.
    """
    if visual_embeddings is None and pixels is not None:
        ve = encode_visual(params, arch, pixels)
        visual_embeddings = ve.reshape(-1, ve.shape[-1])
    if visual_embeddings is None:
        visual_embeddings = jnp.zeros(
            (0, arch.llm.hidden_size), params["llm_backbone"]["embeddings"].dtype
        )
    assert visual_embeddings.shape[0] == plan.num_visual, (
        visual_embeddings.shape, plan.num_visual)

    fused = fuse_embeddings(params, arch, input_ids, visual_embeddings, plan)
    seq_idx = (
        jnp.asarray(plan.seq_idx)[None] if plan.seq_idx is not None else None
    )
    labels_arr = labels[None] if labels is not None else None

    pdrop_spec = None
    if use_pdrop and arch.llm.use_pdrop:
        if pdrop_vision_start is not None:
            # TRACED single-sample layout -> bucketed pdrop prefill: one
            # compiled program per (bucket, frame count), not per exact
            # prompt layout (models/pdrop.py:_apply_stage_dynamic)
            pdrop_spec = PdropSpec(
                samples=(PdropSampleSpec(
                    vision_start=pdrop_vision_start,
                    num_vision=plan.num_visual,
                    text_suffix=-1,  # unused on the dynamic path
                    query_pos=pdrop_query_pos,
                ),),
                orig_num_vision=(plan.num_visual,),
                ratios=(1.0,) + tuple(
                    s.ratio for s in arch.llm.pdrop_stages),
            )
        else:
            pdrop_spec = make_pdrop_spec(
                list(plan.sample_layouts), arch.llm.pdrop_stages,
                list(pdrop_query_positions) if pdrop_query_positions else None,
            )

    fwd = nano_mod.nano_forward if arch.llm_family == "nano" else qwen2_mod.qwen2_forward
    extra = {}
    if arch.llm_family == "nano" and fused_conv:
        # inference prefill: conv+SiLU+scan in one Pallas program
        extra["fused_conv"] = True
    out = fwd(
        params["llm_backbone"], arch.llm,
        inputs_embeds=fused,
        seq_idx=seq_idx,
        labels=labels_arr,
        fill_cache=fill_cache,
        cache_max_len=cache_max_len,
        remat=remat,
        pdrop_spec=pdrop_spec,
        pdrop_params=params.get("merge_modules"),
        valid_from=valid_from,
        **extra,
    )
    return out


def vlm_forward_dynamic(
    params: Dict[str, Any],
    arch: VLMArch,
    *,
    input_ids: jax.Array,  # (Lt,) padded text row
    gather_idx: jax.Array,  # (fused_len,) traced per-row fusion plan
    seq_idx: jax.Array,  # (fused_len,) segment ids (pads = own segment)
    pixels: Optional[jax.Array] = None,  # (num_frames, H, W, 3) padded
    visual_embeddings: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    remat: bool = False,
):
    """Forward where the fusion plan is DATA, not compile-time constants.

    Backs heterogeneous batches (data/loader.py collate_hetero): rows with
    different image-token layouts share one compiled program at the bucket
    dims; only shapes are static. Pads sit in a trailing fresh segment —
    SSD seq_idx resets and attention segment-masking keep them inert
    (the reference splices raggedly per row instead, generic_vlm.py:517-564).
    """
    if visual_embeddings is None and pixels is not None:
        ve = encode_visual(params, arch, pixels)
        visual_embeddings = ve.reshape(-1, ve.shape[-1])
    if visual_embeddings is None:
        visual_embeddings = jnp.zeros(
            (0, arch.llm.hidden_size),
            params["llm_backbone"]["embeddings"].dtype)
    emb_table = params["llm_backbone"]["embeddings"]
    text = jnp.take(emb_table, input_ids, axis=0)
    src = jnp.concatenate([text, visual_embeddings.astype(text.dtype)], axis=0)
    fused = jnp.take(src, gather_idx, axis=0)[None]
    labels_arr = labels[None] if labels is not None else None
    fwd = (nano_mod.nano_forward if arch.llm_family == "nano"
           else qwen2_mod.qwen2_forward)
    return fwd(
        params["llm_backbone"], arch.llm,
        inputs_embeds=fused,
        seq_idx=seq_idx[None],
        labels=labels_arr,
        remat=remat,
    )


def vlm_loss(
    params: Dict[str, Any],
    arch: VLMArch,
    batch: Dict[str, Any],
    plan: FusionPlan,
    remat: bool = True,
    use_pdrop: bool = False,
):
    """Shifted cross-entropy over the fused row (modeling_nano.py:2436-2446).

    batch: {"input_ids": (Lt,), "pixels": (F,H,W,3) | None,
            "labels": (fused_len,)}; heterogeneous rows additionally carry
    "gather_idx"/"seq_idx" (traced plans) and dispatch to
    :func:`vlm_forward_dynamic`.
    """
    if "gather_idx" in batch:
        assert not use_pdrop, (
            "pdrop needs static sample layouts; use homogeneous batches")
        out = vlm_forward_dynamic(
            params, arch,
            input_ids=batch["input_ids"],
            gather_idx=batch["gather_idx"],
            seq_idx=batch["seq_idx"],
            pixels=batch.get("pixels"),
            visual_embeddings=batch.get("visual_embeddings"),
            labels=batch["labels"], remat=remat,
        )
    else:
        out = vlm_forward(
            params, arch,
            input_ids=batch["input_ids"], plan=plan,
            pixels=batch.get("pixels"),
            visual_embeddings=batch.get("visual_embeddings"),
            labels=batch["labels"], remat=remat, use_pdrop=use_pdrop,
        )
    logits = out["logits"]
    labels = out["labels"]
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    loss = -(token_ll * valid).sum() / n_valid
    return loss, {"n_tokens": n_valid}


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------


def init_cache(arch: VLMArch, batch_size: int, max_len: int, dtype=jnp.bfloat16):
    if arch.llm_family == "nano":
        return init_nano_cache(arch.llm, batch_size, max_len, dtype)
    return init_qwen2_cache(arch.llm, batch_size, max_len, dtype)


def decode_step(params, arch: VLMArch, token: jax.Array, cache):
    # TransV merge params ride along so pdrop generations re-merge dropped
    # tokens at decode (no-op unless the prefill cached ca_kv)
    merge = params.get("merge_modules")
    if arch.llm_family == "nano":
        return nano_mod.nano_decode_step(
            params["llm_backbone"], arch.llm, token, cache,
            pdrop_params=merge)
    return qwen2_mod.qwen2_decode_step(
        params["llm_backbone"], arch.llm, token, cache, pdrop_params=merge)
