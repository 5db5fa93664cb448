"""PyTorch checkpoint → JAX pytree converters.

Maps the reference's state-dict layouts onto our parameter pytrees
(SURVEY.md §7 hard part 5). Handled quirks:

* nano `load_hook` rename `embedding.` → `embeddings.` (modeling_nano.py:1532),
* fused in_proj output layout `[gate | x | B | C | dt]` is preserved verbatim
  (order identical, modeling_nano.py:489-492 with d_mlp == 0),
* torch Linear stores (out, in) — transposed to our (in, out),
* conv1d weight (C, 1, K) → (C, K),
* timm ViT qkv fused weight maps 1:1; SigLIP has no class token, DINOv2 has
  cls + 4 register tokens,
* whole-VLM checkpoints (generic_vlm.py:874-910) split by the
  `vision_backbone.` / `projector.` / `llm_backbone.` prefixes.

Torch is CPU-only here and used purely as a file reader.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np

try:  # torch only needed when actually converting
    import torch
except Exception:  # pragma: no cover
    torch = None


def _t2n(t) -> np.ndarray:
    if torch is not None and isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pt/.safetensors file into numpy arrays."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    assert torch is not None, "torch required to read .bin/.pt checkpoints"
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Some reference checkpoints need full unpickling (the reference
        # forces weights_only=False globally, torch_load_patch.py:1-16).
        # Unpickling executes arbitrary code — gate it behind an explicit
        # opt-in so converting an untrusted file is never silently an RCE.
        import os

        if os.environ.get("TIMEVIPER_UNSAFE_TORCH_LOAD") != "1":
            raise RuntimeError(
                f"{path} is not loadable with weights_only=True; if you "
                "trust this checkpoint, set TIMEVIPER_UNSAFE_TORCH_LOAD=1 "
                "(unpickling executes code from the file)"
            )
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: _t2n(v) for k, v in sd.items()}


def _lin(sd, prefix, dtype):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T).astype(dtype)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"].astype(dtype)
    return out


def convert_nano(
    sd: Mapping[str, np.ndarray], cfg, dtype=np.dtype("float32")
) -> Dict[str, Any]:
    """NemotronHForCausalLM state dict → nano params pytree.

    Torch names: backbone.embeddings.weight, backbone.layers.{i}.norm.weight,
    backbone.layers.{i}.mixer.*, backbone.norm_f.weight, lm_head.weight.
    """
    sd = dict(sd)
    # load_hook rename (modeling_nano.py:1532-1536)
    for k in list(sd):
        if "embedding." in k:
            sd[k.replace("embedding.", "embeddings.")] = sd.pop(k)

    def g(name):
        return sd[name]

    layers = []
    for i, block_type in enumerate(cfg.layers_block_type):
        pre = f"backbone.layers.{i}"
        layer = {"norm": {"weight": g(f"{pre}.norm.weight").astype(np.float32)}}
        mp = f"{pre}.mixer"
        if block_type == "mamba":
            d_inner = cfg.mamba_intermediate_size
            gn = cfg.mamba_n_groups * cfg.ssm_state_size
            H = cfg.mamba_num_heads
            # fused torch in_proj rows are [gate | x | B | C | dt]
            # (modeling_nano.py:489-492, 583-592); split into per-role
            # kernels so TP shards on head/group boundaries
            w_in = g(f"{mp}.in_proj.weight")  # (P, D)
            cuts = np.cumsum([d_inner, d_inner, gn, gn, H])
            assert w_in.shape[0] == cuts[-1], (w_in.shape, cuts)
            gate_w, x_w, B_w, C_w, dt_w = np.split(w_in, cuts[:-1], axis=0)
            conv_w = g(f"{mp}.conv1d.weight").reshape(-1, cfg.mamba_d_conv)
            conv_b = (g(f"{mp}.conv1d.bias")
                      if f"{mp}.conv1d.bias" in sd else None)
            cx, cB, cC = np.split(conv_w, [d_inner, d_inner + gn], axis=0)
            if conv_b is not None:
                bx, bB, bC = np.split(conv_b, [d_inner, d_inner + gn])
            else:
                bx = bB = bC = None

            def k_(w):
                return {"kernel": np.ascontiguousarray(w.T).astype(dtype)}

            layer["mixer"] = {
                "in_proj": {
                    "gate": k_(gate_w), "x": k_(x_w), "B": k_(B_w),
                    "C": k_(C_w), "dt": k_(dt_w),
                },
                "conv1d": {
                    "x": {"weight": cx.astype(np.float32),
                          "bias": None if bx is None else bx.astype(np.float32)},
                    "B": {"weight": cB.astype(np.float32),
                          "bias": None if bB is None else bB.astype(np.float32)},
                    "C": {"weight": cC.astype(np.float32),
                          "bias": None if bC is None else bC.astype(np.float32)},
                },
                "dt_bias": g(f"{mp}.dt_bias").astype(np.float32),
                "A_log": g(f"{mp}.A_log").astype(np.float32),
                "D": g(f"{mp}.D").astype(np.float32),
                "norm": {"weight": g(f"{mp}.norm.weight").astype(np.float32)},
                "out_proj": _lin(sd, f"{mp}.out_proj", dtype),
            }
        elif block_type == "attention":
            layer["mixer"] = {
                k: _lin(sd, f"{mp}.{k}", dtype)
                for k in ("q_proj", "k_proj", "v_proj", "o_proj")
            }
        else:
            layer["mixer"] = {
                "up_proj": _lin(sd, f"{mp}.up_proj", dtype),
                "down_proj": _lin(sd, f"{mp}.down_proj", dtype),
            }
        layers.append(layer)

    params = {
        "embeddings": g("backbone.embeddings.weight").astype(dtype),
        "layers": layers,
        "norm_f": {"weight": g("backbone.norm_f.weight").astype(np.float32)},
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = _lin(sd, "lm_head", dtype)
    return params


def convert_nano_merge_modules(
    sd: Mapping[str, np.ndarray], cfg, dtype=np.dtype("float32"),
    prefix: str = "backbone",
):
    """TransV merge modules: `backbone.merge_modules.{i}.{q,k,v,o}_proj` +
    the shared `backbone.alpha` vector (one entry per non-"drop" stage,
    modeling_nano.py:1482-1515) → our per-stage list with scalar alphas."""
    stages = cfg.pdrop_stages
    if not stages or cfg.merge_module != "CrossAttention":
        return None
    alpha = sd.get(f"{prefix}.alpha")
    mods = []
    alpha_i = 0
    for i, stage in enumerate(stages):
        if "drop" in stage.compress_type:
            mods.append(None)
            continue
        mp = f"{prefix}.merge_modules.{i}"
        mods.append({
            "cross_attn": {
                k: _lin(sd, f"{mp}.{k}", dtype)
                for k in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "alpha": (alpha[alpha_i] if alpha is not None
                      else np.zeros((), np.float32)).astype(np.float32),
        })
        alpha_i += 1
    return mods


def convert_qwen2(
    sd: Mapping[str, np.ndarray], cfg, dtype=np.dtype("float32")
) -> Dict[str, Any]:
    """Qwen2ForCausalLM state dict → qwen2 params pytree."""
    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        layers.append({
            "input_layernorm": {
                "weight": sd[f"{pre}.input_layernorm.weight"].astype(np.float32)},
            "self_attn": {
                k: _lin(sd, f"{pre}.self_attn.{k}", dtype)
                for k in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "post_attention_layernorm": {
                "weight": sd[f"{pre}.post_attention_layernorm.weight"].astype(
                    np.float32)},
            "mlp": {
                k: _lin(sd, f"{pre}.mlp.{k}", dtype)
                for k in ("gate_proj", "up_proj", "down_proj")
            },
        })
    params = {
        "embeddings": sd["model.embed_tokens.weight"].astype(dtype),
        "layers": layers,
        "norm_f": {"weight": sd["model.norm.weight"].astype(np.float32)},
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = _lin(sd, "lm_head", dtype)
    return params


def convert_timm_vit(
    sd: Mapping[str, np.ndarray], cfg, dtype=np.dtype("float32")
) -> Dict[str, Any]:
    """timm ViT (SigLIP / DINOv2) state dict → vit params pytree.

    timm names: patch_embed.proj.weight (D,3,ps,ps), pos_embed, cls_token,
    reg_token, blocks.{i}.norm1/attn.qkv/attn.proj/norm2/mlp.fc1/mlp.fc2.
    """
    sd = {re.sub(r"^module\.", "", k): v for k, v in sd.items()}

    def ln(prefix):
        return {"weight": sd[f"{prefix}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32)}

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"blocks.{i}"
        layer = {
            "norm1": ln(f"{pre}.norm1"),
            "attn": {
                "qkv": _lin(sd, f"{pre}.attn.qkv", dtype),
                "proj": _lin(sd, f"{pre}.attn.proj", dtype),
            },
            "norm2": ln(f"{pre}.norm2"),
            "mlp": {
                "fc1": _lin(sd, f"{pre}.mlp.fc1", dtype),
                "fc2": _lin(sd, f"{pre}.mlp.fc2", dtype),
            },
        }
        if cfg.use_layer_scale:
            layer["ls1"] = {"gamma": sd[f"{pre}.ls1.gamma"].astype(np.float32)}
            layer["ls2"] = {"gamma": sd[f"{pre}.ls2.gamma"].astype(np.float32)}
        layers.append(layer)

    pe_w = sd["patch_embed.proj.weight"]  # (D, 3, ps, ps)
    pos = sd["pos_embed"].astype(np.float32)
    if pos.shape[1] == cfg.num_patches + 1:
        # timm embed-class layout stores a cls row first; our forward uses
        # no_embed_class semantics (patches only) — drop it
        pos = pos[:, 1:]
    assert pos.shape[1] == cfg.num_patches, (pos.shape, cfg.num_patches)
    params = {
        "patch_embed": {
            # -> (ps, ps, 3, D) for NHWC conv
            "kernel": np.ascontiguousarray(
                pe_w.transpose(2, 3, 1, 0)).astype(dtype),
            "bias": sd["patch_embed.proj.bias"].astype(dtype),
        },
        "pos_embed": pos,
        "layers": layers,
    }
    if cfg.use_class_token and "cls_token" in sd:
        params["cls_token"] = sd["cls_token"].astype(np.float32)
    if cfg.num_register_tokens and "reg_token" in sd:
        params["reg_tokens"] = sd["reg_token"].astype(np.float32)
    return params


def convert_internvideo2(
    sd: Mapping[str, np.ndarray], cfg, dtype=np.dtype("float32")
) -> Dict[str, Any]:
    """InternVideo2 PretrainVisionTransformer_clean state dict → pytree.

    Torch names (vit_scale_clean.py:464-602): patch_embed.proj.weight
    (D,3,t,ps,ps) conv3d, cls_token, pos_embed, blocks.{i}.{norm1,attn.qkv,
    attn.q_norm,attn.k_norm,attn.proj,ls1.gamma,norm2,mlp.fc1,mlp.fc2,
    ls2.gamma}.
    """
    sd = {re.sub(r"^(vision_tower\.|model\.)", "", k): v for k, v in sd.items()}

    def _ls(pre, name):
        # real checkpoints: LayerScale stores `weight` (vit_scale_clean.py
        # :170); `gamma` accepted for timm-style dumps
        v = sd.get(f"{pre}.{name}.weight", sd.get(f"{pre}.{name}.gamma"))
        return {"gamma": v.astype(np.float32)}

    layers = []
    for i in range(cfg.effective_depth):
        pre = f"blocks.{i}"
        layers.append({
            "norm1": {"weight": sd[f"{pre}.norm1.weight"].astype(np.float32)},
            "attn": {
                "qkv": _lin(sd, f"{pre}.attn.qkv", dtype),
                "q_norm": {"weight": sd[f"{pre}.attn.q_norm.weight"].astype(
                    np.float32)},
                "k_norm": {"weight": sd[f"{pre}.attn.k_norm.weight"].astype(
                    np.float32)},
                "proj": _lin(sd, f"{pre}.attn.proj", dtype),
            },
            "ls1": _ls(pre, "ls1"),
            "norm2": {"weight": sd[f"{pre}.norm2.weight"].astype(np.float32)},
            "mlp": {
                "fc1": _lin(sd, f"{pre}.mlp.fc1", dtype),
                "fc2": _lin(sd, f"{pre}.mlp.fc2", dtype),
            },
            "ls2": _ls(pre, "ls2"),
        })
    pe = sd["patch_embed.proj.weight"]  # (D, 3, t, ps, ps) conv3d
    D_, _, t, ps, _ = pe.shape
    # flatten to the matmul layout models/internvideo2.py uses:
    # (t, ps, ps, 3) ordering per spatial-temporal unfold -> (t*ps*ps*3, D)
    kernel = np.ascontiguousarray(
        pe.transpose(2, 3, 4, 1, 0).reshape(t * ps * ps * 3, D_))

    # position table: checkpoints are pretrained at `pretrain_t_size`
    # temporal positions / their own spatial grid; interpolate to the
    # configured frames/resolution (reference pos_embed.py:125-203, applied
    # at load in internvideo2/backbone.py)
    pos = sd["pos_embed"].astype(np.float32)
    target_t = cfg.num_frames // cfg.tubelet_size
    target_tokens = target_t * cfg.grid_size**2 + 1
    if pos.shape[1] != target_tokens:
        from timeviper_tpu.models.internvideo2 import interpolate_pos_embed

        orig_t = getattr(cfg, "pretrain_t_size", 8)
        if (pos.shape[1] - 1) % orig_t != 0:
            orig_t = target_t  # spatial-only mismatch
        pos = interpolate_pos_embed(
            pos, orig_t=orig_t, new_t=target_t, new_grid=cfg.grid_size)

    out = {
        "patch_embed": {
            "kernel": kernel.astype(dtype),
            "bias": sd["patch_embed.proj.bias"].astype(dtype),
        },
        "cls_token": sd["cls_token"].astype(np.float32),
        "pos_embed": pos,
        "layers": layers,
    }
    if "clip_projector.cross_attn.q.weight" in sd:
        cp = "clip_projector"

        def _ln(name):
            return {"weight": sd[f"{cp}.{name}.weight"].astype(np.float32),
                    "bias": sd[f"{cp}.{name}.bias"].astype(np.float32)}

        def _qkv(name):
            # CrossAttention stores bias separately as `{q,k,v}_bias`
            # (vit_scale_clean.py:46-57)
            p = {"kernel": np.ascontiguousarray(
                sd[f"{cp}.cross_attn.{name}.weight"].T).astype(dtype)}
            bias = sd.get(f"{cp}.cross_attn.{name}_bias")
            p["bias"] = (bias.astype(dtype) if bias is not None else None)
            return p

        out["attn_pool"] = {
            "norm1_q": _ln("norm1_q"), "norm1_k": _ln("norm1_k"),
            "norm1_v": _ln("norm1_v"),
            "q": _qkv("q"), "k": _qkv("k"), "v": _qkv("v"),
            "proj": _lin(sd, f"{cp}.cross_attn.proj", dtype),
        }
    return out


def convert_projector(
    sd: Mapping[str, np.ndarray], dtype=np.dtype("float32"), prefix: str = "projector"
) -> Dict[str, Any]:
    """ToMe/MLP projector: torch Sequential indices 0/2(/4) → fc1/fc2(/fc0)."""
    keys = [k for k in sd if k.startswith(f"{prefix}.projector.")]
    idx = sorted({int(k.split(".")[2]) for k in keys})
    names = (["fc1", "fc2"] if len(idx) == 2 else ["fc0", "fc1", "fc2"])
    return {
        name: _lin(sd, f"{prefix}.projector.{i}", dtype)
        for name, i in zip(names, idx)
    }


def _convert_tower(sd_sub, family: str, cfg, dtype):
    if family == "internvideo2":
        return convert_internvideo2(sd_sub, cfg, dtype)
    return convert_timm_vit(sd_sub, cfg, dtype)


def convert_vlm_checkpoint(
    sd: Mapping[str, np.ndarray], arch, dtype=np.dtype("float32")
) -> Dict[str, Any]:
    """Whole-VLM torch checkpoint (generic_vlm.py:874-910) → vlm params.

    Multi-encoder checkpoints keep per-tower weights under
    `vision_backbone.backbones.<sanitized_id>.` (generic_vlm.py:180-186)
    and per-tower projectors under `projector.projectors.<id>.`.
    """

    def sub(prefix):
        plen = len(prefix)
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}

    llm_sd = sub("llm_backbone.llm.")
    conv_llm = convert_nano if arch.llm_family == "nano" else convert_qwen2

    if getattr(arch, "vision_backbones", None):
        vision, projector = {}, {}
        for bid, fam, cfg in arch.vision_backbones:
            key = bid.replace("-", "_").replace("+", "_")
            tower_sd = sub(f"vision_backbone.backbones.{key}.featurizer.")
            if not tower_sd:
                tower_sd = sub(f"vision_backbone.backbones.{key}.")
            vision[key] = _convert_tower(tower_sd, fam, cfg, dtype)
            proj_sd = {
                k: v for k, v in sd.items()
                if k.startswith(f"projector.projectors.{key}.")
            }
            if proj_sd:
                projector[key] = convert_projector(
                    {k.replace(f".projectors.{key}", ""): v
                     for k, v in proj_sd.items()}, dtype, prefix="projector")
        return {
            "vision_backbone": vision,
            "projector": projector,
            "llm_backbone": conv_llm(llm_sd, arch.llm, dtype),
        }

    params = {
        "vision_backbone": _convert_tower(
            sub("vision_backbone.featurizer."),
            getattr(arch, "vision_family", "siglip"), arch.vision, dtype),
        "projector": convert_projector(sd, dtype, prefix="projector"),
        "llm_backbone": conv_llm(llm_sd, arch.llm, dtype),
    }
    return params
