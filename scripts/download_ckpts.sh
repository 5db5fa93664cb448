#!/usr/bin/env bash
# Fetch the upstream checkpoints this framework converts from
# (reference analog: scripts/download_vit.sh). Requires huggingface-cli
# (pip install -U "huggingface_hub[cli]") and network access.
set -euo pipefail

CKPT_DIR="${1:-./ckpts}"
mkdir -p "$CKPT_DIR"

echo "== vision towers =="
huggingface-cli download timm/ViT-SO400M-14-SigLIP-384 \
  --local-dir "$CKPT_DIR/siglip-vit-so400m-384px"
huggingface-cli download timm/vit_large_patch14_reg4_dinov2.lvd142m \
  --local-dir "$CKPT_DIR/dinov2-vit-l"
huggingface-cli download OpenGVLab/InternVideo2-Stage2_1B-224p-f4 \
  --local-dir "$CKPT_DIR/internvideo2-1b" || true

echo "== LLM backbones =="
huggingface-cli download nvidia/NVIDIA-Nemotron-Nano-9B-v2 \
  --local-dir "$CKPT_DIR/nano-9b-v2"
huggingface-cli download Qwen/Qwen2.5-7B-Instruct \
  --local-dir "$CKPT_DIR/qwen2.5-7b-instruct" || true

echo "Done. Convert with timeviper_tpu.train.convert (see docs/USAGE.md)."
