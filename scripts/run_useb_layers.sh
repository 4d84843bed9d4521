#!/usr/bin/env bash
# All-layers USEB sweep — the reference's gpt13_all_layers_weightedmean.bash
# (biencoder/useb/*.bash): evaluate every hidden layer's pooled embeddings.
set -euo pipefail

MODEL=${1:-EleutherAI/gpt-neo-125M}
NUM_LAYERS=${2:-12}
shift $(( $# > 2 ? 2 : $# )) || true

for (( idx=0; idx<=NUM_LAYERS; idx++ )); do
  echo "=== layer ${idx} ==="
  python -m sgpt_tpu.cli.useb_retriever --modelname "${MODEL}" \
    --method weightedmean --layeridx "${idx}" \
    --output "useb_results_layer${idx}.json" "$@" || echo "FAILED layer ${idx}"
done
