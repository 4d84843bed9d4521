#!/usr/bin/env bash
# Cross-encoder prompt ablation sweep — the reference notebook's main loops
# (crossencoder/beir/crossencoder_beir_sgpt.ipynb cells 10/11/17: zero-shot
# prompts A-I, few-shot J/K, Yes/No L/M) as one script. BM25 first-stage
# results come from scripts-side bm25_retriever runs (results_<dataset>.json).
#
#   ./scripts/run_ce_ablations.sh EleutherAI/gpt-neo-1.3B ./datasets scifact
# Extra sgptce flags (e.g. "--randominit --dtype float32" for a smoke run)
# pass through EXTRA_ARGS.
set -euo pipefail

MODEL=${1:-EleutherAI/gpt-neo-1.3B}
DATAPATH=${2:-./datasets}
shift $(( $# > 2 ? 2 : $# )) || true
DATASETS=("${@:-scifact}")

# the notebook ablates on the fast datasets first (cell 10 comment)
ZERO_SHOT=(A B C D E F G H I)
FEW_SHOT=(J K)
YES_NO=(L M)

join() { local IFS=,; echo "$*"; }

for DS in "${DATASETS[@]}"; do
  BM25="./results_${DS//\//_}.json"
  if [[ ! -f "$BM25" ]]; then
    python -m sgpt_tpu.cli.bm25_retriever --dataset "$DS" --datadir "$DATAPATH" \
        --output "$BM25"
  fi
  # comma-list prompt mode: one process per group — the model load and jit
  # compiles amortize across the whole ablation set
  python -m sgpt_tpu.cli.sgptce --dataset "$DS" --datadir "$DATAPATH" \
      --modelpath "$MODEL" --bm25results "$BM25" \
      --prompt "$(join "${ZERO_SHOT[@]}" "${YES_NO[@]}")" ${EXTRA_ARGS:-}
  python -m sgpt_tpu.cli.sgptce --dataset "$DS" --datadir "$DATAPATH" \
      --modelpath "$MODEL" --bm25results "$BM25" \
      --prompt "$(join "${FEW_SHOT[@]}")" --fewshot ${EXTRA_ARGS:-}
done
