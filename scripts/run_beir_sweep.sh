#!/usr/bin/env bash
# BEIR sweep over all datasets for one model — the reference's run_sgpt.bash
# (biencoder/beir/run_sgpt.bash:1-18) without SLURM: one process drives the TPU.
set -euo pipefail

MODEL=${1:-Muennighoff/SGPT-125M-weightedmean-msmarco-specb-bitfit}
DATAPATH=${2:-./datasets}
METHOD=${3:-weightedmean}
shift $(( $# > 3 ? 3 : $# )) || true

DATASETS=(
  scifact nfcorpus arguana scidocs fiqa trec-covid webis-touche2020 quora
  dbpedia-entity hotpotqa nq fever climate-fever signal1m trec-news robust04
  bioasq msmarco
  cqadupstack/android cqadupstack/english cqadupstack/gaming cqadupstack/gis
  cqadupstack/mathematica cqadupstack/physics cqadupstack/programmers
  cqadupstack/stats cqadupstack/tex cqadupstack/unix cqadupstack/webmasters
  cqadupstack/wordpress
)

for ds in "${DATASETS[@]}"; do
  echo "=== ${ds} ==="
  python -m sgpt_tpu.cli.beir_retriever \
    --modelname "${MODEL}" --dataset "${ds}" --datapath "${DATAPATH}" \
    --method "${METHOD}" --specb --maxseqlen 300 "$@" || echo "FAILED ${ds}"
done

python -m sgpt_tpu.cli.beir_retriever --computeavg
