"""Cross-encoder reranking driver.

Mirrors crossencoder/beir/sgptce.py's surface: load BM25 first-stage results,
rerank top-100 with prompt-conditioned log-prob scoring, evaluate both.
    python -m sgpt_tpu.cli.sgptce --dataset scifact --modelpath EleutherAI/gpt-j-6B \
        --bm25results bm25_results/scifact.json
"""
from __future__ import annotations

import argparse
import json
import logging
import os

from .common import add_mesh_args, build_mesh, build_model, maybe_shard, setup_logging

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="scifact")
    p.add_argument("--modelpath", default="EleutherAI/gpt-neo-125M")
    p.add_argument("--datadir", default="./datasets")
    p.add_argument("--bm25results", required=False,
                   help="json of first-stage results {qid: {docid: score}}")
    p.add_argument("--batchsize", type=int, default=16)
    p.add_argument("--topk", type=int, default=100)
    p.add_argument("--prompt", default="G",
                   help="prompt ablation id: A-I/quoraA-D (zero-shot), "
                        "J/K/quoraE (few-shot, needs --fewshot), L/M (Yes/No "
                        "classifier). The paper's main prompt is G "
                        "(crossencoder_beir_sgpt.ipynb cells 10-17). A comma "
                        "list (e.g. 'A,B,G,L') runs the whole ablation set in "
                        "one process, amortizing model load + compiles")
    p.add_argument("--fewshot", action="store_true",
                   help="prepend the shortest relevant (doc, query) pair from "
                        "qrels as a one-shot example (notebook get_match_len)")
    p.add_argument("--min_corp_query_len", type=int, default=0,
                   help="few-shot selection: skip pairs shorter than this "
                        "many tokens (the notebook's Quora guard)")
    p.add_argument("--maxseqlen", type=int, default=None)
    p.add_argument("--randominit", action="store_true")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="int8-quantize decoder projections: ~1.4x rerank at "
                        "GPT-J/BLOOM dims and half the weight HBM (6B fits "
                        "one v5e chip without --tp); see docs/PERF.md")
    p.add_argument("--packt", type=int, default=None,
                   help="sequence packing: (doc, query) pairs shorter than "
                        "packt/2 tokens bin-pack several-per-row with "
                        "block-diagonal attention (scores unchanged; "
                        "tools/bench_ce_ragged.py --pack-t for the A/B). "
                        "256 is a good default for short-doc BEIR sets")
    p.add_argument("--output", default=None,
                   help="per-dataset result json; with a comma --prompt list "
                        "the prompt id is inserted before the extension")
    p.add_argument("--scores-out", default="./sgptce_ndcgs.json",
                   dest="scores_out",
                   help="cross-dataset accumulation file ('' disables)")
    add_mesh_args(p)
    return p.parse_args()


def main(args=None):
    setup_logging()
    args = args or parse_args()

    from ..ce_prompts import build_ranker, select_fewshot
    from ..crossencoder import rerank
    from ..evaluation import EvaluateRetrieval, load_beir_dataset

    data_path = os.path.join(args.datadir, args.dataset)
    split = "dev" if args.dataset == "msmarco" else "test"
    corpus, queries, qrels = load_beir_dataset(data_path, split)

    if args.bm25results:
        with open(args.bm25results) as f:
            first_stage = json.load(f)
    else:
        raise SystemExit("--bm25results required (first-stage candidates json)")

    params, cfg, tokenizer = build_model(args.modelpath,
                                         random_init=args.randominit,
                                         dtype_str=args.dtype)
    # TP sharding of the big CE models (GPT-J/BLOOM) — the pjit replacement for
    # the reference's device_map="auto" layer offloading (sgptce.py:54-60)
    # --quantize composes with --tp: quantize first, then shard (the
    # partition specs cover int8 {q,s} leaves — scales follow column shards,
    # stay replicated for row-parallel kernels). int8 alone usually removes
    # the need for TP though: half the weight HBM fits 6B on one v5e chip.
    if args.quantize:
        from ..ops.quant import quantize_decoder_params
        # free_source: this CLI owns the freshly-loaded tree, and in-place
        # freeing is what lets a 12.2 GB bf16 GPT-J quantize on a 16 GB chip
        params = quantize_decoder_params(params, free_source=True)
    mesh = build_mesh(args)
    params = maybe_shard(params, mesh)
    fewshots = None
    if args.fewshot:
        fewshots = select_fewshot(corpus, queries, qrels, tokenizer,
                                  min_corp_query_len=args.min_corp_query_len)
        logger.info("few-shot example: doc=%r query=%r",
                    fewshots[0][:80], fewshots[1][:80])

    k_values = (1, 3, 5, 10, 100)
    ndcg_bm25, *_ = EvaluateRetrieval.evaluate(qrels, first_stage, k_values)
    logger.info("BM25 nDCG: %s", ndcg_bm25)

    # --prompt accepts a comma list (e.g. "A,B,G,L"): the model load and jit
    # compiles amortize across the whole ablation set in ONE process (the
    # notebook pays them once per loop iteration)
    from ..ce_prompts import ALL_PROMPT_IDS, FEW_SHOT
    from ..evaluation.aggregate import ResultsStore
    prompt_ids = [p.strip() for p in args.prompt.split(",") if p.strip()]
    # validate the WHOLE list up front — a long ablation run must not die
    # halfway through on a typo'd or misconfigured id
    for pid in prompt_ids:
        if pid not in ALL_PROMPT_IDS:
            raise SystemExit(f"unknown prompt id {pid!r}; choose from "
                             f"{ALL_PROMPT_IDS}")
        if pid in FEW_SHOT and not args.fewshot:
            raise SystemExit(f"prompt {pid!r} is few-shot — pass --fewshot")
    for prompt_id in prompt_ids:
        shots = fewshots if (args.fewshot or prompt_id in FEW_SHOT) else None
        ranker = build_ranker(prompt_id, params, cfg, tokenizer,
                              fewshots=shots, batch_size=args.batchsize,
                              max_length=args.maxseqlen, mesh=mesh,
                              pack_t=args.packt)
        reranked = rerank(ranker, corpus, queries, first_stage, top_k=args.topk)
        ndcg_ce, _map, recall, precision = EvaluateRetrieval.evaluate(
            qrels, reranked, k_values)
        logger.info("SGPT-CE[%s] nDCG: %s", prompt_id, ndcg_ce)

        # cross-dataset accumulation with CQADupStack forum averaging — the
        # reference's beir_{model}_prompt{id}_ndcgs.json loop (sgptce.py:407-475)
        if getattr(args, "scores_out", ""):
            store = ResultsStore(path=args.scores_out)
            store.add(f"{args.modelpath.replace('/', '_')}_prompt{prompt_id}",
                      args.dataset.replace("/", "_"), ndcg_ce, _map, recall,
                      precision)
            store.save()

        ds = args.dataset.replace("/", "_")  # cqadupstack/android etc.
        if args.output and len(prompt_ids) == 1:
            out = args.output
        elif args.output:  # comma list: keep the user's path, tag the prompt
            root, ext = os.path.splitext(args.output)
            out = f"{root}_prompt{prompt_id}{ext or '.json'}"
        else:
            out = f"./sgptce_{ds}_prompt{prompt_id}.json"
        with open(out, "w") as f:
            json.dump({"dataset": args.dataset, "model": args.modelpath,
                       "prompt": prompt_id, "fewshot": shots is not None,
                       "bm25_ndcg": ndcg_bm25, "ce_ndcg": ndcg_ce,
                       "ce_map": _map, "ce_recall": recall,
                       "ce_precision": precision}, f, indent=2)


if __name__ == "__main__":
    main()
