"""BEIR bi-encoder evaluation driver.

Flag surface mirrors the reference CLI (biencoder/beir/beir_dense_retriever.py:31-98):
    python -m sgpt_tpu.cli.beir_retriever --modelname <hf-name> --dataset scifact \
        --method weightedmean --specb --maxseqlen 300 [--layeridx -1] [--usest]

plus --computeavg / --selectbest aggregation modes (:506-592) and --randominit
for zero-egress smoke runs.
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
    p.add_argument("--modelname", default="EleutherAI/gpt-neo-125M")
    p.add_argument("--dataset", default="scifact")
    p.add_argument("--datapath", default="./datasets")
    p.add_argument("--download", action="store_true",
                   help="fetch the BEIR dataset zip if --datapath/<dataset> "
                        "is missing (egress-gated: off by default; "
                        "baselines.fetch_beir_dataset)")
    p.add_argument("--method", default="weightedmean",
                   choices=["mean", "meanmean", "weightedmean", "lasttoken",
                            "lasttokenmean"])
    p.add_argument("--layeridx", type=int, default=-1)
    p.add_argument("--specb", action="store_true")
    p.add_argument("--maxseqlen", type=int, default=None)
    p.add_argument("--batchsize", type=int, default=32)
    p.add_argument("--saveemb", action="store_true")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--computeavg", action="store_true")
    p.add_argument("--selectbest", action="store_true")
    p.add_argument("--randominit", action="store_true",
                   help="random weights (smoke/debug; reference --reinit)")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="int8-quantize decoder projections for encode "
                        "(~1.4x at >=2.7B dims; see docs/PERF.md)")
    p.add_argument("--topk", type=int, default=1000)
    p.add_argument("--expect-ndcg", type=float, default=None, dest="expect_ndcg",
                   help="assert nDCG@10 >= this value minus --ndcg-tol (exit 1 "
                        "otherwise) — the staged score-parity check, e.g. 0.569 "
                        "for SGPT-125M-weightedmean-msmarco-specb-bitfit on "
                        "SciFact (reference README.md:400)")
    p.add_argument("--ndcg-tol", type=float, default=0.005, dest="ndcg_tol")
    add_mesh_args(p)
    return p.parse_args()


def main(args=None):
    setup_logging()
    args = args or parse_args()

    from ..evaluation.aggregate import ResultsStore
    store = ResultsStore()
    if args.computeavg:
        store.compute_model_avg()
        store.save()
        return
    if args.selectbest:
        best = store.select_best_ckpt()
        with open("./beir_embeddings_best_ndcgs.json", "w") as f:
            json.dump({"ndcgs": best}, f)
        return

    from ..encoder import EmbeddingEngine
    from ..evaluation import EvaluateRetrieval, load_beir_dataset
    from ..retrieval import DenseRetriever

    data_path = os.path.join(args.datapath, args.dataset)
    if getattr(args, "download", False) and not os.path.isdir(data_path):
        # egress-gated: nothing fetches unless this flag is passed explicitly
        from ..baselines import fetch_beir_dataset
        fetch_beir_dataset(args.dataset, out_dir=args.datapath)
    split = "dev" if args.dataset == "msmarco" else "test"
    corpus, queries, qrels = load_beir_dataset(data_path, split)

    try:
        params, cfg, tokenizer = build_model(args.modelname,
                                             random_init=args.randominit,
                                             dtype_str=args.dtype)
    except Exception as e:
        if getattr(args, "expect_ndcg", None) is not None:
            # Distinct exit code so the parity harness can tell "weights or
            # tokenizer unavailable" (rerun when they land) from "score
            # mismatch" (a real failure) - documented in PARITY.md.
            logger.error("score-parity UNAVAILABLE: cannot build %s (%r)",
                         args.modelname, e)
            raise SystemExit(3) from e
        raise
    mesh = build_mesh(args)
    if args.quantize:
        from ..ops.quant import quantize_decoder_params
        # pre-quantize with free_source: the CLI owns this tree, and in-place
        # freeing lets 6B-scale bf16 trees quantize within one chip's HBM
        # (the engine's own quantize= flag copies, preserving caller trees).
        # Quantize BEFORE sharding — the TP partition specs cover the int8
        # {q, s} leaves (same composition as cli/sgptce.py)
        params = quantize_decoder_params(params, free_source=True)
    params = maybe_shard(params, mesh)
    engine = EmbeddingEngine(
        params, cfg, tokenizer, method=args.method, specb=args.specb,
        layeridx=args.layeridx, max_seq_len=args.maxseqlen,
        batch_size=args.batchsize, mesh=mesh,
        cache_dir=(f"embeddings/{args.modelname.split('/')[-1]}/"
                   f"{args.method}/{args.dataset}" if args.saveemb else None))

    model_name = args.modelname.replace("/", "_")
    dataset = args.dataset.replace("/", "_")
    out_path = f"./results_{model_name}_{args.method}_{dataset}.json"
    expect = getattr(args, "expect_ndcg", None)
    if os.path.exists(out_path) and not args.overwrite and expect is None:
        logger.info("Found %s - Skipping ...", out_path)
        return

    topk = args.topk
    if expect is not None:
        topk = max(topk, 10)  # the assertion reads nDCG@10
    retriever = EvaluateRetrieval(DenseRetriever(engine),
                                  k_values=[k for k in (1, 3, 5, 10, 100, 1000)
                                            if k <= topk])
    if os.path.exists(out_path) and not args.overwrite:
        # --expect-ndcg rerun over existing results: a prior run may have
        # failed the assertion AFTER writing the file — re-evaluate + assert
        # without re-encoding
        logger.info("Found %s - evaluating existing results", out_path)
        with open(out_path) as f:
            results = json.load(f)
    else:
        results = retriever.retrieve(corpus, queries)
        with open(out_path, "w") as f:
            json.dump(results, f)

    ndcg, _map, recall, precision = retriever.evaluate(qrels, results,
                                                       retriever.k_values)
    logger.info("nDCG: %s", ndcg)
    store.add(model_name, dataset, ndcg, _map, recall, precision)
    store.save()

    if getattr(args, "expect_ndcg", None) is not None:
        got = ndcg.get("NDCG@10")
        if got is None or got < args.expect_ndcg - args.ndcg_tol:
            raise SystemExit(
                f"score-parity FAILED: nDCG@10={got} < expected "
                f"{args.expect_ndcg} (tol {args.ndcg_tol})")
        logger.info("score-parity OK: nDCG@10=%.4f >= %.4f - %.3f",
                    got, args.expect_ndcg, args.ndcg_tol)


if __name__ == "__main__":
    main()
