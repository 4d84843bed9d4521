"""USEB bi-encoder evaluation driver.

Mirrors biencoder/useb/useb_dense_retriever.py's surface: layer-index sweeps
(--layeridx), pooling method selection, the four USEB tasks.
"""
from __future__ import annotations

import argparse
import json
import logging

from .common import build_model, setup_logging

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--modelname", default="EleutherAI/gpt-neo-125M")
    p.add_argument("--method", default="weightedmean")
    p.add_argument("--layeridx", type=int, default=-1)
    p.add_argument("--batchsize", type=int, default=32)
    p.add_argument("--maxseqlen", type=int, default=None)
    p.add_argument("--specb", action="store_true")
    p.add_argument("--datapath", default="./data-eval")
    p.add_argument("--download", action="store_true",
                   help="fetch the USEB eval archive if --datapath is "
                        "missing (egress-gated: off by default; "
                        "baselines.fetch_useb_data extracts data/eval and "
                        "--datapath should point there, e.g. ./data/eval)")
    p.add_argument("--evaltype", default="test", choices=["valid", "test"])
    p.add_argument("--tasks", nargs="+",
                   default=["askubuntu", "cqadupstack", "twitterpara", "scidocs"])
    p.add_argument("--randominit", action="store_true")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="int8-quantize decoder projections for encode "
                        "(~1.4x at >=2.7B dims; see docs/PERF.md)")
    p.add_argument("--output", default="./useb_results.json")
    return p.parse_args()


def main(args=None):
    setup_logging()
    args = args or parse_args()

    from ..encoder import EmbeddingEngine
    from ..evaluation.useb import run

    params, cfg, tokenizer = build_model(args.modelname,
                                         random_init=args.randominit,
                                         dtype_str=args.dtype)
    if args.quantize:
        from ..ops.quant import quantize_decoder_params
        # pre-quantize with free_source (CLI owns the tree — see beir_retriever)
        params = quantize_decoder_params(params, free_source=True)
    engine = EmbeddingEngine(params, cfg, tokenizer, method=args.method,
                             specb=args.specb, layeridx=args.layeridx,
                             max_seq_len=args.maxseqlen,
                             batch_size=args.batchsize)

    import os
    if getattr(args, "download", False) and not os.path.isdir(args.datapath):
        from ..baselines import fetch_useb_data
        fetched = fetch_useb_data("eval")
        args.datapath = fetched[0]

    semb_fns = {task: engine.encode for task in args.tasks}
    results, mains = run(semb_fns, eval_type=args.evaltype,
                         data_eval_path=args.datapath)
    logger.info("USEB main scores: %s", mains)
    with open(args.output, "w") as f:
        json.dump({"detailed": results, "main": mains,
                   "model": args.modelname, "method": args.method,
                   "layeridx": args.layeridx}, f, indent=2)


if __name__ == "__main__":
    main()
