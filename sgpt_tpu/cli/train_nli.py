"""NLI contrastive training entry (symmetric search).

Mirrors examples/training/nli/training_nli_v2.py's surface: AllNLI triplets,
NoDuplicates batching, MNRL loss, BitFit (--freezenonbias), GradCache
(--gradcache --chunksize), learnt-mean pooling (--learntmean), STS-B dev eval.
"""
from __future__ import annotations

import argparse
import logging

from .common import add_mesh_args, build_mesh, build_model, setup_logging

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="EleutherAI/gpt-neo-125M")
    p.add_argument("--nli_path", required=True, help="AllNLI.tsv[.gz]")
    p.add_argument("--stsb_path", default=None, help="stsbenchmark dev tsv")
    p.add_argument("--train_batch_size", type=int, default=64)
    p.add_argument("--max_seq_length", type=int, default=75)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--scheduler", default="warmuplinear",
                   choices=["constantlr", "warmupconstant", "warmuplinear",
                            "warmupcosine", "warmupcosinewithhardrestarts"])
    p.add_argument("--pooling", default="weightedmean")
    p.add_argument("--learntmean", action="store_true",
                   help="trainable per-position pooling weights (ref :100-101)")
    p.add_argument("--addxlinear", type=int, default=0,
                   help="number of trainable linear heads (ref :46,:105-117)")
    p.add_argument("--linearthenpool", action="store_true",
                   help="apply linear heads before pooling (ref :48)")
    p.add_argument("--useact", action="store_true",
                   help="GELU activation on linear heads (ref :49)")
    p.add_argument("--outfeats", type=int, default=0,
                   help="output dim of the (single) linear head (ref :47)")
    p.add_argument("--freezenonbias", action="store_true")
    p.add_argument("--unfreezewte", action="store_true")
    p.add_argument("--gradcache", action="store_true")
    p.add_argument("--chunksize", type=int, default=8)
    p.add_argument("--model_save_path", default="output/nli")
    p.add_argument("--randominit", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    add_mesh_args(p)  # --dp/--tp: multi-device fit (replaces accelerate launch)
    p.set_defaults(dp=1)  # multi-device training is opt-in (--dp -1 = all)
    return p.parse_args()


def main(args=None):
    setup_logging()
    args = args or parse_args()

    from ..data import NoDuplicatesBatcher, build_nli_triplets, load_nli_tsv
    from ..encoder import EmbeddingEngine
    from ..evaluation.sts import EmbeddingSimilarityEvaluator
    from ..training import ContrastiveTrainer, TrainConfig

    params, cfg, tokenizer = build_model(args.model_name,
                                         random_init=args.randominit,
                                         dtype_str="float32")

    triplets = build_nli_triplets(load_nli_tsv(args.nli_path), seed=args.seed)
    logger.info("Built %d NLI triplets", len(triplets))
    batcher = NoDuplicatesBatcher(triplets, args.train_batch_size, seed=args.seed)

    dense_heads = None
    if args.addxlinear:
        if args.outfeats and args.addxlinear != 1:
            raise ValueError("--outfeats needs exactly one linear layer (ref :96)")
        dim = cfg.hidden_size
        out_dim = args.outfeats or dim
        dense_heads = [
            {"in_features": dim, "out_features": out_dim,
             "bias": not args.freezenonbias,  # ref :107: no extra bias w/ BitFit
             "activation": "gelu" if args.useact else "identity",
             "location": "pre_pool" if args.linearthenpool else "post_pool"}
            for _ in range(args.addxlinear)]

    tc = TrainConfig(
        lr=args.lr, epochs=args.num_epochs, batch_size=args.train_batch_size,
        max_seq_len=args.max_seq_length, scheduler=args.scheduler,
        pooling="learned_weightedmean" if args.learntmean else args.pooling,
        freeze_nonbias=args.freezenonbias, train_wte=args.unfreezewte,
        use_gradcache=args.gradcache, chunk_size=args.chunksize,
        output_dir=args.model_save_path, seed=args.seed,
        dense_heads=dense_heads,
        eval_steps=max(1, len(batcher) // 10),  # eval every 10% (ref :188-202)
    )
    trainer = ContrastiveTrainer(params, cfg, tokenizer, tc,
                                 mesh=build_mesh(args))

    evaluator = None
    if args.stsb_path:
        import csv, gzip
        s1, s2, gold = [], [], []
        opener = gzip.open if args.stsb_path.endswith(".gz") else open
        with opener(args.stsb_path, "rt") as f:
            for row in csv.DictReader(f, delimiter="\t", quoting=csv.QUOTE_NONE):
                if row.get("split", "dev") != "dev":
                    continue
                s1.append(row["sentence1"]); s2.append(row["sentence2"])
                gold.append(float(row["score"]))
        sts = EmbeddingSimilarityEvaluator(s1, s2, gold, name="sts-dev")

        def evaluator(params):
            # trainer.export_model() packages aux (learnt weights, dense heads)
            model = trainer.export_model()
            model.params = params
            return sts(model.encode)

    def batches():
        for batch in batcher:
            yield [ex.texts for ex in batch]

    out = trainer.fit(batches, steps_per_epoch=len(batcher), evaluator=evaluator)
    trainer.save_model(args.model_save_path)
    logger.info("done; best score %.4f", out["best_score"])


if __name__ == "__main__":
    main()
