"""TSDAE unsupervised pretraining entry.

Mirrors the ST fork's TSDAE recipe (losses/DenoisingAutoEncoderLoss.py with
tie_encoder_decoder=True + DenoisingAutoEncoderDataset deletion noise): feed a
plain sentence file, train the tied encoder-decoder to reconstruct originals
from noisy encodings, keep the encoder as the sentence embedder.
"""
from __future__ import annotations

import argparse
import logging

from .common import build_model, setup_logging

logger = logging.getLogger(__name__)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", default="EleutherAI/gpt-neo-125M")
    p.add_argument("--sentences_path", required=True,
                   help="text file, one sentence per line")
    p.add_argument("--train_batch_size", type=int, default=8)
    p.add_argument("--max_seq_length", type=int, default=75)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--del_ratio", type=float, default=0.6)
    p.add_argument("--pooling", default="weightedmean")
    p.add_argument("--freezenonbias", action="store_true")
    p.add_argument("--model_save_path", default="output/tsdae")
    p.add_argument("--randominit", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main(args=None):
    setup_logging()
    args = args or parse_args()

    from ..data import DenoisingBatcher
    from ..training import TSDAETrainer
    from ..training.checkpoint import save_checkpoint

    params, cfg, tokenizer = build_model(args.model_name,
                                         random_init=args.randominit,
                                         dtype_str="float32")

    with open(args.sentences_path) as f:
        sentences = [ln.strip() for ln in f if ln.strip()]
    if len(sentences) < args.train_batch_size:
        raise SystemExit(f"need at least --train_batch_size="
                         f"{args.train_batch_size} sentences, got "
                         f"{len(sentences)} in {args.sentences_path}")
    logger.info("%d sentences", len(sentences))

    batcher = DenoisingBatcher(sentences, args.train_batch_size,
                               del_ratio=args.del_ratio, seed=args.seed)
    trainer = TSDAETrainer(params, cfg, tokenizer, pooling=args.pooling,
                           max_seq_len=args.max_seq_length, lr=args.lr,
                           freeze_nonbias=args.freezenonbias, seed=args.seed)
    history = trainer.fit(batcher, epochs=args.num_epochs,
                          log_fn=lambda r: logger.info("step %d loss %.4f",
                                                       r["step"], r["loss"]))
    save_checkpoint(args.model_save_path, trainer.tree, step=None)
    logger.info("done; %d steps, final loss %.4f", len(history),
                history[-1]["loss"] if history else float("nan"))


if __name__ == "__main__":
    main()
