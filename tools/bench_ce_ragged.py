"""CE reranking throughput on a RAGGED length mix, through the real
CrossEncoderRanker.score_pairs host+device path.

Real rerank workloads are ragged (BEIR docs span tens to thousands of
tokens). Three dispatch strategies on the same pair set:

  * fixed_rows    — the reference's batch_size rows per dispatch
                    (sgptce.py:168): short batches underfill the MXU;
  * token_budget  — rows scale inversely with the length bucket
                    (tokenization.specb.row_bucket);
  * packed        — token_budget + sequence packing (pack_t): pairs shorter
                    than pack_t/2 bin-pack several-per-row with
                    block-diagonal attention (crossencoder._score_packed),
                    removing the intra-row padding the bucket path still
                    pays on short pairs.

Two length mixes: `beir` (lognormal doc lengths clipped to [20, 1400] words
— a typical BEIR corpus) and `short` (5-60 word docs — Quora/Twitter-like,
packing's best case and the regime where the bucket path wastes most).

Model: 125M, max_length 2048, batch_size 16 (a 32768-token budget).

Cache-proof: compile+warm on pass A's texts, time pass B with different
token ids but the identical length multiset (same jit buckets, so no compile
in the timed region; a memoizing relay sees fresh ids).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def make_lengths(n, mix):
    rng = np.random.default_rng(0)
    if mix == "short":
        return rng.integers(5, 60, n)
    return np.clip(rng.lognormal(5.0, 1.0, n), 20, 1400).astype(int)


def make_pairs(rng, lengths):
    """Same length multiset for warm and timed passes (identical jit buckets
    AND identical packing bins), different word draws (anti-memoization)."""
    pairs = []
    for L in lengths:
        doc = " ".join(f"w{rng.integers(0, 5000)}" for _ in range(L))
        query = " ".join(f"q{rng.integers(0, 5000)}" for _ in range(12))
        pairs.append((query, doc))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--pack-t", type=int, default=256, dest="pack_t")
    ap.add_argument("--mix", default="beir,short",
                    help="comma list of length mixes: beir, short")
    args = ap.parse_args()

    import jax.numpy as jnp

    import sgpt_tpu.crossencoder as ce
    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    import jax

    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)

    _guard.require_tpu(jax)
    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default",
                                  fused_attention=jax.default_backend() == "tpu")
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    N = args.n

    orig_row_bucket = ce.row_bucket
    for mix in [m.strip() for m in args.mix.split(",") if m.strip()]:
        for mode in ("fixed_rows", "token_budget", "packed"):
            ce.row_bucket = ((lambda nmax, allow_overshoot=True: 16)
                             if mode == "fixed_rows" else orig_row_bucket)
            try:
                ranker = ce.CrossEncoderRanker(
                    params, cfg, tok, batch_size=16, max_length=2048,
                    pack_t=args.pack_t if mode == "packed" else None)
                lengths = make_lengths(N, mix)
                warm = ranker.predict(
                    make_pairs(np.random.default_rng(0), lengths))
                assert np.isfinite(warm).all()
                timed_pairs = make_pairs(np.random.default_rng(1), lengths)
                t0 = time.perf_counter()
                out = ranker.predict(timed_pairs)
                dt = time.perf_counter() - t0
            finally:
                ce.row_bucket = orig_row_bucket
            assert np.isfinite(out).all()
            print(json.dumps({"metric": "ce_ragged_pairs_per_sec", "mix": mix,
                              "mode": mode, "value": round(N / dt, 1),
                              "unit": "pairs/s"}), flush=True)


if __name__ == "__main__":
    main()
