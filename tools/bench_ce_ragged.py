"""CE reranking throughput on a RAGGED length mix, through the real
CrossEncoderRanker.score_pairs host+device path.

Real rerank workloads are ragged (BEIR docs span tens to thousands of
tokens). A fixed row count per dispatch (the reference's batch_size,
sgptce.py:168) underfills the MXU on short batches; token-budget batching
(crossencoder._row_bucket) scales rows inversely with the length bucket.
This bench measures both on the same pair set: 125M, lognormal doc lengths
clipped to [20, 1400] words, 12-word queries, max_length 2048, batch_size 16
(i.e. a 32768-token budget).

Cache-proof: compile+warm on pass A's texts, time pass B with different
token ids but the identical length multiset (same jit buckets, so no compile
in the timed region; a memoizing relay sees fresh ids).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def make_pairs(rng, n):
    pairs = []
    lengths = np.clip(rng.lognormal(5.0, 1.0, n), 20, 1400).astype(int)
    for i, L in enumerate(lengths):
        doc = " ".join(f"w{rng.integers(0, 5000)}" for _ in range(L))
        query = " ".join(f"q{rng.integers(0, 5000)}" for _ in range(12))
        pairs.append((query, doc))
    return pairs


def main():
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
    N = 512

    orig_row_bucket = ce._row_bucket
    for mode in ("fixed_rows", "token_budget"):
        ce._row_bucket = (lambda nmax: 16) if mode == "fixed_rows" else orig_row_bucket
        ranker = ce.CrossEncoderRanker(params, cfg, tok, batch_size=16,
                                       max_length=2048)
        rng = np.random.default_rng(0)
        warm = ranker.predict(make_pairs(rng, N))   # compile all buckets
        assert np.isfinite(warm).all()
        timed_pairs = make_pairs(np.random.default_rng(1), N)
        t0 = time.perf_counter()
        out = ranker.predict(timed_pairs)
        dt = time.perf_counter() - t0
        assert np.isfinite(out).all()
        print(json.dumps({"metric": "ce_ragged_pairs_per_sec", "mode": mode,
                          "value": round(N / dt, 1), "unit": "pairs/s"}),
              flush=True)
    ce._row_bucket = orig_row_bucket


if __name__ == "__main__":
    main()
