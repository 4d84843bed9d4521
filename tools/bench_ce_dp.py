"""CE rerank dp-scaling measurement on the virtual CPU mesh.

One real TPU chip is available to this repo, so absolute multi-chip numbers
can't be taken here; this harness measures the RELATIVE wall-clock scaling of
CrossEncoderRanker.score_pairs when rows shard over a dp mesh of N virtual CPU
devices (the same mesh the tests and dryrun use). On real hardware the dp
collectives ride ICI and the per-shard work is identical, so relative scaling
is the meaningful, honest statistic. Usage:

    python tools/bench_ce_dp.py [--pairs 256] [--dp 1 2 4 8]
"""
import argparse
import os
import re
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (flags +
                           " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NO _guard.require_tpu here: this bench deliberately runs on the virtual
# CPU mesh (JAX_PLATFORMS=cpu above) — it measures relative dp scaling.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from sgpt_tpu.crossencoder import CrossEncoderRanker  # noqa: E402
from sgpt_tpu.models import tiny, init_params  # noqa: E402
from sgpt_tpu.parallel import make_mesh, shard_params  # noqa: E402
from sgpt_tpu.tokenization import SimpleTokenizer  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=256)
    ap.add_argument("--dp", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    # big enough that per-shard compute dominates dispatch overhead on CPU
    cfg = tiny("neo", num_layers=4, hidden_size=256, num_heads=8,
               vocab_size=1024, max_position_embeddings=256)
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=1024)
    rng = np.random.default_rng(0)
    pairs = [("query about topic %d" % i,
              " ".join(f"w{rng.integers(1000)}" for _ in range(20 + i % 80)))
             for i in range(args.pairs)]

    base = None
    for dp in args.dp:
        if dp == 1:
            ranker = CrossEncoderRanker(params, cfg, tok, batch_size=32,
                                        max_length=128)
        else:
            mesh = make_mesh(dp=dp, tp=1)
            ranker = CrossEncoderRanker(shard_params(params, mesh), cfg, tok,
                                        batch_size=32, max_length=128,
                                        mesh=mesh)
        ranker.predict(pairs[:8])  # compile
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ranker.predict(pairs)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        if base is None:
            base = dt
        print(f"dp={dp}: {args.pairs / dt:8.1f} pairs/s  "
              f"({dt:.3f}s, speedup x{base / dt:.2f})")


if __name__ == "__main__":
    main()
