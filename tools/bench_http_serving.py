"""End-to-end HTTP serving benchmark: query text -> top-k ids, over the wire.

    python tools/bench_http_serving.py --ndocs 1000000 --clients 1,8,32

Measures the full production path on real hardware: HTTP request ->
micro-batcher coalescing -> jit encode (real 125M forward) -> DenseIndex
top-k -> JSON response, under increasing client concurrency. The corpus is
synthetic normalized embeddings injected directly into the index (encoding
10M docs first would measure the encoder, not the server); queries are real
text through the real model, every request unique (cache/memoization-proof).

The interesting curve is concurrency: single-stream p50 is dominated by the
per-dispatch relay latency, while concurrent clients coalesce in the
micro-batcher so QPS rises much faster than p95.
"""
import argparse
import http.client
import json
import os
import random
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WORDS = ("semantic search embedding retrieval ranking neural transformer "
         "query document passage relevance corpus index token attention").split()


def run_level(addr, n_clients: int, n_queries: int, k: int, seed: int):
    """Each client sends n_queries single-query searches; returns latencies."""
    lat, errs = [], []

    def client(cid: int):
        rng = random.Random(seed * 1000 + cid)
        conn = http.client.HTTPConnection(*addr, timeout=600)
        try:
            for i in range(n_queries):
                q = " ".join(rng.choices(WORDS, k=rng.randrange(4, 12))) \
                    + f" {cid}-{i}"
                body = json.dumps({"queries": [q], "k": k})
                t0 = time.perf_counter()
                conn.request("POST", "/search", body,
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                payload = json.loads(r.read())
                dt = time.perf_counter() - t0
                assert r.status == 200 and len(payload["results"][0]) == k
                lat.append(dt)
        except Exception as e:  # pragma: no cover
            errs.append(e)
        finally:
            conn.close()

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errs:
        raise errs[0]
    return np.asarray(lat), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndocs", type=int, default=1_000_000)
    ap.add_argument("--clients", default="1,8,32")
    ap.add_argument("--queries-per-client", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--quantize-index", choices=["int8"], default=None)
    ap.add_argument("--maxseqlen", type=int, default=64)
    args = ap.parse_args()

    import jax

    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)

    _guard.require_tpu(jax)

    from sgpt_tpu.cli.common import build_model
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.index import DenseIndex
    from sgpt_tpu.serving import SearchService, make_server

    params, cfg, tokenizer = build_model("gpt-neo-125m", random_init=True)
    engine = EmbeddingEngine(params, cfg, tokenizer, method="weightedmean",
                             specb=True, max_seq_len=args.maxseqlen,
                             batch_size=64, normalize_embeddings=True)

    print(f"building index: {args.ndocs} docs "
          f"({args.quantize_index or 'bf16'}) ...", file=sys.stderr)
    index = DenseIndex(engine.out_dim, normalize_embeddings=True,
                       quantize=args.quantize_index)
    rng = np.random.default_rng(0)
    chunk = 250_000
    for s in range(0, args.ndocs, chunk):
        n = min(chunk, args.ndocs - s)
        emb = rng.standard_normal((n, engine.out_dim), dtype=np.float32)
        index.add(emb, ids=[str(s + i) for i in range(n)])
    index.build()

    service = SearchService(engine, index, max_wait_ms=3.0)
    server = make_server(service, port=0)
    addr = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # Warm the jit caches BEFORE opening the HTTP flood: encode compiles per
    # (rows, T) bucket and the search per (Q, k) — a cold 32-client burst
    # would stack every compile behind one dispatcher and time clients out.
    rng_w = random.Random(999)
    max_clients = max(int(c) for c in args.clients.split(","))
    for rows in sorted({1, 2, 4, 8, 16, 32, 64} & set(
            range(1, 2 * max_clients + 1)) | {1, 2, 4}):
        texts = [" ".join(rng_w.choices(WORDS, k=6)) + f" warm{rows}-{i}"
                 for i in range(rows)]
        service.search(texts[:1], k=args.k)
        service.embed(texts, is_query=True)
    run_level(addr, 2, 2, args.k, seed=999)  # HTTP plumbing + coalesced sizes

    out = {"ndocs": len(index), "dim": engine.out_dim,
           "quantize": args.quantize_index, "levels": []}
    for c in (int(x) for x in args.clients.split(",")):
        lat, wall = run_level(addr, c, args.queries_per_client, args.k, seed=c)
        out["levels"].append({
            "clients": c, "requests": int(lat.size),
            "qps": round(lat.size / wall, 1),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
            "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1),
        })
        print(json.dumps(out["levels"][-1]), file=sys.stderr)
    st = service.stats()
    out["embed_dispatches"] = st["embed_dispatches"]
    out["embed_items"] = st["embed_items"]
    print(json.dumps(out))
    server.shutdown()
    service.close()


if __name__ == "__main__":
    main()
