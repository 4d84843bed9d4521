"""End-to-end HTTP serving benchmark: query text -> top-k ids, over the wire.

    python tools/bench_http_serving.py --ndocs 1000000 --clients 1,8,64

Measures the full production path on real hardware: HTTP request ->
micro-batcher coalescing -> jit encode (real 125M forward) -> DenseIndex
top-k -> JSON response, under increasing client concurrency. The corpus is
synthetic normalized embeddings injected directly into the index (encoding
10M docs first would measure the encoder, not the server); queries are real
text through the real model, every request unique (cache/memoization-proof).

The interesting curve is concurrency: single-stream p50 is dominated by the
per-dispatch relay latency, while concurrent clients coalesce in the
micro-batcher so QPS rises much faster than p95/p99.

Endpoints (--endpoints search,embeddings,rerank):
  search      POST /search       — encode 1 query + index top-k
  embeddings  POST /v1/embeddings — encode only (OpenAI wire shape)
  rerank      POST /rerank       — two-stage: top-first_k retrieval + SGPT-CE
              log-prob scoring of every (query, doc) pair (--rerank-first-k
              pairs per request; pairs from concurrent clients coalesce).
--index ivf swaps the exact index for the balanced-IVF one (same wire).
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


def run_level(addr, n_clients: int, n_queries: int, seed: int, make_request):
    """Each client sends n_queries requests; returns latencies + wall time.

    make_request(rng, cid, i) -> (path, body_dict, validate_fn)."""
    lat, errs = [], []

    def client(cid: int):
        rng = random.Random(seed * 1000 + cid)
        conn = http.client.HTTPConnection(*addr, timeout=600)
        try:
            for i in range(n_queries):
                path, body, validate = make_request(rng, cid, i)
                payload_bytes = json.dumps(body)
                t0 = time.perf_counter()
                conn.request("POST", path, payload_bytes,
                             {"Content-Type": "application/json"})
                r = conn.getresponse()
                payload = json.loads(r.read())
                dt = time.perf_counter() - t0
                assert r.status == 200, payload
                validate(payload)
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


def _query_text(rng):
    return " ".join(rng.choices(WORDS, k=rng.randrange(4, 12)))


def make_search(k):
    def make(rng, cid, i):
        body = {"queries": [_query_text(rng) + f" {cid}-{i}"], "k": k}

        def validate(p):
            assert len(p["results"][0]) == k
        return "/search", body, validate
    return make


def make_embeddings(dim):
    def make(rng, cid, i):
        body = {"input": _query_text(rng) + f" {cid}-{i}", "is_query": True}

        def validate(p):
            assert len(p["data"][0]["embedding"]) == dim
        return "/v1/embeddings", body, validate
    return make


def make_rerank(k, first_k):
    def make(rng, cid, i):
        body = {"queries": [_query_text(rng) + f" {cid}-{i}"],
                "k": k, "first_k": first_k}

        def validate(p):
            hits = p["results"][0]
            assert len(hits) == k and "ce_score" in hits[0]
        return "/rerank", body, validate
    return make


def measure_endpoint(name, addr, make_request, clients, n_queries):
    rows = []
    for c in clients:
        lat, wall = run_level(addr, c, n_queries, seed=c,
                              make_request=make_request)
        rows.append({
            "clients": c, "requests": int(lat.size),
            "qps": round(lat.size / wall, 1),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
            "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1),
            "p99_ms": round(float(np.percentile(lat, 99)) * 1000, 1),
        })
        print(json.dumps({"endpoint": name, **rows[-1]}), file=sys.stderr)
    return rows


def measure_inprocess(service, name: str, call, n: int):
    """Single-stream latency of the SERVICE API driven directly — no HTTP,
    no relay-side JSON, no socket: the production-dispatch number the HTTP
    tables extrapolate ('~2x40 ms relay RPC + ~30 ms real work',
    docs/PERF.md). Unique query text per call (cache-proof)."""
    lat = []
    for i in range(n):
        t0 = time.perf_counter()
        call(i)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    row = {"mode": "in-process", "requests": n,
           "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1),
           "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1)}
    print(json.dumps({"endpoint": name, **row}), file=sys.stderr)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndocs", type=int, default=1_000_000)
    ap.add_argument("--clients", default="1,8,64")
    ap.add_argument("--queries-per-client", type=int, default=16)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--endpoints", default="search,embeddings",
                    help="comma list of search,embeddings,rerank")
    ap.add_argument("--index", choices=["exact", "ivf"], default="exact")
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--quantize-index", choices=["int8"], default=None)
    ap.add_argument("--rerank-first-k", type=int, default=32,
                    help="(query, doc) CE pairs scored per rerank request")
    ap.add_argument("--rerank-clients", default=None,
                    help="override --clients for the rerank endpoint "
                    "(CE pairs are ~first_k x heavier than a search)")
    ap.add_argument("--maxseqlen", type=int, default=64)
    ap.add_argument("--inprocess", action="store_true",
                    help="also measure single-stream service.search/rerank "
                    "latency driven in-process (no HTTP/relay-side JSON) — "
                    "the production-dispatch row")
    args = ap.parse_args()
    endpoints = args.endpoints.split(",")
    clients = [int(x) for x in args.clients.split(",")]

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

    print(f"building index: {args.index}, {args.ndocs} docs "
          f"({args.quantize_index or 'bf16'}) ...", file=sys.stderr)
    if args.index == "ivf":
        from sgpt_tpu.index_ivf import IVFIndex
        index = IVFIndex(engine.out_dim, n_clusters="auto",
                         nprobe=args.nprobe, normalize_embeddings=True,
                         quantize=args.quantize_index)
    else:
        index = DenseIndex(engine.out_dim, normalize_embeddings=True,
                           quantize=args.quantize_index)
    rng = np.random.default_rng(0)
    chunk = 250_000
    for s in range(0, args.ndocs, chunk):
        n = min(chunk, args.ndocs - s)
        emb = rng.standard_normal((n, engine.out_dim), dtype=np.float32)
        index.add(emb, ids=[str(s + i) for i in range(n)])
    index.build()

    ranker, documents = None, None
    if "rerank" in endpoints:
        # rerank needs retained texts (CE scores (query, doc_text) pairs) and
        # a ranker; share the encoder's weights like `serve --rerank` does
        from sgpt_tpu.ce_prompts import build_ranker
        ranker = build_ranker("G", params, cfg, tokenizer, batch_size=64,
                              max_length=256)
        rng_d = random.Random(7)
        documents = {str(i): " ".join(rng_d.choices(WORDS, k=12))
                     for i in range(args.ndocs)}
        print(f"retained {len(documents)} doc texts for rerank",
              file=sys.stderr)

    service = SearchService(engine, index, max_wait_ms=3.0,
                            documents=documents, ranker=ranker)
    server = make_server(service, port=0)
    addr = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    # Warm the jit caches BEFORE opening the HTTP flood: encode compiles per
    # (rows, T) bucket and the search per (Q_bucket, k) — a cold 64-client
    # burst would stack every compile behind one dispatcher and time clients
    # out. Use the production warmups (what `serve` runs at startup).
    rng_w = random.Random(999)
    max_clients = max(clients)
    print("warming encode + search buckets ...", file=sys.stderr)
    engine.warmup()
    warm_ks = [args.k] + ([args.rerank_first_k] if "rerank" in endpoints
                          else [])
    service.warm_search(max_queries=max_clients, ks=warm_ks)
    run_level(addr, 2, 2, seed=999,
              make_request=make_search(args.k))  # HTTP plumbing + coalescing

    out = {"ndocs": len(index), "dim": engine.out_dim, "index": args.index,
           "quantize": args.quantize_index, "endpoints": {}}
    if "search" in endpoints:
        out["endpoints"]["search"] = measure_endpoint(
            "search", addr, make_search(args.k), clients,
            args.queries_per_client)
    if "embeddings" in endpoints:
        out["endpoints"]["embeddings"] = measure_endpoint(
            "embeddings", addr, make_embeddings(engine.out_dim), clients,
            args.queries_per_client)
    if "rerank" in endpoints:
        r_clients = ([int(x) for x in args.rerank_clients.split(",")]
                     if args.rerank_clients else clients)
        # warm the CE buckets with one coalesced pass before timing
        service.rerank([" ".join(rng_w.choices(WORDS, k=6)) + " warmce"],
                       k=args.k, first_k=args.rerank_first_k)
        out["endpoints"]["rerank"] = measure_endpoint(
            "rerank", addr,
            make_rerank(args.k, args.rerank_first_k), r_clients,
            max(4, args.queries_per_client // 4))
    if args.inprocess:
        rng_i = random.Random(4242)
        nq = args.queries_per_client * 2
        ip = {}
        ip["search"] = measure_inprocess(
            service, "inprocess-search",
            lambda i: service.search(
                [_query_text(rng_i) + f" ip{i}"], k=args.k), nq)
        ip["embed"] = measure_inprocess(
            service, "inprocess-embed",
            lambda i: service.embed(
                [_query_text(rng_i) + f" ipe{i}"], is_query=True), nq)
        if "rerank" in endpoints:
            ip["rerank"] = measure_inprocess(
                service, "inprocess-rerank",
                lambda i: service.rerank(
                    [_query_text(rng_i) + f" ipr{i}"], k=args.k,
                    first_k=args.rerank_first_k), max(8, nq // 4))
        out["inprocess"] = ip
    st = service.stats()
    out["embed_dispatches"] = st["embed_dispatches"]
    out["embed_items"] = st["embed_items"]
    print(json.dumps(out))
    server.shutdown()
    service.close()


if __name__ == "__main__":
    main()
