"""Serve embeddings + semantic search over HTTP from one TPU process.

    python -m sgpt_tpu.cli.serve --modelname gpt-neo-125m --randominit \
        --port 8080 --corpus corpus.jsonl --quantize-index int8

No reference counterpart (the reference only *calls* such an API —
SURVEY.md L-last row); this is the deployment entry of the framework:
the process owns the chip(s), HTTP threads feed a micro-batching
dispatcher (serving.py), and the index answers from HBM (int8 corpus puts
10M x 768 docs on one 16 GB chip — docs/PERF.md).

corpus.jsonl rows: {"_id": ..., "title": ..., "text": ...} (BEIR shape) or
{"id": ..., "text": ...}; omit --corpus to start empty and POST /documents.
"""
from __future__ import annotations

import argparse
import json
import logging

from .common import add_mesh_args, build_mesh, build_model, maybe_shard, setup_logging

logger = logging.getLogger(__name__)


def load_jsonl_corpus(path: str):
    """(ids, texts) from a BEIR-shaped jsonl file (title + text joined like
    the BEIR drivers join them, beir_dense_retriever.py:332-336)."""
    ids, texts = [], []
    from ..data.jsonl_native import extract_fields
    rows = extract_fields(path, ("_id", "id", "title", "text"))
    if rows is not None:  # native one-pass extraction (jsonl_fields.cpp)
        for _id, id_, title, text in rows:
            doc_id = _id if _id is not None else id_
            ids.append(str(doc_id) if doc_id is not None else str(len(ids)))
            title, text = title or "", text or ""
            texts.append((title + " " + text).strip() if title else text)
        return ids, texts
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            doc_id = str(row.get("_id", row.get("id", len(ids))))
            title = row.get("title", "")
            text = row.get("text", "")
            ids.append(doc_id)
            texts.append((title + " " + text).strip() if title else text)
    return ids, texts


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--modelname", required=True)
    ap.add_argument("--randominit", action="store_true",
                    help="random weights (zero-egress smoke serving)")
    ap.add_argument("--method", default="weightedmean")
    ap.add_argument("--specb", action="store_true")
    ap.add_argument("--maxseqlen", type=int, default=300)
    ap.add_argument("--batchsize", type=int, default=64)
    ap.add_argument("--quantize", choices=["int8"], default=None,
                    help="int8 model weights (>=1B models, ~1.5x encode)")
    ap.add_argument("--quantize-index", choices=["int8"], default=None,
                    help="int8 corpus storage (10M docs on one chip)")
    ap.add_argument("--index", choices=["exact", "ivf"], default="exact",
                    help="exact scan (batched sweeps) or balanced-IVF ANN "
                    "(interactive latency; reads ~nprobe/clusters of the "
                    "corpus per query)")
    ap.add_argument("--clusters", default="auto",
                    type=lambda s: s if s == "auto" else int(s),
                    help="IVF cluster count, or 'auto' (default): sweep K on "
                    "the k-means training sample and pick the largest K "
                    "under the 10%% overflow knee")
    ap.add_argument("--nprobe", type=int, default=32,
                    help="IVF clusters probed per query")
    ap.add_argument("--corpus", default=None, help="jsonl corpus to index at start")
    ap.add_argument("--index-path", default=None,
                    help="persisted-index directory: loaded at startup if it "
                    "exists (skips the corpus re-encode), target of POST "
                    "/save, and auto-saved after an initial --corpus build")
    ap.add_argument("--allow-save-path", action="store_true",
                    help="let POST /save clients pass {\"path\": ...} (writes "
                    "server-side files wherever the client says; off by "
                    "default — /save targets --index-path)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max-wait-ms", type=float, default=3.0,
                    help="micro-batcher coalescing window")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip precompiling the encode buckets at startup "
                    "(first requests then pay multi-second jit compiles)")
    ap.add_argument("--rerank", action="store_true",
                    help="enable POST /rerank (SGPT-CE log-prob reranking) "
                    "using the SAME loaded model as the encoder (zero extra "
                    "weight HBM; tied-embedding LM head)")
    ap.add_argument("--rerank-model", default=None,
                    help="separate causal-LM checkpoint for /rerank (the "
                    "paper pairs a BE retriever with a plain GPT CE; this "
                    "loads a second model into HBM)")
    ap.add_argument("--rerank-maxlen", type=int, default=2048,
                    help="max context tokens per (query, doc) rerank pair")
    ap.add_argument("--rerank-prompt", default="G",
                    help="CE prompt ablation id (ce_prompts registry; the "
                    "paper's main prompt is G; L/M are Yes/No classifiers)")
    ap.add_argument("--rerank-pack-t", type=int, default=None,
                    help="CE sequence packing: short pairs bin-pack "
                    "several-per-row (crossencoder.py pack_t; scores "
                    "unchanged, higher rerank throughput on short docs)")
    add_mesh_args(ap)
    args = ap.parse_args(argv)

    setup_logging()
    from ..encoder import EmbeddingEngine
    from ..index import DenseIndex
    from ..serving import SearchService, make_server

    params, cfg, tokenizer = build_model(args.modelname, random_init=args.randominit)
    mesh = build_mesh(args)
    params = maybe_shard(params, mesh)
    engine = EmbeddingEngine(
        params, cfg, tokenizer, method=args.method, specb=args.specb,
        max_seq_len=args.maxseqlen, batch_size=args.batchsize,
        normalize_embeddings=True, mesh=mesh, quantize=args.quantize)
    if args.index == "ivf":
        from ..index_ivf import IVFIndex
        index = IVFIndex(engine.out_dim, n_clusters=args.clusters,
                         nprobe=args.nprobe, normalize_embeddings=True,
                         quantize=args.quantize_index, mesh=mesh)
    else:
        index = DenseIndex(engine.out_dim, normalize_embeddings=True,
                           mesh=mesh, quantize=args.quantize_index)
    ranker = None
    if args.rerank or args.rerank_model:
        from ..ce_prompts import build_ranker
        if args.rerank_model:
            ce_params, ce_cfg, ce_tok = build_model(
                args.rerank_model, random_init=args.randominit)
            ce_params = maybe_shard(ce_params, mesh)
        else:  # share the encoder's weights: zero extra HBM
            ce_params, ce_cfg, ce_tok = params, cfg, tokenizer
        ranker = build_ranker(args.rerank_prompt, ce_params, ce_cfg, ce_tok,
                              batch_size=args.batchsize,
                              max_length=args.rerank_maxlen, mesh=mesh,
                              quantize=args.quantize,
                              pack_t=args.rerank_pack_t)

    import os
    loaded = False
    if args.index_path and os.path.exists(
            os.path.join(args.index_path, "index.npz")):
        index, documents = SearchService.load_index(args.index_path, mesh=mesh)
        if getattr(index, "dim", None) != engine.out_dim:
            raise SystemExit(f"--index-path holds dim={index.dim} embeddings "
                             f"but the model produces {engine.out_dim}")
        logger.info("loaded %d docs from %s", len(index), args.index_path)
        service = SearchService(engine, index, documents=documents,
                                max_wait_ms=args.max_wait_ms, ranker=ranker)
        loaded = True
    else:
        service = SearchService(engine, index, max_wait_ms=args.max_wait_ms,
                                ranker=ranker)

    if args.corpus and not loaded:
        ids, texts = load_jsonl_corpus(args.corpus)
        logger.info("indexing %d docs from %s ...", len(texts), args.corpus)
        service.add_documents(texts, ids=ids, build=True)
        if args.index_path:
            logger.info("saving index to %s", args.index_path)
            service.save(args.index_path)

    if not args.no_warmup:
        logger.info("warming encode buckets (compile-before-traffic) ...")
        engine.warmup()
        service.warm_search()

    server = make_server(service, args.host, args.port,
                         model_name=args.modelname,
                         index_path=args.index_path,
                         allow_save_path=args.allow_save_path)
    logger.info("serving %s on http://%s:%d (docs=%d)", args.modelname,
                *server.server_address[:2], len(index))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
