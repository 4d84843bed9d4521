"""Corpus-ingestion benchmark: native jsonl extractor vs the json.loads loop.

    python tools/bench_jsonl.py --rows 1000000

Generates a BEIR-shaped corpus.jsonl (row sizes drawn to match typical BEIR
passage stats: ~60-word bodies, short titles, ~10% unicode), then times
(a) the json.loads dict loop load_beir_dataset used before round 3 and
(b) the native one-pass extractor (native/jsonl_fields.cpp), checking the
results are identical.
"""
import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORDS = ("retrieval semantic search embedding transformer neural corpus "
         "query document relevance ranking model token attention sequence "
         "évaluation 中文 naïve").split()


def generate(path: str, rows: int, seed: int = 0):
    rng = random.Random(seed)
    with open(path, "w") as f:
        for i in range(rows):
            title = " ".join(rng.choices(WORDS, k=rng.randrange(2, 8)))
            text = " ".join(rng.choices(WORDS, k=rng.randrange(30, 90)))
            f.write(json.dumps({"_id": f"doc{i}", "title": title,
                                "text": text,
                                "metadata": {}},  # BEIR rows carry one
                               ensure_ascii=bool(i % 7)) + "\n")


def load_python(path: str):
    corpus = {}
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            corpus[str(row["_id"])] = {"title": row.get("title", "") or "",
                                       "text": row.get("text", "") or ""}
    return corpus


def load_native(path: str):
    from sgpt_tpu.data.jsonl_native import extract_fields
    rows = extract_fields(path, ("_id", "title", "text"))
    assert rows is not None, "native extractor unavailable/failed"
    return {str(i): {"title": t or "", "text": x or ""} for i, t, x in rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--path", default="/tmp/bench_corpus.jsonl")
    args = ap.parse_args()

    if not os.path.exists(args.path) or sum(
            1 for _ in open(args.path)) != args.rows:
        print(f"generating {args.rows} rows ...", file=sys.stderr)
        generate(args.path, args.rows)
    size_mb = os.path.getsize(args.path) / 1e6

    t0 = time.perf_counter()
    native = load_native(args.path)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    python = load_python(args.path)
    t_python = time.perf_counter() - t0

    assert native == python, "native/python corpora differ!"
    print(json.dumps({
        "rows": args.rows, "file_mb": round(size_mb, 1),
        "python_s": round(t_python, 2), "native_s": round(t_native, 2),
        "speedup": round(t_python / t_native, 2),
        "native_mb_per_s": round(size_mb / t_native, 1),
    }))


if __name__ == "__main__":
    main()
