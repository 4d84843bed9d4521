"""Asymmetric search with SPECB bracket tokens + the DenseIndex serving path
(reference README.md:353-420 usage, re-shaped around embed→index→query)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run


from sgpt_tpu.index import DenseIndex
from sgpt_tpu.model import SGPTModel

QUERY = "I'm searching for a planet not too far from Earth."
DOCS = [
    "Neptune is the eighth and farthest-known Solar planet from the Sun.",
    "TRAPPIST-1d is a small exoplanet on the inner edge of the habitable zone.",
    "A harsh desert world orbiting twin suns in the galaxy's Outer Rim.",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    args = ap.parse_args()

    if args.model == "tiny":
        import jax
        from sgpt_tpu.models import tiny, init_params
        from sgpt_tpu.tokenization import SimpleTokenizer
        cfg = tiny("neo")
        model = SGPTModel(init_params(cfg, jax.random.key(0)), cfg,
                          SimpleTokenizer(vocab_size=cfg.vocab_size), specb=True)
    else:
        import jax.numpy as jnp
        from sgpt_tpu.models import load_pretrained
        from sgpt_tpu.tokenization import get_tokenizer
        params, cfg = load_pretrained(args.model, dtype=jnp.bfloat16)
        model = SGPTModel(params, cfg, get_tokenizer(args.model), specb=True)

    index = DenseIndex(model.cfg.hidden_size)
    index.add(model.encode(DOCS), ids=[f"doc{i}" for i in range(len(DOCS))])
    index.build()

    scores, ids = index.search_embeddings(
        model.encode([QUERY], is_query=True), k=3)
    for s, did in zip(scores[0], ids[0]):
        print(f"{s:+.4f}  {did}: {DOCS[int(did[3:])][:60]}")


if __name__ == "__main__":
    main()
