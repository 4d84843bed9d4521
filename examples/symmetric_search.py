"""Symmetric semantic search — the reference README's first usage example
(README.md:92-149) in sgpt_tpu form.

Runs offline by default (--model tiny: hash tokenizer + random weights, for
wiring demos); point --model at a local SGPT checkpoint for real embeddings.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run


import jax.numpy as jnp

from sgpt_tpu.model import SGPTModel
from sgpt_tpu.ops import cos_sim

QUERIES = ["I'm searching for a planet not too far from Earth."]
DOCS = [
    "Neptune is the eighth and farthest-known Solar planet from the Sun.",
    "TRAPPIST-1d, also designated as 2MASS J23062928-0502285 d, is a small "
    "exoplanet which orbits on the inner edge of the habitable zone.",
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
                          SimpleTokenizer(vocab_size=cfg.vocab_size))
    else:
        from sgpt_tpu.models import load_pretrained
        from sgpt_tpu.tokenization import get_tokenizer
        params, cfg = load_pretrained(args.model, dtype=jnp.bfloat16)
        model = SGPTModel(params, cfg, get_tokenizer(args.model))

    q = jnp.asarray(model.encode(QUERIES))
    d = jnp.asarray(model.encode(DOCS))
    scores = cos_sim(q, d)
    for i, doc in enumerate(DOCS):
        print(f"{float(scores[0, i]):+.4f}  {doc[:60]}")


if __name__ == "__main__":
    main()
