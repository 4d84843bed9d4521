"""The serving lifecycle, programmatically: index → search → add → delete →
save → restart-from-disk. Everything `cli/serve.py` does over HTTP, through
the `SearchService` facade (docs/SERVING.md for the full guide).

Runs offline (tiny random model, hash tokenizer); the flow is identical for
a real checkpoint.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo-root run

import jax

from sgpt_tpu.encoder import EmbeddingEngine
from sgpt_tpu.models import init_params, tiny
from sgpt_tpu.serving import SearchService
from sgpt_tpu.tokenization import SimpleTokenizer

DOCS = {
    "neptune": "Neptune is the eighth and farthest-known Solar planet.",
    "trappist": "TRAPPIST-1d is a small exoplanet on the inner edge of the "
                "habitable zone.",
    "tatooine": "A harsh desert world orbiting twin suns in the galaxy's "
                "Outer Rim.",
}


def main():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    engine = EmbeddingEngine(params, cfg, tok, method="weightedmean",
                             batch_size=8, normalize_embeddings=True)
    from sgpt_tpu.crossencoder import CrossEncoderRanker
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=64)
    svc = SearchService(engine, max_wait_ms=1.0, ranker=ranker)
    try:
        # index + search
        svc.add_documents(list(DOCS.values()), ids=list(DOCS), build=True)
        hits = svc.search(["exoplanet habitable zone"], k=2,
                          return_documents=True)[0]
        print("top hit:", hits[0]["id"], f"({hits[0]['score']:+.4f})")

        # two-stage: bi-encoder retrieval + SGPT-CE log-prob rerank
        reranked = svc.rerank(["exoplanet habitable zone"], k=2, first_k=3)[0]
        print("reranked:", [(h["id"], round(h["ce_score"], 2))
                            for h in reranked])

        # live add: the pending slab answers exactly until the next rebuild
        svc.add_documents(["Proxima Centauri b orbits within the habitable "
                           "zone of the nearest star."], ids=["proxima"])
        print("pending docs:", svc.stats()["pending_docs"])

        # delete: tombstoned — immediately unsearchable, storage reclaims
        # at the next rebuild; delete + re-add of the same id = upsert
        svc.delete_documents(["tatooine"])
        ids = [h["id"] for h in svc.search(["desert world twin suns"], k=3)[0]]
        assert "tatooine" not in ids
        svc.rebuild()

        # persist + restart: the new server skips the corpus re-encode
        with tempfile.TemporaryDirectory() as td:
            svc.save(td)
            index, documents = SearchService.load_index(td)
            svc2 = SearchService(engine, index, documents=documents,
                                 max_wait_ms=1.0)
            try:
                again = svc2.search(["exoplanet habitable zone"], k=2)[0]
                assert [h["id"] for h in again] == [h["id"] for h in
                                                    svc.search(
                    ["exoplanet habitable zone"], k=2)[0]]
                print("restarted from disk:", svc2.stats()["documents"],
                      "docs, answers identical")
            finally:
                svc2.close()
    finally:
        svc.close()


if __name__ == "__main__":
    main()
