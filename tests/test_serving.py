"""Serving layer: micro-batcher semantics, service facade, HTTP endpoints.

The HTTP tests run a real ThreadingHTTPServer on an ephemeral port and speak
actual HTTP through http.client — the same wire a production client uses; the
/v1/embeddings shape is additionally validated by pointing the repo's own
OpenAI client (baselines/openai_client.py) at the server.
"""
import http.client
import json
import threading
import time

import numpy as np
import pytest

import jax

from sgpt_tpu.encoder import EmbeddingEngine
from sgpt_tpu.index import DenseIndex
from sgpt_tpu.models import init_params, tiny
from sgpt_tpu.serving import MicroBatcher, SearchService, make_server
from sgpt_tpu.tokenization import SimpleTokenizer


# ---------------------------------------------------------------------------
# MicroBatcher
# ---------------------------------------------------------------------------
def test_microbatcher_results_align():
    calls = []

    def double(items):
        calls.append(len(items))
        return [x * 2 for x in items]

    b = MicroBatcher(double, max_wait_ms=1)
    try:
        assert b([1, 2, 3]) == [2, 4, 6]
        assert b([]) == []
        assert b.items_processed == 3
    finally:
        b.close()


def test_microbatcher_coalesces_concurrent_requests():
    """Requests arriving while a dispatch is on the 'device' ride ONE next
    dispatch (deterministic: the first call blocks on a gate while the others
    enqueue)."""
    gate = threading.Event()
    calls = []

    def fn(items):
        calls.append(sorted(items))
        gate.wait(5)
        return items

    b = MicroBatcher(fn, max_wait_ms=200)
    try:
        futs = [b.submit([0])]
        while not calls:  # first dispatch now blocked inside fn
            time.sleep(0.005)
        futs += [b.submit([i]) for i in (1, 2, 3)]
        gate.set()
        results = [f.result(timeout=5) for f in futs]
        assert results == [[0], [1], [2], [3]]
        assert len(calls) == 2              # 1 solo + 1 coalesced
        assert calls[1] == [1, 2, 3]
    finally:
        b.close()


def test_microbatcher_error_propagates_and_keeps_serving():
    def fn(items):
        if "boom" in items:
            raise RuntimeError("boom")
        return items

    b = MicroBatcher(fn, max_wait_ms=1)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b(["boom"])
        assert b(["ok"]) == ["ok"]          # dispatcher survived
    finally:
        b.close()


def test_microbatcher_max_items_bounds_coalescing():
    gate = threading.Event()
    calls = []

    def fn(items):
        calls.append(len(items))
        gate.wait(5)
        return items

    b = MicroBatcher(fn, max_items=2, max_wait_ms=200)
    try:
        futs = [b.submit([0])]
        while not calls:
            time.sleep(0.005)
        futs += [b.submit([i]) for i in (1, 2, 3)]
        gate.set()
        [f.result(timeout=5) for f in futs]
        assert calls[1:] == [2, 1]          # capped at 2, remainder next
    finally:
        b.close()


# ---------------------------------------------------------------------------
# SearchService (+ HTTP) over a real tiny engine
# ---------------------------------------------------------------------------
DOCS = {
    "py": "python is a programming language",
    "tpu": "tensor processing units accelerate matrix multiplication",
    "sea": "the pacific ocean is the largest body of water",
}


@pytest.fixture(scope="module")
def service():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    engine = EmbeddingEngine(params, cfg,
                             SimpleTokenizer(vocab_size=cfg.vocab_size),
                             method="weightedmean", specb=False, batch_size=4,
                             normalize_embeddings=True)
    svc = SearchService(engine, DenseIndex(engine.out_dim,
                                           normalize_embeddings=True),
                        max_wait_ms=1.0)
    svc.add_documents(list(DOCS.values()), ids=list(DOCS), build=True)
    yield svc
    svc.close()


@pytest.fixture(scope="module")
def server(service):
    srv = make_server(service, port=0, model_name="tiny-neo")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _post(server, path, payload):
    conn = http.client.HTTPConnection(*server.server_address[:2], timeout=30)
    try:
        conn.request("POST", path, json.dumps(payload),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        return r.status, json.loads(r.read().decode())
    finally:
        conn.close()


def _get(server, path):
    conn = http.client.HTTPConnection(*server.server_address[:2], timeout=30)
    try:
        conn.request("GET", path)
        r = conn.getresponse()
        return r.status, json.loads(r.read().decode())
    finally:
        conn.close()


def test_search_exact_text_wins(service):
    # identical text => identical embedding => cos = 1 tops the ranking
    hits = service.search([DOCS["tpu"]], k=3, return_documents=True)[0]
    assert hits[0]["id"] == "tpu"
    assert hits[0]["document"] == DOCS["tpu"]
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-3)
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)


def test_pending_add_is_searchable_before_rebuild(service):
    service.add_documents(["a brand new document about volcanoes"], ids=["volc"])
    assert service.stats()["pending_docs"] == 1
    hits = service.search(["a brand new document about volcanoes"], k=1)[0]
    assert hits[0]["id"] == "volc"
    assert service.rebuild() == 4
    assert service.stats()["pending_docs"] == 0
    hits = service.search(["a brand new document about volcanoes"], k=1)[0]
    assert hits[0]["id"] == "volc"            # still found after the merge


def test_duplicate_ids_rejected(service):
    with pytest.raises(ValueError, match="duplicate"):
        service.add_documents(["x"], ids=["py"])


def test_http_healthz_and_stats(server):
    assert _get(server, "/healthz") == (200, {"status": "ok"})
    status, stats = _get(server, "/stats")
    assert status == 200 and stats["documents"] >= 3
    assert _get(server, "/nope")[0] == 404


def test_http_openai_embeddings_shape(server, service):
    status, body = _post(server, "/v1/embeddings",
                         {"input": ["hello world", "second text"]})
    assert status == 200
    assert body["object"] == "list" and body["model"] == "tiny-neo"
    assert [d["index"] for d in body["data"]] == [0, 1]
    emb = np.array(body["data"][0]["embedding"])
    assert emb.shape == (service.engine.out_dim,)
    assert np.linalg.norm(emb) == pytest.approx(1.0, abs=1e-2)
    assert body["usage"]["prompt_tokens"] == 4

    status, body = _post(server, "/v1/embeddings", {"input": "just a string"})
    assert status == 200 and len(body["data"]) == 1


def test_http_embeddings_via_repo_openai_client(server):
    """The repo's own OpenAI client speaks to this server unmodified —
    server and client implement the same wire format."""
    from sgpt_tpu.baselines.openai_client import OpenAIEmbedClient
    host, port = server.server_address[:2]
    client = OpenAIEmbedClient(base_url=f"http://{host}:{port}/v1",
                               api_key="unused", model="tiny-neo")
    emb = np.asarray(client(["one", "two", "three"], is_query=True))
    assert emb.shape[0] == 3
    assert np.linalg.norm(emb[0]) == pytest.approx(1.0, abs=1e-2)


def test_http_search_and_documents_roundtrip(server):
    status, body = _post(server, "/documents", {
        "documents": [{"id": "http-doc", "text": "added over http"}]})
    assert status == 200 and body["added"] == 1 and body["ids"] == ["http-doc"]

    status, body = _post(server, "/search",
                         {"queries": ["added over http"], "k": 2,
                          "return_documents": True})
    assert status == 200
    hits = body["results"][0]
    assert hits[0]["id"] == "http-doc" and hits[0]["document"] == "added over http"

    status, body = _post(server, "/rebuild", {})
    assert status == 200 and body["documents"] >= 4


def test_http_bad_requests(server):
    assert _post(server, "/v1/embeddings", {})[0] == 400
    assert _post(server, "/v1/embeddings", {"input": [1, 2]})[0] == 400
    assert _post(server, "/search", {"queries": "not a list"})[0] == 400
    assert _post(server, "/search", {"queries": ["q"], "k": 0})[0] == 400
    assert _post(server, "/documents", {"texts": "nope"})[0] == 400
    conn = http.client.HTTPConnection(*server.server_address[:2], timeout=30)
    try:
        conn.request("POST", "/search", b"{not json",
                     {"Content-Type": "application/json"})
        assert conn.getresponse().status == 400
    finally:
        conn.close()


def test_http_delete_documents(server, service):
    """POST /documents/delete hides docs immediately; auto-assigned ids never
    reuse a deleted id's number."""
    status, out = _post(server, "/documents",
                        {"documents": [{"id": "del-a", "text": "delete me aa"},
                                       {"id": "del-b", "text": "delete me bb"}],
                         "build": True})
    assert status == 200
    status, out = _post(server, "/search",
                        {"queries": ["delete me aa"], "k": 2})
    assert out["results"][0][0]["id"] == "del-a"
    status, out = _post(server, "/documents/delete", {"ids": ["del-a"]})
    assert status == 200 and out["deleted"] == 1
    status, out = _post(server, "/search",
                        {"queries": ["delete me aa"], "k": 5})
    assert "del-a" not in [h["id"] for h in out["results"][0]]
    # unknown id -> 400, not 500
    assert _post(server, "/documents/delete", {"ids": ["nope"]})[0] == 400
    assert _post(server, "/documents/delete", {"ids": "x"})[0] == 400
    # duplicate ids within one delete call -> 400 (same contract as two calls)
    assert _post(server, "/documents/delete",
                 {"ids": ["del-b", "del-b"]})[0] == 400
    # auto ids keep probing past existing numbers after deletions
    status, out = _post(server, "/documents",
                        {"texts": ["auto id doc one", "auto id doc two"]})
    assert status == 200 and len(set(out["ids"])) == 2
    assert all(i not in ("del-a",) for i in out["ids"])
    # deleting an auto id must NOT let the next add reuse it (the delete pops
    # it from service.documents; the probe also checks the tombstone set)
    victim = out["ids"][0]
    _post(server, "/documents/delete", {"ids": [victim]})
    status, out2 = _post(server, "/documents", {"texts": ["auto id doc three"]})
    assert status == 200 and victim not in out2["ids"], (victim, out2)
    _post(server, "/documents/delete", {"ids": ["del-b", out["ids"][1],
                                                *out2["ids"]]})


def test_http_delete_then_readd_same_id_is_upsert(server):
    """Explicit re-add of a deleted id is allowed (delete+add = upsert): the
    new document wins searches; the tombstoned row stays hidden."""
    _post(server, "/documents",
          {"documents": [{"id": "ups", "text": "original upsert text"}],
           "build": True})
    _post(server, "/documents/delete", {"ids": ["ups"]})
    status, out = _post(server, "/documents",
                        {"documents": [{"id": "ups",
                                        "text": "replacement upsert text"}]})
    assert status == 200
    status, out = _post(server, "/search",
                        {"queries": ["replacement upsert text"], "k": 1,
                         "return_documents": True})
    hit = out["results"][0][0]
    assert hit["id"] == "ups" and hit["document"] == "replacement upsert text"
    _post(server, "/documents/delete", {"ids": ["ups"]})


def test_http_document_id_validation(server):
    """Review-found edges: non-string ids stringify, duplicate ids within a
    request are rejected, a partial-id documents form is rejected (honoring
    some ids and dropping others silently lost the supplied ones), empty-
    string ids are rejected."""
    status, out = _post(server, "/documents",
                        {"texts": ["int id doc"], "ids": [12345]})
    assert status == 200 and out["ids"] == ["12345"]
    _post(server, "/documents/delete", {"ids": ["12345"]})  # str round-trips
    assert _post(server, "/documents",
                 {"texts": ["a", "b"], "ids": "xy"})[0] == 400
    assert _post(server, "/documents",
                 {"texts": ["a", "b"], "ids": ["same", "same"]})[0] == 400
    assert _post(server, "/documents",
                 {"documents": [{"id": "has", "text": "a"},
                                {"text": "missing id"}]})[0] == 400
    assert _post(server, "/documents",
                 {"texts": ["a"], "ids": [""]})[0] == 400


def test_rebuild_on_fresh_ivf_service_is_ok():
    """POST /rebuild before any documents must not 500 on an IVF index
    (IVFIndex.build raises on empty; the service treats it as a no-op)."""
    import jax

    from sgpt_tpu.index_ivf import IVFIndex
    from sgpt_tpu.models import init_params, tiny
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo")
    engine = EmbeddingEngine(init_params(cfg, jax.random.key(0)), cfg,
                             SimpleTokenizer(vocab_size=cfg.vocab_size),
                             batch_size=4, normalize_embeddings=True)
    svc = SearchService(engine, IVFIndex(cfg.hidden_size, n_clusters=2),
                        max_wait_ms=1.0)
    try:
        assert svc.rebuild() == 0
        assert svc.search(["anything"], k=3) == [[]]
    finally:
        svc.close()


def test_rerank_endpoint_two_stage():
    """POST /rerank: bi-encoder first_k retrieval + SGPT-CE log-prob rerank.
    Scores must equal the ranker's own predict() on the retrieved pairs, and
    results sort by ce_score."""
    from sgpt_tpu.crossencoder import CrossEncoderRanker

    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    engine = EmbeddingEngine(params, cfg, tok, batch_size=4,
                             normalize_embeddings=True)
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=64)
    svc = SearchService(engine, DenseIndex(engine.out_dim), ranker=ranker,
                        max_wait_ms=1.0)
    docs = {f"d{i}": f"document body number {i} about alpha beta" for i in range(8)}
    srv = make_server(svc, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        svc.add_documents(list(docs.values()), ids=list(docs), build=True)
        status, out = _post(srv, "/rerank",
                            {"queries": ["document number 3"], "k": 2,
                             "first_k": 5, "return_documents": True})
        assert status == 200
        hits = out["results"][0]
        assert len(hits) == 2 and hits[0]["ce_score"] >= hits[1]["ce_score"]
        assert all("score" in h and "document" in h for h in hits)
        # parity with a direct predict over the same first-stage candidates
        first = svc.search(["document number 3"], k=5)[0]
        want = ranker.predict([("document number 3", docs[h["id"]])
                               for h in first])
        by_id = {h["id"]: h["ce_score"]
                 for h in svc.rerank(["document number 3"], k=5, first_k=5)[0]}
        for h, w in zip(first, want):
            np.testing.assert_allclose(by_id[h["id"]], w, rtol=1e-6)
        # validation + no-ranker error paths
        assert _post(srv, "/rerank", {"queries": "x"})[0] == 400
        assert _post(srv, "/rerank", {"queries": ["x"], "k": 5,
                                      "first_k": 2})[0] == 400
    finally:
        srv.shutdown()
        svc.close()


def test_rerank_without_ranker_is_400(server):
    assert _post(server, "/rerank", {"queries": ["q"]})[0] == 400


def test_serve_cli_corpus_loader(tmp_path):
    """serve.load_jsonl_corpus: BEIR `_id`+title+text rows, bare `id` rows,
    and missing-id fallback — identical through the native and json.loads
    paths."""
    import sgpt_tpu.cli.serve as serve_cli
    from sgpt_tpu.data import jsonl_native

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"_id": "a", "title": "T", "text": "body one"}\n'
        '{"id": "b", "text": "body two"}\n'
        '{"text": "no id at all"}\n')
    want_ids = ["a", "b", "2"]
    want_texts = ["T body one", "body two", "no id at all"]
    assert serve_cli.load_jsonl_corpus(str(p)) == (want_ids, want_texts)
    if jsonl_native.available():  # force the json.loads fallback too
        orig = jsonl_native.extract_fields
        try:
            jsonl_native.extract_fields = lambda *a, **k: None
            assert serve_cli.load_jsonl_corpus(str(p)) == (want_ids,
                                                           want_texts)
        finally:
            jsonl_native.extract_fields = orig


def test_microbatcher_submit_after_close_fails_fast():
    mb = MicroBatcher(lambda items: [x * 2 for x in items], max_wait_ms=1.0)
    assert mb([1, 2]) == [2, 4]
    mb.close()
    with pytest.raises(RuntimeError, match="close"):
        mb.submit([3])


def test_http_empty_queries_and_inputs(server):
    """Empty batches are valid no-ops, not 500s."""
    status, out = _post(server, "/search", {"queries": []})
    assert status == 200 and out["results"] == []
    status, out = _post(server, "/v1/embeddings", {"input": []})
    assert status == 200 and out["data"] == []


def test_http_save_client_path_rejected_by_default(server, tmp_path):
    """POST /save with a client-supplied path is refused unless the server
    was built with allow_save_path=True (server-side file-write hazard)."""
    status, out = _post(server, "/save", {"path": str(tmp_path / "x")})
    assert status == 403 and "disabled" in out["error"]
    # no configured --index-path either -> 400
    assert _post(server, "/save", {})[0] == 400


def test_http_save_allowed_when_opted_in(service, tmp_path):
    srv = make_server(service, port=0, allow_save_path=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        status, out = _post(srv, "/save", {"path": str(tmp_path / "idx")})
        # >=: the module-scoped service accumulates docs from earlier tests
        assert status == 200 and out["texts"] >= len(DOCS)
        assert (tmp_path / "idx" / "index.npz").exists()
    finally:
        srv.shutdown()


def test_concurrent_http_searches_coalesce(server, service):
    """Many single-query clients in flight at once: all answered correctly,
    and the encode dispatch count stays below one-per-request."""
    before = service._q_batcher.dispatches
    errs, results = [], {}

    def one(i):
        try:
            status, body = _post(server, "/search",
                                 {"queries": [DOCS["sea"]], "k": 1})
            assert status == 200
            results[i] = body["results"][0][0]["id"]
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errs
    assert all(results[i] == "sea" for i in range(12))
    assert service._q_batcher.dispatches - before < 12


def test_coalesced_search_mixed_k(service):
    """Concurrent searches with DIFFERENT k coalesce into one padded-Q
    index dispatch; each caller still gets exactly its own k rows."""
    before = service._s_batcher.dispatches
    out = {}

    def one(i, k):
        out[(i, k)] = service.search([DOCS["py"]], k=k)[0]

    threads = [threading.Thread(target=one, args=(i, k))
               for i, k in enumerate([1, 2, 3, 1, 2])]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    for (i, k), hits in out.items():
        assert len(hits) == k, (i, k, hits)
        assert hits[0]["id"] == "py"
    assert service._s_batcher.dispatches > before


def test_warm_search_precompiles_buckets(service):
    # no-op safety on a built index; compiles Q buckets without touching
    # results
    service.warm_search(max_queries=4, ks=(1, 2))
    assert service.search([DOCS["tpu"]], k=1)[0][0]["id"] == "tpu"


def test_warm_search_empty_index_is_noop():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(1))
    engine = EmbeddingEngine(params, cfg,
                             SimpleTokenizer(vocab_size=cfg.vocab_size),
                             batch_size=2, normalize_embeddings=True)
    svc = SearchService(engine, DenseIndex(engine.out_dim,
                                           normalize_embeddings=True))
    try:
        svc.warm_search()  # must not raise on the empty, unbuilt index
    finally:
        svc.close()


def test_server_backlog_accepts_connect_burst(server):
    """>5 simultaneous keep-alive connects (the old TCPServer default
    backlog) must all be accepted — a 64-client burst used to get RSTs."""
    conns = []
    try:
        for _ in range(24):
            c = http.client.HTTPConnection(*server.server_address[:2],
                                           timeout=30)
            c.connect()
            conns.append(c)
        for c in conns:
            c.request("GET", "/healthz")
            r = c.getresponse()
            assert r.status == 200
            r.read()  # drain the keep-alive body
    finally:
        for c in conns:
            c.close()
