"""Concrete OpenAI-compatible adapter + dataset fetch, against a FAKE local
HTTP server (zero egress; reference call path
beir_openai_embeddings_batched_parallel.py:193-266)."""
import io
import json
import os
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from sgpt_tpu.baselines import (OpenAIEmbedClient, OpenAIRetriever,
                                fetch_beir_dataset)


class _FakeAPI(BaseHTTPRequestHandler):
    """Deterministic embeddings: vector[0] = len(text), vector[1] = model id.
    Returns rows intentionally REVERSED to check index-based reordering."""

    models = {"q-model": 1.0, "d-model": 2.0, "text-embedding-3-small": 3.0}

    def do_POST(self):
        if self.headers.get("Authorization") != "Bearer test-key":
            self.send_response(401)
            self.end_headers()
            return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        rows = [{"index": i,
                 "embedding": [float(len(t)), self.models[body["model"]], 0.0]}
                for i, t in enumerate(body["input"])]
        out = json.dumps({"data": list(reversed(rows))}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out)

    def do_GET(self):  # dataset zip endpoints
        buf = io.BytesIO()
        if self.path.endswith("toy.zip"):
            with zipfile.ZipFile(buf, "w") as z:
                z.writestr("toy/corpus.jsonl",
                           json.dumps({"_id": "d0", "title": "", "text": "x"}))
                z.writestr("toy/queries.jsonl", json.dumps({"_id": "q0", "text": "x"}))
                z.writestr("toy/qrels/test.tsv", "query-id\tcorpus-id\tscore\n")
        elif self.path.endswith(("data-eval.zip", "data-train.zip")):
            split = "eval" if "eval" in self.path else "train"
            with zipfile.ZipFile(buf, "w") as z:
                z.writestr(f"data/{split}/askubuntu/test.txt", "0\tq\td\n")
        elif self.path.endswith("evil.zip"):
            with zipfile.ZipFile(buf, "w") as z:
                z.writestr("../escape.txt", "zip-slip")
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _FakeAPI)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_client_requires_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(ValueError, match="default-off"):
        OpenAIEmbedClient()


def test_client_embeds_and_reorders(server):
    client = OpenAIEmbedClient(api_key="test-key", base_url=server)
    out = client(["a", "bbb", "cc"], is_query=False)
    # row order restored from the API's index field despite reversed response
    assert [v[0] for v in out] == [1.0, 3.0, 2.0]
    assert all(v[1] == 3.0 for v in out)  # default symmetric model


def test_client_query_doc_model_split(server):
    client = OpenAIEmbedClient(api_key="test-key", base_url=server,
                               query_model="q-model", doc_model="d-model")
    assert client(["x"], is_query=True)[0][1] == 1.0
    assert client(["x"], is_query=False)[0][1] == 2.0


def test_client_plugs_into_retriever(server, tmp_path):
    """The concrete client IS the embed_fn of the reference-parity retriever:
    batching, fan-out, caching all apply unchanged."""
    client = OpenAIEmbedClient(api_key="test-key", base_url=server)
    r = OpenAIRetriever(client, batch_size=2, parallel_workers=2,
                        cache_dir=str(tmp_path / "cache"))
    corpus = [{"title": "", "text": t} for t in ("one", "two words", "three")]
    emb = r.encode_corpus(corpus)
    assert emb.shape == (3, 3)
    np.testing.assert_allclose(emb[:, 0], [len("one"), len("two words"),
                                           len("three")])
    # cached second call returns identical rows without hitting the API
    emb2 = r.encode_corpus(corpus)
    np.testing.assert_allclose(emb2, emb)


def test_fetch_beir_dataset(server, tmp_path):
    out = fetch_beir_dataset("toy", out_dir=str(tmp_path / "ds"),
                             base_url=server)
    import os
    assert os.path.isfile(os.path.join(out, "corpus.jsonl"))
    # idempotent: second call short-circuits on the existing dir
    assert fetch_beir_dataset("toy", out_dir=str(tmp_path / "ds"),
                              base_url=server) == out


def test_fetch_beir_dataset_clear_error(tmp_path):
    with pytest.raises(RuntimeError, match="zero-egress"):
        fetch_beir_dataset("nope", out_dir=str(tmp_path / "ds"),
                           base_url="http://127.0.0.1:9")  # closed port


def _zip_sha256(server_url, name):
    import hashlib
    import urllib.request
    with urllib.request.urlopen(f"{server_url}/{name}") as r:
        return hashlib.sha256(r.read()).hexdigest()


def test_fetch_beir_dataset_checksum_ok_and_mismatch(server, tmp_path):
    from sgpt_tpu.baselines.openai_client import fetch_beir_dataset

    good = _zip_sha256(server, "toy.zip")
    out = fetch_beir_dataset("toy", out_dir=str(tmp_path / "a"),
                             base_url=server, sha256=good)
    assert os.path.exists(os.path.join(out, "corpus.jsonl"))
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        fetch_beir_dataset("toy", out_dir=str(tmp_path / "b"),
                           base_url=server, sha256="0" * 64)
    # the rejected archive leaves NOTHING behind (no _part, no zip)
    assert os.listdir(tmp_path / "b") == []


def test_fetch_useb_data(server, tmp_path):
    from sgpt_tpu.baselines.openai_client import fetch_useb_data

    dirs = fetch_useb_data("all", out_dir=str(tmp_path), base_url=server)
    assert [os.path.basename(d) for d in dirs] == ["train", "eval"]
    assert os.path.exists(
        os.path.join(tmp_path, "data", "eval", "askubuntu", "test.txt"))
    # second call short-circuits on the extracted layout (no network hit
    # needed: point base_url at a closed port)
    again = fetch_useb_data("eval", out_dir=str(tmp_path),
                            base_url="http://127.0.0.1:9")
    assert [os.path.basename(d) for d in again] == ["eval"]


def test_fetch_useb_data_validates_selector(tmp_path):
    from sgpt_tpu.baselines.openai_client import fetch_useb_data

    with pytest.raises(ValueError, match="which"):
        fetch_useb_data("dev", out_dir=str(tmp_path))


def test_zip_slip_rejected(server, tmp_path):
    from sgpt_tpu.baselines.openai_client import _http_download, _safe_extract

    zp = str(tmp_path / "evil.zip")
    _http_download(f"{server}/evil.zip", zp)
    with pytest.raises(RuntimeError, match="escapes"):
        _safe_extract(zp, str(tmp_path / "out"))
    assert not os.path.exists(tmp_path / "escape.txt")
