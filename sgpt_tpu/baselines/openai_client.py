"""Concrete OpenAI-compatible embeddings client + dataset fetch helper.

The reference ships a working API call path
(biencoder/beir/beir_openai_embeddings_batched_parallel.py:193-266: engine
pairs like text-search-{ada,babbage,curie}-{query,doc}-001, batched POSTs,
retry) and USEB's `downloading.py`. This module is the repo's concrete
equivalent, kept OFF by default for zero-egress environments:

  * `OpenAIEmbedClient` — stdlib-urllib client for any /v1/embeddings-shaped
    endpoint (OpenAI or compatible). No `openai` package dependency. It IS the
    `embed_fn` `baselines.OpenAIRetriever` takes, so the whole reference
    pipeline (batching, thread fan-out, retry, per-chunk caching) applies.
  * `fetch_beir_dataset` — download+unzip a BEIR dataset (the reference leans
    on beir.util.download_and_unzip / USEB downloading.py).

Neither function touches the network at import time; both raise clearly when
no credentials/connectivity exist. Tests drive them against a local fake HTTP
server (tests/test_openai_client.py).
"""
from __future__ import annotations

import json
import logging
import os
import urllib.request
import zipfile
from typing import List, Optional, Sequence

logger = logging.getLogger(__name__)

DEFAULT_BASE_URL = "https://api.openai.com/v1"


class OpenAIEmbedClient:
    """Callable (texts, is_query) -> list of embedding vectors.

    Mirrors the reference's query/doc engine split (call_gpt_api selects the
    -query vs -doc engine per input kind, beir_openai_*.py:193-266): pass
    `query_model` / `doc_model` to use asymmetric search engines, or just
    `model` for a symmetric one.
    """

    def __init__(self, *, api_key: Optional[str] = None,
                 base_url: str = DEFAULT_BASE_URL,
                 model: str = "text-embedding-3-small",
                 query_model: Optional[str] = None,
                 doc_model: Optional[str] = None,
                 timeout: float = 60.0):
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY")
        if not self.api_key:
            raise ValueError(
                "no API key: pass api_key= or set OPENAI_API_KEY. (This "
                "adapter is default-off so the framework stays zero-egress; "
                "inject a fake embed_fn into OpenAIRetriever for offline use.)")
        self.base_url = base_url.rstrip("/")
        self.query_model = query_model or model
        self.doc_model = doc_model or model
        self.timeout = timeout

    def __call__(self, texts: Sequence[str], is_query: bool) -> List[List[float]]:
        payload = json.dumps({
            "model": self.query_model if is_query else self.doc_model,
            "input": list(texts),
        }).encode()
        req = urllib.request.Request(
            self.base_url + "/embeddings", data=payload,
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {self.api_key}"})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            body = json.loads(resp.read())
        # response rows carry an index; order by it (the API may reorder)
        data = sorted(body["data"], key=lambda d: d["index"])
        if len(data) != len(texts):
            raise RuntimeError(
                f"embeddings API returned {len(data)} rows for {len(texts)} "
                "inputs")
        return [d["embedding"] for d in data]


BEIR_DATASET_URL = ("https://public.ukp.informatik.tu-darmstadt.de/thakur/"
                    "BEIR/datasets")


def fetch_beir_dataset(name: str, out_dir: str = "./datasets",
                       base_url: str = BEIR_DATASET_URL) -> str:
    """Download and unzip a BEIR dataset; returns the dataset directory.

    The reference calls beir.util.download_and_unzip with the same bucket
    (beir_dense_retriever.py GenericDataLoader expects the unzipped layout).
    Skips the download if the dataset directory already exists."""
    target = os.path.join(out_dir, name)
    if os.path.isdir(target):
        logger.info("dataset %s already present at %s", name, target)
        return target
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, f"{name}.zip")
    url = f"{base_url}/{name}.zip"
    logger.info("downloading %s -> %s", url, zip_path)
    try:
        with urllib.request.urlopen(url, timeout=120.0) as resp, \
                open(zip_path, "wb") as f:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
    except Exception as e:
        raise RuntimeError(
            f"could not fetch {url!r} ({e!r}) - on a zero-egress box, place "
            f"the unzipped dataset at {target} yourself") from e
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(out_dir)
    os.remove(zip_path)
    if not os.path.isdir(target):
        raise RuntimeError(f"archive did not contain {name}/ (got {out_dir})")
    return target
