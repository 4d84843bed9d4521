"""Index persistence: save/load round-trips for DenseIndex and IVFIndex, and
the serving-layer /save + --index-path restart path.

The serving contract: a restarted server must answer identically to the one
that saved — same ids, bit-identical scores (int8 rows and scales round-trip
verbatim; bf16 upcasts to fp32 exactly).
"""
import numpy as np
import pytest

from sgpt_tpu.index import DenseIndex
from sgpt_tpu.index_ivf import IVFIndex


def _vectors(n, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, dim)).astype(np.float32)


@pytest.mark.parametrize("quantize", [None, "int8"])
def test_dense_roundtrip(tmp_path, quantize):
    emb = _vectors(300)
    idx = DenseIndex(32, quantize=quantize)
    idx.add(emb, ids=[f"d{i}" for i in range(300)])
    idx.build()
    idx.add(_vectors(5, seed=1), ids=[f"p{i}" for i in range(5)])  # pending
    path = str(tmp_path / "dense.npz")
    idx.save(path)

    back = DenseIndex.load(path)
    # load() rebuilds built+pending into one corpus (dense build is cheap —
    # unlike IVF load, which restores state precisely to skip re-clustering)
    assert len(back) == 305 and back.pending_docs == 0
    q = emb[:4]
    s1, i1 = idx.search_embeddings(q, k=7)
    s2, i2 = back.search_embeddings(q, k=7)
    assert i1 == i2
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("quantize", [None, "int8"])
def test_ivf_roundtrip_no_recluster(tmp_path, quantize):
    emb = _vectors(500, seed=2)
    idx = IVFIndex(32, n_clusters=8, nprobe=4, quantize=quantize, seed=2)
    idx.add(emb, ids=[f"d{i}" for i in range(500)])
    idx.build()
    idx.add(_vectors(3, seed=3), ids=["x0", "x1", "x2"])
    path = str(tmp_path / "ivf.npz")
    idx.save(path)

    back = IVFIndex.load(path)
    assert len(back) == 503 and back.pending_docs == 3
    # clustering state restored verbatim — load must NOT re-run k-means
    np.testing.assert_array_equal(np.asarray(idx._centroids),
                                  np.asarray(back._centroids))
    np.testing.assert_array_equal(np.asarray(idx._block_ids),
                                  np.asarray(back._block_ids))
    q = emb[:4]
    s1, i1 = idx.search_embeddings(q, k=7, nprobe=4)
    s2, i2 = back.search_embeddings(q, k=7, nprobe=4)
    assert i1 == i2
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)
    # pending docs searchable after load, and a rebuild merges them
    _, ids = back.search_embeddings(_vectors(3, seed=3)[:1], k=1)
    assert ids[0] == ["x0"]
    back.build()
    assert back.pending_docs == 0 and len(back) == 503


def test_kind_mismatch_raises(tmp_path):
    idx = DenseIndex(16)
    idx.add(_vectors(10, dim=16))
    idx.build()
    path = str(tmp_path / "dense.npz")
    idx.save(path)
    with pytest.raises(ValueError, match="dense"):
        IVFIndex.load(path)


def test_newline_ids_rejected(tmp_path):
    idx = DenseIndex(16)
    idx.add(_vectors(2, dim=16), ids=["ok", "bad\nid"])
    idx.build()
    with pytest.raises(ValueError, match="newline"):
        idx.save(str(tmp_path / "x.npz"))


def test_unbuilt_save_load(tmp_path):
    idx = DenseIndex(16)
    idx.add(_vectors(20, dim=16), ids=[f"d{i}" for i in range(20)])
    path = str(tmp_path / "unbuilt.npz")
    idx.save(path)
    back = DenseIndex.load(path)
    assert len(back) == 20 and not back.is_built
    back.build()
    _, ids = back.search_embeddings(_vectors(20, dim=16)[:1], k=1)
    assert ids[0] == ["d0"]


def test_service_save_and_restart(tmp_path):
    """Full serving cycle: index docs → /save → 'restart' via load_index →
    identical answers, retained documents included."""
    import jax

    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.models import init_params, tiny
    from sgpt_tpu.serving import SearchService
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    engine = EmbeddingEngine(params, cfg,
                             SimpleTokenizer(vocab_size=cfg.vocab_size),
                             batch_size=4, normalize_embeddings=True)
    svc = SearchService(engine, IVFIndex(cfg.hidden_size, n_clusters=2,
                                         nprobe=2), max_wait_ms=1.0)
    try:
        svc.add_documents(["alpha beta", "gamma delta", "epsilon zeta"],
                          ids=["a", "b", "c"], build=True)
        out = svc.save(str(tmp_path / "idx"))
        assert out["documents"] == 3 and out["texts"] == 3
        before = svc.search(["gamma delta"], k=2, return_documents=True)[0]
    finally:
        svc.close()

    index, documents = SearchService.load_index(str(tmp_path / "idx"))
    assert isinstance(index, IVFIndex) and documents["b"] == "gamma delta"
    svc2 = SearchService(engine, index, documents=documents, max_wait_ms=1.0)
    try:
        after = svc2.search(["gamma delta"], k=2, return_documents=True)[0]
        assert after == before
        assert after[0]["document"] == "gamma delta"
    finally:
        svc2.close()
