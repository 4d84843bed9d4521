"""DenseIndex: single-device and dp-sharded search must both be exact."""
import numpy as np
import pytest

import jax

from sgpt_tpu.index import DenseIndex
from sgpt_tpu.parallel import make_mesh


def _data(n=1000, d=32, q=7, seed=0):
    rng = np.random.default_rng(seed)
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    return corpus, queries


def _brute_cosine(queries, corpus, k):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    scores = qn @ cn.T
    return np.argsort(-scores, axis=1)[:, :k]


def test_single_device_exact():
    corpus, queries = _data()
    idx = DenseIndex(32, dtype=jax.numpy.float32)
    idx.add(corpus[:400], ids=[f"a{i}" for i in range(400)])
    idx.add(corpus[400:], ids=[f"b{i}" for i in range(600)])
    idx.build()
    assert len(idx) == 1000

    vals, ids = idx.search_embeddings(queries, k=13)
    want = _brute_cosine(queries, corpus, 13)
    all_ids = [f"a{i}" for i in range(400)] + [f"b{i}" for i in range(600)]
    for qi in range(len(queries)):
        assert set(ids[qi]) == {all_ids[j] for j in want[qi]}
        assert (np.diff(vals[qi]) <= 1e-6).all()  # sorted desc

    # empty query batches are valid no-ops (both (0, D) and 1-D [] shapes)
    assert idx.search_embeddings(np.zeros((0, 32), np.float32)) == ([], [])
    assert idx.search_embeddings([]) == ([], [])


def test_sharded_matches_single():
    corpus, queries = _data(n=777, d=16, q=5, seed=1)
    single = DenseIndex(16, dtype=jax.numpy.float32)
    single.add(corpus)
    single.build()
    v1, i1 = single.search_embeddings(queries, k=9)

    mesh = make_mesh(dp=8, tp=1)
    sharded = DenseIndex(16, mesh=mesh, dtype=jax.numpy.float32)
    sharded.add(corpus)
    sharded.build()
    v2, i2 = sharded.search_embeddings(queries, k=9)

    np.testing.assert_allclose(v2, v1, atol=1e-5)
    for a, b in zip(i1, i2):
        assert set(a) == set(b)


def test_sharded_multislab_matches_single():
    """Shard > slab budget: the per-shard search scans slab-by-slab instead of
    materializing (Q, shard) scores (the r1 index.py:141 limitation)."""
    corpus, queries = _data(n=2048, d=16, q=5, seed=7)
    single = DenseIndex(16, dtype=jax.numpy.float32)
    single.add(corpus)
    single.build()
    v1, i1 = single.search_embeddings(queries, k=9)

    mesh = make_mesh(dp=8, tp=1)
    # shard_n = 256, slab 128 -> 2 slabs per shard
    sharded = DenseIndex(16, mesh=mesh, dtype=jax.numpy.float32, slab_size=128)
    sharded.add(corpus)
    sharded.build()
    v2, i2 = sharded.search_embeddings(queries, k=9)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-5)
    for a, b in zip(i1, i2):
        assert set(a) == set(b)


def test_single_device_multislab_matches():
    corpus, queries = _data(n=1024, d=16, q=4, seed=8)
    a = DenseIndex(16, dtype=jax.numpy.float32)
    a.add(corpus)
    a.build()
    b = DenseIndex(16, dtype=jax.numpy.float32, slab_size=256)  # 4 slabs
    b.add(corpus)
    b.build()
    va, ia = a.search_embeddings(queries, k=7)
    vb, ib = b.search_embeddings(queries, k=7)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-5)
    assert ia == ib


def test_from_device_embeddings():
    import jax.numpy as jnp
    corpus, queries = _data(n=300, d=8, q=3, seed=3)
    idx = DenseIndex.from_device_embeddings(jnp.asarray(corpus))
    assert len(idx) == 300
    vals, ids = idx.search_embeddings(queries, k=4)
    want = np.argsort(-(queries @ corpus.T), axis=1)[:, :4]
    for qi in range(3):
        assert set(map(int, ids[qi])) == set(want[qi].tolist())

    mesh = make_mesh(dp=8, tp=1)
    idx_s = DenseIndex.from_device_embeddings(jnp.asarray(corpus), mesh=mesh)
    v2, i2 = idx_s.search_embeddings(queries, k=4)
    np.testing.assert_allclose(v2, vals, atol=1e-5)


def test_pallas_kernel_index_matches_blockmax():
    corpus, queries = _data(n=512, d=16, q=4, seed=4)
    a = DenseIndex(16, dtype=jax.numpy.float32, kernel="blockmax")
    a.add(corpus)
    a.build()
    b = DenseIndex(16, dtype=jax.numpy.float32, kernel="pallas")
    b.add(corpus)
    b.build()
    va, ia = a.search_embeddings(queries, k=8)
    vb, ib = b.search_embeddings(queries, k=8)
    np.testing.assert_allclose(vb, va, atol=1e-5)
    for x, y in zip(ia, ib):
        assert set(x) == set(y)


def test_index_corpus_glue():
    import jax as _jax
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.index import index_corpus
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo")
    engine = EmbeddingEngine(init_params(cfg, _jax.random.key(0)), cfg,
                             SimpleTokenizer(vocab_size=cfg.vocab_size),
                             batch_size=4)
    corpus = {f"d{i}": {"title": "", "text": f"unique document {i} words"}
              for i in range(10)}
    index = index_corpus(engine, corpus, batch_docs=4)
    assert len(index) == 10
    q = engine.encode(["unique document 3 words"], is_query=True)
    _, ids = index.search_embeddings(q, k=1)
    assert ids[0][0] == "d3"


def test_engine_warmup():
    import jax as _jax
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo")
    engine = EmbeddingEngine(init_params(cfg, _jax.random.key(0)), cfg,
                             SimpleTokenizer(vocab_size=cfg.vocab_size),
                             batch_size=2, max_seq_len=64)
    engine.warmup([16, 32])
    out = engine.encode(["warm path"])
    assert out.shape == (1, cfg.hidden_size)


def test_trainer_restore(tmp_path):
    import jax as _jax
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer
    from sgpt_tpu.training import ContrastiveTrainer, TrainConfig

    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=128)
    t1 = ContrastiveTrainer(init_params(cfg, _jax.random.key(0)), cfg,
                            SimpleTokenizer(vocab_size=128),
                            TrainConfig(output_dir=str(tmp_path)))
    t1.save_model(str(tmp_path / "saved"))

    t2 = ContrastiveTrainer(init_params(cfg, _jax.random.key(5)), cfg,
                            SimpleTokenizer(vocab_size=128),
                            TrainConfig())
    t2.restore(str(tmp_path / "saved"))
    a = np.asarray(t1.params["layers"]["attn"]["wq"])
    b = np.asarray(t2.params["layers"]["attn"]["wq"])
    np.testing.assert_array_equal(a, b)


def test_dot_mode_no_normalize():
    corpus, queries = _data(n=256, d=8, q=3, seed=2)
    idx = DenseIndex(8, normalize_embeddings=False, dtype=jax.numpy.float32)
    idx.add(corpus)
    idx.build()
    vals, ids = idx.search_embeddings(queries, k=5)
    want = np.argsort(-(queries @ corpus.T), axis=1)[:, :5]
    for qi in range(3):
        assert set(map(int, ids[qi])) == set(want[qi].tolist())


# ---------------------------------------------------------------- int8 corpus
def _recall(got_ids, want_rows, all_ids):
    hits = total = 0
    for qi, row in enumerate(want_rows):
        want = {all_ids[j] for j in row}
        hits += len(want & set(got_ids[qi]))
        total += len(want)
    return hits / total


def test_int8_corpus_recall_vs_bf16():
    """quantize='int8': half the corpus HBM; recall@10 vs exact fp32 >= 0.99
    on normalized embeddings (the 10M-docs-on-one-chip serving lever)."""
    corpus, queries = _data(n=4096, d=64, q=32, seed=11)
    want = _brute_cosine(queries, corpus, 10)

    idx = DenseIndex(64, quantize="int8")
    idx.add(corpus)
    idx.build()
    assert idx._corpus.dtype == jax.numpy.int8
    _, ids = idx.search_embeddings(queries, k=10)
    all_ids = [str(i) for i in range(4096)]
    assert _recall(ids, want, all_ids) >= 0.99


def test_int8_sharded_matches_int8_single():
    corpus, queries = _data(n=1024, d=32, q=6, seed=12)
    single = DenseIndex(32, quantize="int8")
    single.add(corpus)
    single.build()
    v1, i1 = single.search_embeddings(queries, k=9)

    mesh = make_mesh(dp=8, tp=1)
    sharded = DenseIndex(32, mesh=mesh, quantize="int8", slab_size=64)
    sharded.add(corpus)
    sharded.build()
    v2, i2 = sharded.search_embeddings(queries, k=9)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-5)
    for a, b in zip(i1, i2):
        assert set(a) == set(b)


def test_int8_rejects_pallas_kernel():
    with pytest.raises(ValueError, match="pallas"):
        DenseIndex(32, kernel="pallas", quantize="int8")


# ------------------------------------------------------------ incremental add
@pytest.mark.parametrize("quantize", [None, "int8"])
def test_incremental_add_search_add_search(quantize):
    """add() after build(): pending docs are searchable immediately (exact),
    and the next build() folds them into the static corpus (VERDICT r2 #8 -
    the old index raised RuntimeError here)."""
    corpus, queries = _data(n=600, d=32, q=5, seed=13)
    idx = DenseIndex(32, dtype=jax.numpy.float32, quantize=quantize)
    idx.add(corpus[:300], ids=[str(i) for i in range(300)])
    idx.build()

    # grow after build, search, grow again, search again
    idx.add(corpus[300:450], ids=[str(i) for i in range(300, 450)])
    assert len(idx) == 450
    _, ids1 = idx.search_embeddings(queries, k=10)
    want1 = _brute_cosine(queries, corpus[:450], 10)
    all_ids = [str(i) for i in range(600)]
    # int8 tol covers quantization near-ties at this tiny d=32 (the >=0.99
    # recall claim is tested at realistic width in test_int8_corpus_recall)
    tol = 1.0 if quantize is None else 0.94
    assert _recall(ids1, want1, all_ids) >= tol

    idx.add(corpus[450:], ids=[str(i) for i in range(450, 600)])
    assert len(idx) == 600
    _, ids2 = idx.search_embeddings(queries, k=10)
    want2 = _brute_cosine(queries, corpus, 10)
    assert _recall(ids2, want2, all_ids) >= tol

    # rebuild folds pending into the static corpus; results unchanged
    idx.build()
    assert idx._built_count == 600 and not idx._chunks
    _, ids3 = idx.search_embeddings(queries, k=10)
    assert [list(r) for r in ids3] == [list(r) for r in ids2]


def test_incremental_add_sharded():
    corpus, queries = _data(n=512, d=16, q=4, seed=14)
    mesh = make_mesh(dp=8, tp=1)
    idx = DenseIndex(16, mesh=mesh, dtype=jax.numpy.float32)
    idx.add(corpus[:256])
    idx.build()
    idx.add(corpus[256:], ids=[str(i) for i in range(256, 512)])
    _, ids = idx.search_embeddings(queries, k=8)
    want = _brute_cosine(queries, corpus, 8)
    all_ids = [str(i) for i in range(512)]
    assert _recall(ids, want, all_ids) == 1.0
    # rebuild on the mesh merges and re-shards
    idx.build()
    assert idx._built_count == 512
    _, ids2 = idx.search_embeddings(queries, k=8)
    assert [list(r) for r in ids2] == [list(r) for r in ids]


# -- deletion (tombstone row mask; compaction at build/save) -----------------
@pytest.mark.parametrize("quantize,mesh_shape", [
    (None, None), ("int8", None), (None, 8), ("int8", 4)])
def test_delete_tombstones_then_compact(quantize, mesh_shape):
    """delete() makes docs unsearchable immediately (exact over live docs);
    build() compacts them away with identical results."""
    corpus, queries = _data(n=500, d=24, q=4, seed=21)
    mesh = make_mesh(dp=mesh_shape) if mesh_shape else None
    idx = DenseIndex(24, quantize=quantize, mesh=mesh,
                     dtype=jax.numpy.float32 if quantize is None
                     else jax.numpy.bfloat16)
    ids_all = [f"d{i}" for i in range(500)]
    idx.add(corpus, ids=ids_all)
    idx.build()
    _, i0 = idx.search_embeddings(queries, k=3)
    dele = list({i0[0][0], "d7", "d499"})
    assert idx.delete(dele) == len(dele)
    assert len(idx) == 500 - len(dele) and idx.live_count == len(idx)

    _, i1 = idx.search_embeddings(queries, k=5)
    assert not ({x for r in i1 for x in r} & set(dele))
    if quantize is None:
        live = [i for i in range(500) if f"d{i}" not in dele]
        want = _brute_cosine(queries, corpus[live], 5)
        for got, w in zip(i1, want):
            assert set(got) == {f"d{live[j]}" for j in w}

    # pending adds + pending deletes coexist with built tombstones
    more, _ = _data(n=20, d=24, q=1, seed=22)
    idx.add(more, ids=[f"p{i}" for i in range(20)])
    idx.delete(["p0", "p19", "d100"])
    assert idx.pending_docs == 18
    _, i2 = idx.search_embeddings(queries, k=8)
    assert not ({x for r in i2 for x in r} & {"p0", "p19", "d100", *dele})

    idx.build()  # compaction: same results, no tombstones left
    assert idx._deleted == set() and len(idx) == 520 - len(dele) - 3
    _, i3 = idx.search_embeddings(queries, k=8)
    assert [list(r) for r in i3] == [list(r) for r in i2]

    with pytest.raises(KeyError):
        idx.delete(["not-there"])
    with pytest.raises(KeyError):   # double delete
        idx.delete([f"p1"]) and idx.delete(["p1"])


def test_delete_persistence_compacts(tmp_path):
    corpus, queries = _data(n=100, d=16, q=3, seed=23)
    for quantize in (None, "int8"):
        idx = DenseIndex(16, quantize=quantize)
        idx.add(corpus, ids=[f"d{i}" for i in range(100)])
        idx.build()
        idx.delete(["d5", "d50"])
        path = str(tmp_path / f"del_{quantize}.npz")
        idx.save(path)
        back = DenseIndex.load(path)
        assert len(back) == 98 and "d5" not in back._ids
        _, ia = idx.search_embeddings(queries, k=4)
        _, ib = back.search_embeddings(queries, k=4)
        assert [list(r) for r in ia] == [list(r) for r in ib]


def test_delete_all_returns_empty():
    corpus, queries = _data(n=64, d=16, q=2, seed=24)
    idx = DenseIndex(16)
    idx.add(corpus[:4], ids=["a", "b", "c", "d"])
    idx.build()
    idx.delete(["a", "b", "c", "d"])
    assert len(idx) == 0
    vals, ids = idx.search_embeddings(queries, k=3)
    assert ids == [[], []] and all(v.size == 0 for v in vals)


def test_delete_rejects_pallas_kernel():
    idx = DenseIndex(16, kernel="pallas")
    idx.add(np.ones((4, 16), np.float32), ids=list("abcd"))
    with pytest.raises(ValueError, match="blockmax"):
        idx.delete(["a"])
