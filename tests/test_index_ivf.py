"""Balanced IVF approximate index: recall, exactness limits, serving contract.

Recall is measured against a numpy exact-scan oracle. The data is a gaussian
mixture (clusterable — IVF's operating assumption); the exactness tests use
nprobe=K where IVF must reproduce the exact top-k regardless of clustering
quality.
"""
import numpy as np
import pytest

from sgpt_tpu.index import DenseIndex
from sgpt_tpu.index_ivf import IVFIndex


def _mixture(n, dim=32, centers=16, seed=0, spread=0.25):
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal((centers, dim))
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    assign = rng.integers(0, centers, n)
    x = mu[assign] + spread * rng.standard_normal((n, dim))
    return x.astype(np.float32), rng


def _exact_topk(emb, q, k):
    """Oracle: normalized exact cosine top-k (set of row indices per query)."""
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    s = qn @ e.T
    return [set(np.argsort(-row)[:k]) for row in s]


def _recall(ids_lists, oracle_sets, k):
    hit = sum(len({int(i) for i in ids} & o) for ids, o in
              zip(ids_lists, oracle_sets))
    return hit / (len(oracle_sets) * k)


@pytest.fixture(scope="module")
def mixture_index():
    emb, rng = _mixture(4000)
    idx = IVFIndex(32, n_clusters=32, nprobe=4, seed=0)
    idx.add(emb)
    idx.build()
    q = emb[rng.integers(0, 4000, 24)] + 0.05 * rng.standard_normal((24, 32))
    return idx, emb, q.astype(np.float32)


def test_recall_on_clusterable_data(mixture_index):
    idx, emb, q = mixture_index
    oracle = _exact_topk(emb, q, 10)
    scores, ids = idx.search_embeddings(q, k=10, nprobe=4)
    assert _recall(ids, oracle, 10) >= 0.9       # 4/32 clusters probed
    scores, ids = idx.search_embeddings(q, k=10, nprobe=16)
    assert _recall(ids, oracle, 10) >= 0.99
    for row in scores:                            # descending, finite
        assert list(row) == sorted(row, reverse=True)
        assert np.isfinite(row).all()


def test_nprobe_all_is_exact(mixture_index):
    """Probing every cluster must reproduce the exact top-k: balanced layout
    + overflow slab never drop a document."""
    idx, emb, q = mixture_index
    oracle = _exact_topk(emb, q, 10)
    _, ids = idx.search_embeddings(q, k=10, nprobe=32)
    assert _recall(ids, oracle, 10) >= 0.999

    dense = DenseIndex(32, normalize_embeddings=True, dtype=np.float32)
    dense.add(emb)
    dense.build()
    d_scores, d_ids = dense.search_embeddings(q, k=10)
    i_scores, i_ids = idx.search_embeddings(q, k=10, nprobe=32)
    for a, b in zip(d_scores, i_scores):
        np.testing.assert_allclose(a, b, atol=2e-2)  # bf16 block storage


def test_overflow_spill_preserves_membership():
    """pad_factor < 1 forces heavy spill; nprobe=K search stays exact because
    spilled docs live in the always-scanned overflow slab."""
    emb, rng = _mixture(1000, seed=1)
    idx = IVFIndex(32, n_clusters=8, pad_factor=0.5, seed=1)
    idx.add(emb)
    idx.build()
    assert idx._overflow_count > 0               # the spill actually happened
    q = emb[:8]
    oracle = _exact_topk(emb, q, 5)
    _, ids = idx.search_embeddings(q, k=5, nprobe=8)
    assert _recall(ids, oracle, 5) >= 0.999


def test_int8_blocks_close_to_float():
    emb, rng = _mixture(2000, seed=2)
    q = emb[rng.integers(0, 2000, 16)].astype(np.float32)
    oracle = _exact_topk(emb, q, 10)
    idx = IVFIndex(32, n_clusters=16, quantize="int8", seed=2)
    idx.add(emb)
    idx.build()
    _, ids = idx.search_embeddings(q, k=10, nprobe=16)
    # dim=32 is the WORST case for per-row int8 (relative error ~ 1/(127·√D));
    # at embedding dims (768+) DenseIndex's int8 recall tests hold >= 0.99
    assert _recall(ids, oracle, 10) >= 0.95


def test_pending_add_then_rebuild():
    emb, rng = _mixture(1000, seed=3)
    idx = IVFIndex(32, n_clusters=8, nprobe=8, seed=3)
    idx.add(emb, ids=[f"d{i}" for i in range(1000)])
    idx.build()
    new = rng.standard_normal((5, 32)).astype(np.float32) + 3.0
    idx.add(new, ids=[f"new{i}" for i in range(5)])
    assert idx.pending_docs == 5 and len(idx) == 1005
    # pending docs findable before rebuild (exact pending scan)
    _, ids = idx.search_embeddings(new[:2], k=1)
    assert ids[0] == ["new0"] and ids[1] == ["new1"]
    idx.build()                                   # merge-recluster
    assert idx.pending_docs == 0 and len(idx) == 1005
    _, ids = idx.search_embeddings(new[:2], k=1)
    assert ids[0] == ["new0"] and ids[1] == ["new1"]
    # old docs still intact after the merge rebuild
    _, ids = idx.search_embeddings(emb[:3], k=1)
    assert [r[0] for r in ids] == ["d0", "d1", "d2"]


def test_ragged_and_edge_contracts():
    emb, _ = _mixture(100, seed=4)
    idx = IVFIndex(32, n_clusters=4, seed=4)
    idx.add(emb)
    with pytest.raises(RuntimeError, match="build"):
        idx.search_embeddings(emb[:1], k=5)
    idx.build()
    scores, ids = idx.search_embeddings(emb[:2], k=1000)  # k > N
    assert len(ids[0]) <= 100 and len(scores[0]) == len(ids[0])
    with pytest.raises(RuntimeError, match="empty"):
        IVFIndex(32).build()
    bad = IVFIndex(32)
    with pytest.raises(ValueError, match="expected"):
        bad.add(np.zeros((3, 7)))
    # empty query batches are valid no-ops (both the (0, D) and the 1-D
    # np.asarray([]) shape a caller passing [] produces)
    assert idx.search_embeddings(np.zeros((0, 32), np.float32)) == ([], [])
    assert idx.search_embeddings([]) == ([], [])


def test_search_is_deterministic(mixture_index):
    idx, _, q = mixture_index
    s1, i1 = idx.search_embeddings(q, k=10)
    s2, i2 = idx.search_embeddings(q, k=10)
    assert i1 == i2
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)


def test_serving_service_accepts_ivf():
    """SearchService duck-types over either index (serving.py)."""
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
    svc = SearchService(engine,
                        IVFIndex(cfg.hidden_size, n_clusters=2, nprobe=2),
                        max_wait_ms=1.0)
    try:
        svc.add_documents(["alpha beta", "gamma delta", "epsilon zeta"],
                          ids=["a", "b", "c"], build=True)
        hits = svc.search(["gamma delta"], k=2)[0]
        assert hits[0]["id"] == "b"
        assert svc.stats()["documents"] == 3
    finally:
        svc.close()


def test_sampled_training_path():
    """max_train_rows < n: k-means trains on a subsample, assignment streams
    in bounded chunks — recall must hold on clusterable data."""
    emb, rng = _mixture(3000, seed=5)
    idx = IVFIndex(32, n_clusters=16, nprobe=16, seed=5,
                   max_train_rows=512, assign_chunk=700, train_slab=256)
    idx.add(emb)
    idx.build()
    q = emb[rng.integers(0, 3000, 16)].astype(np.float32)
    oracle = _exact_topk(emb, q, 10)
    _, ids = idx.search_embeddings(q, k=10, nprobe=16)
    assert _recall(ids, oracle, 10) >= 0.99      # nprobe=K: exact


def test_int8_rows_survive_rebuild_verbatim():
    """Merge rebuilds must not re-quantize: scores for the original docs are
    IDENTICAL before and after an add+build cycle."""
    emb, rng = _mixture(500, seed=6)
    q = emb[:4].astype(np.float32)
    idx = IVFIndex(32, n_clusters=8, nprobe=8, quantize="int8", seed=6)
    idx.add(emb, ids=[f"d{i}" for i in range(500)])
    idx.build()
    before_scores, before_ids = idx.search_embeddings(q, k=5, nprobe=8)
    idx.add(rng.standard_normal((7, 32)).astype(np.float32) + 5.0,
            ids=[f"n{i}" for i in range(7)])
    idx.build()
    after_scores, after_ids = idx.search_embeddings(q, k=5, nprobe=8)
    assert before_ids == after_ids
    for a, b in zip(before_scores, after_scores):
        np.testing.assert_array_equal(a, b)


# -- deletion -----------------------------------------------------------------
@pytest.mark.parametrize("quantize", [None, "int8"])
def test_delete_blocks_overflow_pending(quantize):
    """delete() hides docs immediately whether they live in a cluster block,
    the overflow slab, or the pending slab; build() compacts; persistence
    round-trips tombstones."""
    import jax.numpy as jnp

    emb, rng = _mixture(600, dim=24, centers=6, seed=11)
    dt = jnp.float32 if quantize is None else jnp.bfloat16
    idx = IVFIndex(24, n_clusters=6, nprobe=6, quantize=quantize,
                   pad_factor=1.0, dtype=dt, seed=11)
    idx.add(emb, ids=[f"d{i}" for i in range(600)])
    idx.build()
    assert idx._overflow_count > 0  # pad_factor=1.0 forces spill

    q = emb[:5] + 0.01 * rng.standard_normal((5, 24)).astype(np.float32)
    _, i0 = idx.search_embeddings(q, k=3)
    ov_pos = int(idx._overflow_ids[0])          # an overflow member
    dele = list({i0[0][0], i0[1][0], f"d{ov_pos}", "d599"})
    assert idx.delete(dele) == len(dele)
    assert len(idx) == 600 - len(dele)

    _, i1 = idx.search_embeddings(q, k=6)
    assert not ({x for r in i1 for x in r} & set(dele))
    if quantize is None:  # nprobe=K -> exact over live docs (fp32 blocks)
        e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        qn = np.asarray(q) / np.linalg.norm(q, axis=1, keepdims=True)
        s = qn @ e.T
        for di in dele:
            s[:, int(di[1:])] = -np.inf
        want = [{f"d{j}" for j in np.argsort(-r)[:6]} for r in s]
        assert [set(r) for r in i1] == want

    # pending adds + pending deletes
    more, _ = _mixture(30, dim=24, centers=6, seed=12)
    idx.add(more, ids=[f"p{i}" for i in range(30)])
    idx.delete(["p0", "p29"])
    assert idx.pending_docs == 28
    _, i2 = idx.search_embeddings(q, k=8)
    assert not ({x for r in i2 for x in r} & {"p0", "p29", *dele})

    idx.build()  # re-cluster without tombstones
    assert idx._deleted == set() and len(idx) == 630 - len(dele) - 2
    _, i3 = idx.search_embeddings(q, k=8)
    assert not ({x for r in i3 for x in r} & {"p0", "p29", *dele})

    with pytest.raises(KeyError):
        idx.delete(["missing-id"])


def test_delete_persists_as_tombstones(tmp_path):
    emb, rng = _mixture(300, dim=16, centers=4, seed=13)
    q = emb[:3]
    idx = IVFIndex(16, n_clusters=4, nprobe=4, seed=13)
    idx.add(emb, ids=[f"d{i}" for i in range(300)])
    idx.build()
    idx.delete(["d0", "d7", "d299"])
    path = str(tmp_path / "ivf_del.npz")
    idx.save(path)
    back = IVFIndex.load(path)
    assert len(back) == 297
    _, ia = idx.search_embeddings(q, k=5)
    _, ib = back.search_embeddings(q, k=5)
    assert [list(r) for r in ia] == [list(r) for r in ib]
    with pytest.raises(KeyError):   # tombstone state survived the round-trip
        back.delete(["d7"])
    back.build()                    # load -> compact works
    assert back._deleted == set() and len(back) == 297


def test_delete_everything_reverts_to_empty():
    emb, _ = _mixture(40, dim=16, centers=2, seed=14)
    idx = IVFIndex(16, n_clusters=2, seed=14)
    idx.add(emb[:4], ids=list("abcd"))
    idx.build()
    idx.delete(list("abcd"))
    assert len(idx) == 0
    vals, ids = idx.search_embeddings(emb[:2], k=3)
    assert ids == [[], []]
    idx.build()                     # compacting an all-deleted index
    assert not idx.is_built and len(idx) == 0
    idx.add(emb[4:8], ids=list("efgh"))   # and it accepts new docs again
    idx.build()
    _, ids = idx.search_embeddings(emb[4:5], k=1)
    assert ids[0] == ["e"]


# -- mesh-sharded IVF ----------------------------------------------------------
@pytest.mark.parametrize("quantize,dp", [(None, 4), (None, 8), ("int8", 4)])
def test_sharded_ivf_recall_delete_persist(quantize, dp):
    """IVFIndex(mesh=): cluster blocks shard over dp, every shard probes its
    local centroids, candidates merge over the mesh. nprobe=K is exact over
    live docs; deletion, pending adds, and mesh-shape-agnostic persistence
    all behave as on one device."""
    import jax.numpy as jnp

    from sgpt_tpu.parallel import make_mesh

    emb, rng = _mixture(3000, dim=32, centers=16, seed=31)
    q = (emb[rng.integers(0, 3000, 12)]
         + 0.05 * rng.standard_normal((12, 32))).astype(np.float32)
    dt = jnp.float32 if quantize is None else jnp.bfloat16
    idx = IVFIndex(32, n_clusters=12, nprobe=12, quantize=quantize,
                   mesh=make_mesh(dp=dp), dtype=dt, pad_factor=1.0, seed=31)
    idx.add(emb, ids=[f"d{i}" for i in range(3000)])
    idx.build()
    assert idx._overflow_count > 0          # pad_factor=1.0 forces spill

    oracle = _exact_topk(emb, q, 10)
    _, ids = idx.search_embeddings(q, k=10, nprobe=12)   # nprobe = K
    rec = sum(len({int(i[1:]) for i in r} & o)
              for r, o in zip(ids, oracle)) / (12 * 10)
    assert rec >= (0.999 if quantize is None else 0.95), rec

    victim = ids[0][0]
    ovv = f"d{int(idx._overflow_ids[0])}"
    dele = list({victim, ovv, "d2999"})
    idx.delete(dele)
    _, ids2 = idx.search_embeddings(q, k=10, nprobe=12)
    assert not ({x for r in ids2 for x in r} & set(dele))

    # pending adds searchable before rebuild (fresh vectors, not corpus
    # duplicates — a duplicate ties with its original and loses the order)
    fresh = rng.standard_normal((5, 32)).astype(np.float32) + 3.0
    idx.add(fresh, ids=[f"c{i}" for i in range(5)])
    _, ids3 = idx.search_embeddings(fresh[:2], k=1)
    assert ids3[0] == ["c0"] and ids3[1] == ["c1"]

    # nprobe < K on the mesh: probes distribute as per-shard local top lists
    # (documented — not the identical global top-nprobe set); recall on
    # clusterable data must still hold
    oracle5 = _exact_topk(emb, q, 5)
    _, ids_lo = idx.search_embeddings(q, k=5, nprobe=6)
    rec_lo = sum(len({int(i[1:]) for i in r if i[0] == "d"} & o)
                 for r, o in zip(ids_lo, oracle5)) / (12 * 5)
    assert rec_lo >= 0.8, rec_lo

    # persistence is mesh-shape agnostic: reload on dp=2 AND single-device
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/sivf.npz"
        idx.save(path)
        back2 = IVFIndex.load(path, mesh=make_mesh(dp=2))
        _, ids4 = back2.search_embeddings(q, k=10, nprobe=12)
        assert not ({x for r in ids4 for x in r} & set(dele))
        single = IVFIndex.load(path)
        _, ids5 = single.search_embeddings(q, k=10, nprobe=12)
        assert [set(r) for r in ids5] == [set(r) for r in ids4]


def test_sharded_probe_cache_invalidates_on_rebuild():
    """Rebuilds that change the live cluster count (K grows with the corpus)
    must not reuse compiled probe closures that baked the old k_real/k_local
    in — the stale mask silently dropped clusters (review repro: 114/500
    self-retrieval misses) or crashed on a k_local change."""
    from sgpt_tpu.parallel import make_mesh

    rng = np.random.default_rng(41)
    mesh = make_mesh(dp=4)
    idx = IVFIndex(32, n_clusters=16, nprobe=16, mesh=mesh, seed=41)
    first = rng.standard_normal((5, 32)).astype(np.float32)
    idx.add(first, ids=[f"a{i}" for i in range(5)])
    idx.build()                                   # K = min(16, 5) = 5
    idx.search_embeddings(first[:2], k=3)         # caches a probe fn
    more = rng.standard_normal((495, 32)).astype(np.float32)
    idx.add(more, ids=[f"b{i}" for i in range(495)])
    idx.build()                                   # K = 16, k_local changes
    emb = np.concatenate([first, more])
    all_ids = [f"a{i}" for i in range(5)] + [f"b{i}" for i in range(495)]
    picks = rng.integers(0, 500, 64)
    q = emb[picks].astype(np.float32)
    _, ids = idx.search_embeddings(q, k=3, nprobe=16)   # nprobe=K: exact
    # every query IS a corpus row: nprobe=K must retrieve it (the stale
    # cached closure masked clusters >= old k_real and missed 114/500)
    misses = [all_ids[j] for j, r in zip(picks, ids) if all_ids[j] not in r]
    assert not misses, misses[:10]


def test_serving_service_accepts_sharded_ivf():
    """The full serve facade works over a mesh-sharded IVF index."""
    import jax

    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.models import init_params, tiny
    from sgpt_tpu.parallel import make_mesh
    from sgpt_tpu.serving import SearchService
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo")
    engine = EmbeddingEngine(init_params(cfg, jax.random.key(0)), cfg,
                             SimpleTokenizer(vocab_size=cfg.vocab_size),
                             batch_size=4, normalize_embeddings=True)
    svc = SearchService(engine,
                        IVFIndex(cfg.hidden_size, n_clusters=4, nprobe=4,
                                 mesh=make_mesh(dp=4)),
                        max_wait_ms=1.0)
    try:
        svc.add_documents([f"document number {i} about topic {i % 3}"
                           for i in range(12)],
                          ids=[f"d{i}" for i in range(12)], build=True)
        hits = svc.search(["document number 7 about topic 1"], k=2)[0]
        assert hits[0]["id"] == "d7"
        svc.delete_documents(["d7"])
        hits = svc.search(["document number 7 about topic 1"], k=2)[0]
        assert "d7" not in [h["id"] for h in hits]
    finally:
        svc.close()


# ---------------------------------------------------------------------------
# round-5: auto-K selection (the overflow-knee sweep)
# ---------------------------------------------------------------------------

def test_auto_k_lands_near_natural_cluster_count():
    """A corpus with 16 tight natural clusters: the sweep must reject the
    over-fragmented candidates (the measured 10M footgun where K >> topics
    pushed 38% of the corpus into the exact-scanned overflow slab) and land
    at a K whose realized overflow stays under the target."""
    emb, rng = _mixture(8192, dim=32, centers=16, spread=0.1)
    idx = IVFIndex(32, n_clusters="auto", nprobe=8, seed=0,
                   max_train_rows=8192)
    idx.add(emb)
    idx.build()
    assert idx.selected_k is not None
    # candidates were 8..min(8192//64=128, 8192//8=1024) = 128; the realized
    # overflow at the selection must be under the 10% target
    assert 8 <= idx.selected_k <= 128
    ovf_frac = idx._overflow_count / 8192
    assert ovf_frac <= idx.auto_overflow_target + 0.02
    # and the index actually searches well
    q = emb[rng.integers(0, 8192, 16)].astype(np.float32)
    oracle = _exact_topk(emb, q, 10)
    _, ids = idx.search_embeddings(q, k=10, nprobe=8)
    assert _recall(ids, oracle, 10) >= 0.85


def test_auto_k_beats_oversized_k_on_overflow():
    """Same corpus, deliberately oversized manual K: overflow must exceed
    what auto-K realizes — the regression the sweep exists to prevent."""
    emb, _ = _mixture(4096, dim=32, centers=8, spread=0.05)
    auto = IVFIndex(32, n_clusters="auto", max_train_rows=4096, seed=0)
    auto.add(emb)
    auto.build()
    big = IVFIndex(32, n_clusters=512, max_train_rows=4096, seed=0)
    big.add(emb)
    big.build()
    assert auto._overflow_count / 4096 <= auto.auto_overflow_target + 0.02
    assert big._overflow_count > auto._overflow_count
    # probe bytes per query scale with C_pad at fixed nprobe: the auto index
    # must not pay the degenerate big-K layout's overflow exact scan
    assert auto.selected_k < 512


def test_overflow_estimator_golden():
    """_estimate_overflow uses the REAL C_pad formula and is invariant to
    the sample-to-corpus scale factor."""
    idx = IVFIndex(16, n_clusters=4, pad_factor=1.0)
    # n=800, K=4 -> c_pad = round_up(1.0 * 200, 8) = 200
    counts = np.array([400, 200, 100, 100])
    assert idx._estimate_overflow(counts, 800, 800, 4) == pytest.approx(0.25)
    # same distribution observed on a half-size sample: identical estimate
    assert idx._estimate_overflow(counts // 2, 400, 800, 4) == \
        pytest.approx(0.25)
    # balanced counts under c_pad: zero overflow
    assert idx._estimate_overflow(np.full(4, 200), 800, 800, 4) == 0.0


def test_auto_k_roundtrips_through_save_load(tmp_path):
    emb, _ = _mixture(2048, dim=16, centers=8, spread=0.1, seed=5)
    idx = IVFIndex(16, n_clusters="auto", max_train_rows=2048, seed=0)
    idx.add(emb)
    idx.build()
    p = str(tmp_path / "auto_ivf.npz")
    idx.save(p)
    re = IVFIndex.load(p)
    assert re.n_clusters == "auto"
    assert re.selected_k == idx.selected_k
    q = emb[:4]
    s1, i1 = idx.search_embeddings(q, k=5)
    s2, i2 = re.search_embeddings(q, k=5)
    assert i1 == i2
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_loud_overflow_warning_on_oversized_k(caplog):
    import logging
    emb, _ = _mixture(2048, dim=16, centers=4, spread=0.03, seed=7)
    idx = IVFIndex(16, n_clusters=256, max_train_rows=2048, seed=0)
    idx.add(emb)
    with caplog.at_level(logging.WARNING, logger="sgpt_tpu.index_ivf"):
        idx.build()
    if idx._overflow_count / 2048 > idx.auto_overflow_target:
        assert any("IVF overflow" in r.message for r in caplog.records)


def test_auto_k_rejects_bad_values():
    with pytest.raises(ValueError):
        IVFIndex(16, n_clusters="lots")
    with pytest.raises(ValueError):
        IVFIndex(16, n_clusters=0)
