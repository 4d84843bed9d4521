"""Regressions for the round-2 path-review findings (encoder/index/trainer)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.encoder import EmbeddingEngine
from sgpt_tpu.index import DenseIndex
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.tokenization import SimpleTokenizer


@pytest.fixture(scope="module")
def small():
    cfg = tiny("neo")
    return cfg, init_params(cfg, jax.random.key(0)), \
        SimpleTokenizer(vocab_size=cfg.vocab_size)


def test_cache_key_distinguishes_heads_and_learned_weights(tmp_path, small):
    """Two engines sharing a decoder but differing in dense heads or learnt
    pooling weights must not collide in the embedding cache (the old key
    hashed only decoder params → engine B silently served A's vectors)."""
    cfg, params, tok = small
    D = cfg.hidden_size
    base = EmbeddingEngine(params, cfg, tok, cache_dir=str(tmp_path),
                           batch_size=2, max_seq_len=16)
    with_head = EmbeddingEngine(
        params, cfg, tok, cache_dir=str(tmp_path), batch_size=2,
        max_seq_len=16,
        dense_heads=[{"w": np.ones((D, 4), np.float32),
                      "location": "post_pool"}])
    with_lw = EmbeddingEngine(
        params, cfg, tok, cache_dir=str(tmp_path), batch_size=2,
        max_seq_len=16, learned_weights=jnp.full((16,), 2.0, jnp.float32))
    texts = ["hello world"]
    keys = {e._cache_key(texts, False) for e in (base, with_head, with_lw)}
    assert len(keys) == 3

    # end to end: the head engine must get 4-wide vectors, not base's cached
    base.encode(texts)
    emb = with_head.encode(texts)
    assert emb.shape == (1, 4)


def test_out_dim_follows_application_order(small):
    """A pre_pool head listed AFTER a post_pool head must not win out_dim:
    application order is pre → pool → post."""
    cfg, params, tok = small
    D = cfg.hidden_size
    eng = EmbeddingEngine(
        params, cfg, tok, batch_size=2, max_seq_len=16,
        dense_heads=[{"w": np.ones((D, 4), np.float32), "location": "post_pool"},
                     {"w": np.ones((D, D), np.float32), "location": "pre_pool"}])
    assert eng.out_dim == 4
    emb = eng.encode(["a", "b"])
    assert emb.shape == (2, 4)


def test_index_search_before_build_raises():
    idx = DenseIndex(8, dtype=jnp.float32)
    idx.add(np.random.default_rng(0).normal(size=(5, 8)).astype(np.float32))
    with pytest.raises(RuntimeError, match="before build"):
        idx.search_embeddings(np.zeros((1, 8), np.float32), k=2)


def test_padded_size_bounded():
    """Padding must stay ~k·block·n_dev rows, not up to a whole slab per
    device (the old scheme nearly doubled corpus HBM for n just past one
    slab per shard)."""
    idx = DenseIndex(8, block_size=128, slab_size=1 << 20)
    n = (1 << 20) + 1                    # one doc past the slab budget
    n_pad = idx._padded_size(n, 1)
    assert n_pad - n < 4 * 128           # a few blocks, not ~1M rows
    assert n_pad % idx._slab_eff == 0
    assert idx._slab_eff <= idx.slab_size
    assert idx._slab_eff % idx.block_size == 0
    # sharded variant
    n_pad8 = idx._padded_size(9_000_000, 8)
    shard = n_pad8 // 8
    assert shard % idx._slab_eff == 0
    assert n_pad8 - 9_000_000 < 8 * 16 * 128


def test_trainer_restore_keeps_mesh_sharding(tmp_path):
    from sgpt_tpu.parallel import make_mesh
    from sgpt_tpu.training import ContrastiveTrainer, TrainConfig

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(dp=2, tp=2)
    cfg = tiny("neo", num_layers=2, hidden_size=64, num_heads=4, vocab_size=256)
    tok = SimpleTokenizer(vocab_size=256)
    tr = ContrastiveTrainer(init_params(cfg, jax.random.key(0)), cfg, tok,
                            TrainConfig(batch_size=4, max_seq_len=16, lr=1e-3,
                                        output_dir=str(tmp_path)), mesh=mesh)
    want = {k: v.sharding for k, v in
            jax.tree_util.tree_leaves_with_path(tr.params)}
    tr.save_model(str(tmp_path / "m"))
    tr.restore(str(tmp_path / "m"))
    got = {k: v.sharding for k, v in
           jax.tree_util.tree_leaves_with_path(tr.params)}
    assert got == want


def test_evaluator_receives_aux_when_requested():
    from sgpt_tpu.training import ContrastiveTrainer, TrainConfig

    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=256)
    tok = SimpleTokenizer(vocab_size=256)
    tr = ContrastiveTrainer(init_params(cfg, jax.random.key(0)), cfg, tok,
                            TrainConfig(batch_size=2, max_seq_len=16, lr=1e-3,
                                        pooling="learned_weightedmean",
                                        eval_steps=1))
    seen = {}

    def evaluator(params, aux):
        seen["aux"] = aux
        return 1.0

    batch = [("a", "b"), ("c", "d")]
    tr.fit(lambda: iter([batch]), steps_per_epoch=1, evaluator=evaluator)
    assert "pos_weights" in seen.get("aux", {})


def test_sgptmodel_save_load_preserves_dtype(tmp_path):
    """bf16 models must reload as bf16 — dropping dtype from the manifest
    silently reloaded them as float32 (different numerics, 2x HBM)."""
    from sgpt_tpu.model import SGPTModel

    cfg = tiny("neo").replace(dtype=jnp.bfloat16)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    m = SGPTModel(init_params(cfg, jax.random.key(0)), cfg, tok)
    m.save(str(tmp_path / "m"))
    m2 = SGPTModel.load(str(tmp_path / "m"), tokenizer=tok)
    assert jnp.dtype(m2.cfg.dtype) == jnp.dtype(jnp.bfloat16)
    a = m.encode(["hello"])
    b = m2.encode(["hello"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_trec_tie_break_descending_docid():
    """trec_eval orders equal scores by DESCENDING doc id; with only the
    larger id relevant, ascending tie-break under-reports AP."""
    from sgpt_tpu.evaluation.useb import _trec_map, _trec_ndcg

    rel = {"a": 0, "b": 1}
    run = {"a": 0.5, "b": 0.5}            # tie: 'b' (larger id) ranks first
    assert _trec_map(rel, run) == 1.0
    assert _trec_ndcg(rel, run) == 1.0


def test_scidocs_untitled_paper_not_dropped(tmp_path):
    """A paper present in the corpus with a null/empty title embeds as ''
    (reference scidocs.py behavior) instead of vanishing from queries and
    candidate pools like an absent paper."""
    import json
    from sgpt_tpu.evaluation.useb import SciDocsEvaluator

    data = {
        "corpus": {"q1": {"title": "query paper"},
                   "d1": {"title": None},          # untitled but PRESENT
                   "d2": {"title": "other paper"}},
        "test": {"cite": {"q1": {"d1": 1, "d2": 0}}},
    }
    d = tmp_path / "scidocs"
    d.mkdir()
    (d / "data.json").write_text(json.dumps(data))

    def semb(texts):
        rng = np.random.default_rng(0)
        return rng.normal(size=(len(texts), 8)).astype(np.float32)

    ev = SciDocsEvaluator(semb, str(d))
    res = ev.run("test")
    # d1 (the only relevant doc) is in the pool: MAP over {d1, d2} is
    # 100 or 50 (x100 USEB convention) depending on rank — dropping d1
    # would yield MAP 0
    assert res["map_scidocs_cite_cosine"] in (50.0, 100.0)


def test_online_contrastive_matches_reference_formula():
    """Unnormalized SUM over hard pairs + the reference's single-pos/neg
    mean-threshold fallbacks (OnlineContrastiveLoss.py:42-53)."""
    from sgpt_tpu.losses import online_contrastive_loss

    rng = np.random.default_rng(3)
    u = rng.normal(size=(6, 5)).astype(np.float32)
    v = rng.normal(size=(6, 5)).astype(np.float32)
    y = np.array([1, 1, 1, 0, 0, 0], np.int32)
    margin = 0.5

    def ref(u, v, y):
        un = u / np.linalg.norm(u, axis=1, keepdims=True)
        vn = v / np.linalg.norm(v, axis=1, keepdims=True)
        d = 1.0 - np.sum(un * vn, axis=1)
        poss, negs = d[y == 1], d[y == 0]
        neg_thr = poss.max() if len(poss) > 1 else negs.mean()
        pos_thr = negs.min() if len(negs) > 1 else poss.mean()
        hard_neg = negs[negs < neg_thr]
        hard_pos = poss[poss > pos_thr]
        return (hard_pos ** 2).sum() + \
               (np.maximum(margin - hard_neg, 0) ** 2).sum()

    got = float(online_contrastive_loss(jnp.asarray(u), jnp.asarray(v),
                                        jnp.asarray(y), margin=margin))
    np.testing.assert_allclose(got, ref(u, v, y), rtol=1e-5)

    # single-positive batch exercises the mean-threshold fallback
    y1 = np.array([1, 0, 0, 0, 0, 0], np.int32)
    got1 = float(online_contrastive_loss(jnp.asarray(u), jnp.asarray(v),
                                         jnp.asarray(y1), margin=margin))
    np.testing.assert_allclose(got1, ref(u, v, y1), rtol=1e-5)


def test_batch_semi_hard_finite_on_single_label_batch():
    """All-same-label batch: no valid negatives anywhere. The reference's
    _masked_maximum falls back to the row minimum — loss and grads must be
    finite, not inf/NaN."""
    from sgpt_tpu.losses import batch_semi_hard_triplet_loss

    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    labels = jnp.zeros((4,), jnp.int32)
    loss, grad = jax.value_and_grad(
        lambda e: batch_semi_hard_triplet_loss(labels, e))(emb)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()


def test_metrics_tie_break_descending_docid():
    """pytrec_eval orders equal scores by DESCENDING doc id (both the python
    metrics and the native engine path must agree)."""
    from sgpt_tpu.evaluation.metrics import mrr_at_k, precision_at_k

    qrels = {"q": {"B": 1}}
    results = {"q": {"A": 1.0, "B": 1.0}}     # tie: B (larger id) first
    assert mrr_at_k(qrels, results, 2) == 1.0
    assert precision_at_k(qrels, results, 1) == 1.0


def test_ir_evaluator_chunked_matches_single_pass():
    """corpus_chunk_size must not change any metric (running top-k prune)."""
    from sgpt_tpu.evaluation.ir import InformationRetrievalEvaluator

    rng = np.random.default_rng(9)
    emb = {f"t{i}": rng.normal(size=8).astype(np.float32) for i in range(40)}
    queries = {f"q{i}": f"t{i}" for i in range(5)}
    corpus = {f"d{i}": f"t{i}" for i in range(40)}
    relevant = {f"q{i}": {f"d{i}"} for i in range(5)}

    def enc(texts):
        return np.stack([emb[t] for t in texts])

    kw = dict(mrr_at=(10,), ndcg_at=(10,), accuracy_at=(1, 3),
              precision_recall_at=(1, 3), map_at=(10,), main_metric="map@10")
    whole = InformationRetrievalEvaluator(queries, corpus, relevant,
                                          corpus_chunk_size=10_000, **kw)
    chunked = InformationRetrievalEvaluator(queries, corpus, relevant,
                                            corpus_chunk_size=7, **kw)
    a, b = whole.compute(enc), chunked.compute(enc)
    assert a == b
    assert a["accuracy@1"] == 1.0


def test_ir_evaluator_rejects_underivable_main_metric():
    from sgpt_tpu.evaluation.ir import InformationRetrievalEvaluator

    with pytest.raises(ValueError, match="main_metric"):
        InformationRetrievalEvaluator({"q": "x"}, {"d": "y"}, {"q": {"d"}},
                                      map_at=(10,))  # default main map@100


def test_ce_raises_on_instruction_plus_continuation_overflow():
    from sgpt_tpu.crossencoder import CrossEncoderRanker

    cfg = tiny("neo")
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    ce = CrossEncoderRanker(init_params(cfg, jax.random.key(0)), cfg, tok,
                            max_length=16)
    long_query = " ".join(f"w{i}" for i in range(14))
    with pytest.raises(ValueError, match="exceed max_length"):
        ce.predict([(long_query, "some document body")])

    with pytest.raises(ValueError, match="fewshots require"):
        CrossEncoderRanker(init_params(cfg, jax.random.key(0)), cfg, tok,
                           use_prompt=False, fewshots=("d", "q"))


class _MultiTokenBracketTok(SimpleTokenizer):
    """Brackets encode to TWO ids each (HFTokenizer allows multi-token
    brackets; the fixed 2-token budget overflowed max_seq_len with them)."""

    def bracket_ids(self, bracket):
        return [self.BRACKETS[bracket], self.BRACKETS[bracket]]


def test_specb_budget_covers_multitoken_brackets():
    from sgpt_tpu.tokenization.specb import SpecbCodec

    codec = SpecbCodec(_MultiTokenBracketTok(vocab_size=128),
                       max_seq_len=12, specb=True)
    long_text = " ".join(f"w{i}" for i in range(40))
    for is_query in (False, True):
        rows, _, _ = codec.encode_rows([long_text], is_query=is_query)
        assert len(rows[0]) <= 12


def test_specb_pad_rows_truncation_keeps_closing_bracket():
    from sgpt_tpu.tokenization.specb import SpecbCodec

    tok = SimpleTokenizer(vocab_size=128)
    codec = SpecbCodec(tok, max_seq_len=64, specb=True)
    rows, _, _ = codec.encode_rows([" ".join(f"w{i}" for i in range(30))],
                                   is_query=False)
    enc = codec.pad_rows(rows, pad_to=16)
    ids = enc.input_ids[0]
    L = int(enc.attention_mask[0].sum())
    assert L == 16
    assert ids[L - 1] == tok.bracket_ids("}")[0]   # '}' survives truncation
    assert ids[0] == tok.bracket_ids("{")[0]


def test_specb_clean_newlines_flag():
    from sgpt_tpu.tokenization.specb import SpecbCodec

    tok = SimpleTokenizer(vocab_size=128)
    clean = SpecbCodec(tok, max_seq_len=32)                      # default True
    raw = SpecbCodec(tok, max_seq_len=32, clean_newlines=False)
    text = "alpha\nbeta"
    assert clean.encode_rows([text])[0][0] == tok.encode("alpha beta")
    assert raw.encode_rows([text])[0][0] == tok.encode(text)


def test_cache_key_distinguishes_activation_and_location(tmp_path, small):
    """Same head weights, different activation or location = different model
    = different cache key (structure, not just array leaves)."""
    cfg, params, tok = small
    D = cfg.hidden_size
    w = np.random.default_rng(1).normal(size=(D, D)).astype(np.float32)
    engines = [
        EmbeddingEngine(params, cfg, tok, cache_dir=str(tmp_path),
                        batch_size=2, max_seq_len=16,
                        dense_heads=[{"w": w, "location": "post_pool",
                                      "activation": act}])
        for act in ("identity", "gelu")
    ]
    engines.append(EmbeddingEngine(
        params, cfg, tok, cache_dir=str(tmp_path), batch_size=2,
        max_seq_len=16, dense_heads=[{"w": w, "location": "pre_pool"}]))
    keys = {e._cache_key(["x"], False) for e in engines}
    assert len(keys) == 3


def test_engine_rejects_pre_heads_with_stack_pooler(small):
    cfg, params, tok = small
    with pytest.raises(ValueError, match="pre_pool"):
        EmbeddingEngine(params, cfg, tok, method="meanmean",
                        dense_heads=[{"w": np.ones((cfg.hidden_size, 4),
                                                   np.float32),
                                      "location": "pre_pool"}])


def test_sgptmodel_load_unknown_dtype_roundtrips(tmp_path):
    from sgpt_tpu.model import SGPTModel

    cfg = tiny("neo").replace(dtype=jnp.float16)   # outside the common map
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    m = SGPTModel(init_params(cfg, jax.random.key(0)), cfg, tok)
    m.save(str(tmp_path / "m"))
    m2 = SGPTModel.load(str(tmp_path / "m"), tokenizer=tok)
    assert jnp.dtype(m2.cfg.dtype) == jnp.dtype(jnp.float16)


def test_ir_chunked_consistent_on_tied_scores():
    """Duplicate docs (tied scores) at the top-k boundary must not make
    metrics depend on corpus_chunk_size."""
    from sgpt_tpu.evaluation.ir import InformationRetrievalEvaluator

    emb = {"q": np.ones(4, np.float32)}
    for i in range(30):
        emb[f"t{i}"] = np.ones(4, np.float32)        # ALL docs tie
    queries = {"q0": "q"}
    corpus = {f"d{i:02d}": f"t{i}" for i in range(30)}
    relevant = {"q0": {"d29"}}                       # largest id is relevant

    def enc(texts):
        return np.stack([emb[t] for t in texts])

    kw = dict(mrr_at=(5,), ndcg_at=(5,), accuracy_at=(1,),
              precision_recall_at=(1,), map_at=(5,), main_metric="map@5")
    a = InformationRetrievalEvaluator(queries, corpus, relevant,
                                      corpus_chunk_size=10_000, **kw).compute(enc)
    b = InformationRetrievalEvaluator(queries, corpus, relevant,
                                      corpus_chunk_size=7, **kw).compute(enc)
    assert a == b
    assert a["accuracy@1"] == 1.0    # d29 wins the descending-id tie-break


def test_dense_retriever_chunking_invariant():
    """corpus_chunk_size / device_chunk must not change search results
    (pure-numpy mock model, no device work)."""
    from sgpt_tpu.retrieval import DenseRetriever

    rng = np.random.default_rng(21)
    vecs = {f"d{i}": rng.normal(size=8).astype(np.float32) for i in range(57)}

    class Mock:
        def encode_queries(self, texts):
            return np.stack([vecs[t] for t in texts])

        def encode_corpus(self, docs):
            return np.stack([vecs[d["text"]] for d in docs])

    corpus = {d: {"title": "", "text": d} for d in vecs}
    queries = {"q0": "d7", "q1": "d40"}
    base = None
    for cc, dc in ((10_000, 8192), (13, 8192), (13, 130), (57, 256)):
        res = DenseRetriever(Mock(), corpus_chunk_size=cc,
                             device_chunk=dc).search(corpus, queries, top_k=5)
        got = {q: sorted(r.items(), key=lambda x: (-x[1], x[0]))
               for q, r in res.items()}
        if base is None:
            base = got
        else:
            for q in got:
                assert [d for d, _ in got[q]] == [d for d, _ in base[q]], (cc, dc)
    assert base["q0"][0][0] == "d7" and base["q1"][0][0] == "d40"


def test_npz_fallback_roundtrips_bfloat16_and_opt_state(tmp_path, monkeypatch):
    """np.savez stores bf16 as void '|V2' (unloadable). The fallback now
    casts to fp32 with a dtype sidecar and restores exactly; opt_state is
    persisted too instead of silently dropped."""
    import builtins
    import ml_dtypes
    from sgpt_tpu.training.checkpoint import load_checkpoint, save_checkpoint

    real = builtins.__import__

    def hide_orbax(name, *a, **k):
        if name.startswith("orbax"):
            raise ImportError("hidden for test")
        return real(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", hide_orbax)
    tree = {"w": np.arange(6, dtype=ml_dtypes.bfloat16).reshape(2, 3),
            "b": np.ones(3, np.float32)}
    save_checkpoint(str(tmp_path / "ck"), tree,
                    opt_state={"m": np.zeros(2, np.float32)}, step=1)
    monkeypatch.setattr(builtins, "__import__", real)
    got = load_checkpoint(str(tmp_path / "ck"))
    assert got["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(np.asarray(got["w"], np.float32),
                                  np.asarray(tree["w"], np.float32))
    assert (tmp_path / "ck" / "opt_state.npz").exists()


def test_trainable_ce_right_truncation_and_empty_predict():
    from sgpt_tpu.cross_encoder_trainable import CrossEncoderTrainable

    cfg = tiny("neo")
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    ce = CrossEncoderTrainable(init_params(cfg, jax.random.key(0)), cfg, tok,
                               max_length=8, batch_size=2)
    s1 = "query words here"
    s2 = " ".join(f"w{i}" for i in range(30))
    ids, mask = ce._tokenize_pairs([(s1, s2)])
    head = tok.encode(s1) + [tok.eos_id]
    # ST parity: right truncation keeps s1 and the separator at the front
    assert list(np.asarray(ids)[0][: len(head)]) == head
    assert ce.predict([]).shape == (0,)
