"""Native C++ metrics engine == pure-Python metrics, and it must be faster."""
import time

import numpy as np
import pytest

from sgpt_tpu.evaluation.metrics import evaluate_retrieval
from sgpt_tpu.evaluation.native import available, evaluate_retrieval_native


pytestmark = pytest.mark.skipif(not available(),
                                reason="native metrics lib not built")


def _random_case(n_q=50, n_docs=200, seed=0):
    rng = np.random.default_rng(seed)
    qrels, results = {}, {}
    for qi in range(n_q):
        qid = f"q{qi}"
        rel_docs = rng.choice(n_docs, size=rng.integers(1, 8), replace=False)
        qrels[qid] = {f"d{d}": int(rng.integers(1, 4)) for d in rel_docs}
        retrieved = rng.choice(n_docs, size=100, replace=False)
        results[qid] = {f"d{d}": float(rng.normal()) for d in retrieved}
    return qrels, results


def test_native_matches_python():
    qrels, results = _random_case()
    ks = (1, 3, 5, 10, 100)
    want = evaluate_retrieval(qrels, results, ks)
    got = evaluate_retrieval_native(qrels, results, ks)
    for w, g in zip(want, got):
        for key in w:
            assert abs(w[key] - g[key]) < 1e-4, (key, w[key], g[key])


def test_native_handles_edge_cases():
    qrels = {"q1": {"d1": 1}, "q2": {}}          # q2: no positives → excluded
    results = {"q1": {"d1": 0.9, "d2": 0.5}}
    want = evaluate_retrieval(qrels, results, (1, 10))
    got = evaluate_retrieval_native(qrels, results, (1, 10))
    assert want == got


def test_native_empty_results_query():
    qrels = {"q1": {"d1": 1}}
    results = {}  # query never retrieved anything
    got = evaluate_retrieval_native(qrels, results, (10,))
    assert got[0]["NDCG@10"] == 0.0


def test_native_speedup():
    qrels, results = _random_case(n_q=300, n_docs=2000, seed=1)
    ks = (1, 3, 5, 10, 100, 1000)
    t0 = time.perf_counter()
    evaluate_retrieval(qrels, results, ks)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    evaluate_retrieval_native(qrels, results, ks)
    t_native = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)


def test_native_subfloat32_tiebreak_matches_python():
    """Round-2 fix: scores cross the ABI as float64, so docs whose scores
    differ only below float32 precision rank exactly like the Python path
    (the r1 caveat in evaluation/native.py's old docstring)."""
    import numpy as np

    from sgpt_tpu.evaluation.metrics import evaluate_retrieval
    from sgpt_tpu.evaluation.native import available, evaluate_retrieval_native

    if not available():
        import pytest
        pytest.skip("no native toolchain")
    base = 0.5
    eps = float(np.nextafter(np.float64(base), 1.0)) - base  # one f64 ulp
    qrels = {"q": {"good": 1}}
    # "bad" outscores "good" by less than a float32 ulp — float32 would tie
    # and doc-id order would put "bad" first either way; float64 must rank
    # "bad" first because its score IS higher
    results = {"q": {"good": base, "bad": base + eps}}
    n = evaluate_retrieval_native(qrels, results, k_values=(1, 2))
    p = evaluate_retrieval(qrels, results, k_values=(1, 2))
    assert n == p
    assert n[0]["NDCG@1"] == 0.0  # 'bad' genuinely ranks first
