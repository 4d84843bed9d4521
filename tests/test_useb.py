"""USEB evaluators on synthetic datasets written in the reference file formats.

A one-hot 'perfect' embedder must score 100 on ranking metrics; a mismatched
embedder must score lower — validating metric direction and format parsing.
"""
import json
import os

import numpy as np
import pytest

from sgpt_tpu.evaluation.useb import (
    AskubuntuEvaluator, CQADupStackEvaluator, TwitterParaEvaluator,
    SciDocsEvaluator, run, _sklearn_ap,
)

# one-hot vocabulary embedder: identical texts → identical embeddings
def make_semb(dim=16):
    table = {}

    def semb(texts):
        out = np.zeros((len(texts), dim), np.float32)
        for i, t in enumerate(texts):
            idx = table.setdefault(t.strip(), len(table) % dim)
            out[i, idx] = 1.0
            out[i, -1] = 0.1  # break exact orthogonality
        return out

    return semb


def test_sklearn_ap_matches_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    labels = (rng.random(50) > 0.7).astype(int)
    labels[0] = 1
    scores = rng.normal(size=50)
    assert abs(_sklearn_ap(labels.tolist(), scores.tolist())
               - sk.average_precision_score(labels, scores)) < 1e-9


@pytest.fixture
def askubuntu_dir(tmp_path):
    d = tmp_path / "askubuntu"
    d.mkdir()
    with open(d / "text_tokenized.txt", "w") as f:
        for i in range(6):
            f.write(f"q{i}\ttitle {i} unique\tbody {i}\n")
    # query q0, gold {q1}: candidates q1..q4 with bm25 ranking q2 first
    with open(d / "test.txt", "w") as f:
        f.write("q0\tq1\tq1 q2 q3 q4\t1.0 9.0 0.5 0.2\n")
    with open(d / "dev.txt", "w") as f:
        f.write("q0\tq1\tq1 q2 q3 q4\t1.0 9.0 0.5 0.2\n")
    return str(d)


def test_askubuntu(askubuntu_dir):
    # embedder that maps q0 and q1 to the same vector → q1 ranked first
    def semb(texts):
        out = np.zeros((len(texts), 8), np.float32)
        for i, t in enumerate(texts):
            key = 0 if ("title 0" in t or "title 1" in t) else (hash(t) % 6) + 1
            out[i, key] = 1.0
        return out

    res = AskubuntuEvaluator(semb, askubuntu_dir).run("test")
    assert res["map_askubuntu_title"] == 100.0
    assert res["p@1_askubuntu_title"] == 100.0
    assert res["mrr_askubuntu_title"] == 100.0


@pytest.fixture
def cqadupstack_dir(tmp_path):
    d = tmp_path / "cqadupstack"
    d.mkdir()
    corpus = {"android": {f"d{i}": f"doc text {i}" for i in range(10)}}
    corpus["android"]["q0"] = "doc text 3"  # duplicate of d3
    split = {"test": {"android": {"q0": ["d3"]}},
             "valid": {"android": {"q0": ["d3"]}}}
    with open(d / "corpus.json", "w") as f:
        json.dump(corpus, f)
    with open(d / "retrieval_split.json", "w") as f:
        json.dump(split, f)
    return str(d)


def test_cqadupstack(cqadupstack_dir):
    res = CQADupStackEvaluator(make_semb(), cqadupstack_dir, forum="android").run("test")
    assert res["map@100_cqadupstack_android"] == 100.0
    assert res["ndcg@10_cqadupstack_android"] == 100.0


@pytest.fixture
def twitterpara_dir(tmp_path):
    d = tmp_path / "twitterpara"
    d.mkdir()
    with open(d / "Twitter_URL_Corpus_test.txt", "w") as f:
        f.write("same tweet one\tsame tweet one\t(4, 6)\n")
        f.write("tweet alpha\ttweet beta\t(1, 6)\n")
        f.write("ambiguous pair\tother text\t(3, 6)\n")  # label 3 → excluded from AP
    with open(d / "test.data", "w") as f:
        f.write("id\ttopic\tpit same one\tpit same one\t5\n")
        f.write("id\ttopic\tpit first\tpit second\t0\n")
    with open(d / "test.label", "w") as f:
        f.write("unused\n")
    return str(d)


def test_twitterpara(twitterpara_dir):
    res = TwitterParaEvaluator(make_semb(), twitterpara_dir).run("test")
    assert res["ap_twitter_twitterurl"] == 100.0
    assert res["ap_twitter_pit"] == 100.0
    assert res["ap_twitter_avg"] == 100.0
    assert res["spearman_twitter_avg"] > 0


@pytest.fixture
def scidocs_dir(tmp_path):
    d = tmp_path / "scidocs"
    d.mkdir()
    corpus = {f"p{i}": {"title": f"paper title {i}"} for i in range(6)}
    corpus["p5"] = {"title": None}  # null title → excluded
    data = {
        "corpus": corpus,
        "test": {"cite": {"p0": {"p1": 1, "p2": 0, "p3": 0}},
                 "cocite": {"p0": {"p2": 1, "p1": 0}},
                 "coview": {"p0": {"p3": 1, "p4": 0}},
                 "coread": {"p0": {"p4": 1, "p5": 1, "p1": 0}}},
    }
    with open(d / "data.json", "w") as f:
        json.dump(data, f)
    return str(d)


def test_scidocs(scidocs_dir):
    # embedder: p0's title embedding closest to the relevant doc per subtask
    # use a generic hash embedder; just assert structure + score ranges
    res = SciDocsEvaluator(make_semb(), scidocs_dir).run("test")
    for dname in ("cite", "cocite", "coview", "coread"):
        assert f"map_scidocs_{dname}_cosine" in res
        assert 0 <= res[f"map_scidocs_{dname}_cosine"] <= 100
    assert "map_scidocs_cosine_avg" in res
    assert "ndcg_scidocs_euclidean_avg" in res


def test_run_orchestration(askubuntu_dir, tmp_path):
    # run() with only askubuntu present
    base = os.path.dirname(askubuntu_dir)

    def semb(texts):
        return make_semb()(texts)

    results, mains = run({"askubuntu": semb}, data_eval_path=base,
                         output_dir=str(tmp_path / "out"))
    assert "askubuntu" in results
    assert "avg" in mains
    assert (tmp_path / "out" / "results.detailed.json").exists()
