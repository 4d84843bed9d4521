"""Results aggregation semantics + end-to-end CLI smoke runs."""
import json
import os
import sys

import numpy as np
import pytest

from sgpt_tpu.evaluation.aggregate import (ResultsStore, CQADUPSTACK_FORUMS,
                                           AVG_DATASETS)


def test_results_store_accumulation(tmp_path):
    path = str(tmp_path / "ndcgs.json")
    store = ResultsStore(path)
    store.add("m1", "scifact", {"NDCG@10": 0.5}, {"MAP@10": 0.4},
              {"Recall@10": 0.6}, {"P@10": 0.1})
    store.add("m1", "nfcorpus", {"NDCG@10": 0.3}, {"MAP@10": 0.2},
              {"Recall@10": 0.4}, {"P@10": 0.05})
    store.save()
    store2 = ResultsStore(path)
    assert store2.data["ndcgs"]["m1"]["scifact"]["NDCG@10"] == 0.5


def test_cqadupstack_averaging(tmp_path):
    store = ResultsStore(str(tmp_path / "n.json"))
    for i, forum in enumerate(CQADUPSTACK_FORUMS):
        store.add("m", f"cqadupstack/{forum}", {"NDCG@10": float(i)},
                  {}, {}, {})
    cq = store.data["ndcgs"]["m"]["cqadupstack"]
    assert abs(cq["NDCG@10"] - np.mean(range(12))) < 1e-9


def test_compute_model_avg(tmp_path):
    store = ResultsStore(str(tmp_path / "n.json"))
    for i, ds in enumerate(AVG_DATASETS[:4]):
        store.add("m", ds, {"NDCG@10": 0.1 * (i + 1)}, {}, {}, {})
    store.add("m", "msmarco", {"NDCG@10": 0.9}, {}, {}, {})  # excluded
    store.compute_model_avg()
    avg = store.data["ndcgs"]["m"]["average"]["NDCG@10"]
    assert abs(avg - np.mean([0.1, 0.2, 0.3, 0.4])) < 1e-9


def test_select_best_ckpt(tmp_path):
    store = ResultsStore(str(tmp_path / "n.json"))
    for step, score in (("100", 0.3), ("200", 0.5), ("300", 0.4)):
        store.add(f"model_{step}", "scifact", {"NDCG@10": score}, {}, {}, {})
    store.compute_model_avg()
    best = store.select_best_ckpt()
    assert list(best) == ["model_200"]
    assert store.rank_models()[0] == "model_200"


@pytest.fixture
def tiny_beir(tmp_path):
    d = tmp_path / "datasets" / "toybeir"
    os.makedirs(d / "qrels")
    docs = {f"d{i}": f"document about topic {i} with words w{i} w{i+1}" for i in range(8)}
    with open(d / "corpus.jsonl", "w") as f:
        for did, text in docs.items():
            f.write(json.dumps({"_id": did, "title": "", "text": text}) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        for i in range(4):
            f.write(json.dumps({"_id": f"q{i}", "text": docs[f"d{i}"]}) + "\n")
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        for i in range(4):
            f.write(f"q{i}\td{i}\t1\n")
    return tmp_path


def test_beir_cli_smoke(tiny_beir, monkeypatch):
    from sgpt_tpu.cli import beir_retriever
    monkeypatch.chdir(tiny_beir)
    args = beir_retriever.parse_args.__wrapped__ if hasattr(
        beir_retriever.parse_args, "__wrapped__") else None
    sys.argv = ["x", "--modelname", "tiny-neo", "--dataset", "toybeir",
                "--datapath", str(tiny_beir / "datasets"), "--randominit",
                "--dtype", "float32", "--batchsize", "4", "--topk", "5",
                "--maxseqlen", "32", "--specb"]
    # build a *tiny* random model instead of 125M for speed
    import sgpt_tpu.cli.common as common
    from sgpt_tpu.models import tiny as tiny_cfg, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer
    import jax

    def fake_build(model_name, random_init=False, dtype_str="bfloat16"):
        cfg = tiny_cfg("neo")
        return (init_params(cfg, jax.random.key(0)), cfg,
                SimpleTokenizer(vocab_size=cfg.vocab_size))

    monkeypatch.setattr(common, "build_model", fake_build)
    monkeypatch.setattr(beir_retriever, "build_model", fake_build)
    beir_retriever.main()

    # identical query/doc text ⇒ NDCG@1 = 1.0
    with open(tiny_beir / "beir_embeddings_ndcgs.json") as f:
        data = json.load(f)
    assert data["ndcgs"]["tiny-neo"]["toybeir"]["NDCG@1"] == 1.0


def test_beir_cli_quantize_smoke(tiny_beir, monkeypatch):
    """--quantize int8 drives the CLI's pre-quantize path (free_source=True
    on the freshly-loaded tree, BEFORE sharding/engine construction)."""
    from sgpt_tpu.cli import beir_retriever
    monkeypatch.chdir(tiny_beir)
    sys.argv = ["x", "--modelname", "tiny-neo-q", "--dataset", "toybeir",
                "--datapath", str(tiny_beir / "datasets"), "--randominit",
                "--dtype", "float32", "--batchsize", "4", "--topk", "5",
                "--maxseqlen", "32", "--quantize", "int8"]
    import sgpt_tpu.cli.common as common
    from sgpt_tpu.models import tiny as tiny_cfg, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer
    import jax

    def fake_build(model_name, random_init=False, dtype_str="bfloat16"):
        cfg = tiny_cfg("neo")
        return (init_params(cfg, jax.random.key(0)), cfg,
                SimpleTokenizer(vocab_size=cfg.vocab_size))

    monkeypatch.setattr(common, "build_model", fake_build)
    monkeypatch.setattr(beir_retriever, "build_model", fake_build)
    beir_retriever.main()

    with open(tiny_beir / "beir_embeddings_ndcgs.json") as f:
        data = json.load(f)
    # int8 on identical-text pairs must still retrieve them at rank 1
    assert data["ndcgs"]["tiny-neo-q"]["toybeir"]["NDCG@1"] == 1.0


def test_sgptce_cli_smoke(tiny_beir, monkeypatch, tmp_path):
    from sgpt_tpu.cli import sgptce
    import sgpt_tpu.cli.common as common
    from sgpt_tpu.models import tiny as tiny_cfg, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer
    import jax

    monkeypatch.chdir(tiny_beir)
    bm25 = {f"q{i}": {f"d{j}": float(8 - j) for j in range(8)} for i in range(4)}
    with open(tiny_beir / "bm25.json", "w") as f:
        json.dump(bm25, f)

    def fake_build(model_name, random_init=False, dtype_str="bfloat16"):
        cfg = tiny_cfg("gptj")
        return (init_params(cfg, jax.random.key(0)), cfg,
                SimpleTokenizer(vocab_size=cfg.vocab_size))

    monkeypatch.setattr(sgptce, "build_model", fake_build)
    sys.argv = ["x", "--dataset", "toybeir", "--datadir",
                str(tiny_beir / "datasets"), "--bm25results",
                str(tiny_beir / "bm25.json"), "--randominit",
                "--batchsize", "4", "--topk", "3", "--maxseqlen", "48"]
    sgptce.main()
    # default output filename records the prompt id (ablation sweeps must not
    # overwrite each other)
    with open(tiny_beir / "sgptce_toybeir_promptG.json") as f:
        out = json.load(f)
    assert "ce_ndcg" in out and "bm25_ndcg" in out and out["prompt"] == "G"
