"""BioASQ conversion + BM25 first-stage driver, end to end into sgptce."""
import json
import os
import sys

import pytest


@pytest.fixture()
def bioasq_raw(tmp_path):
    """Synthetic allMeSH + golden-test layout matching the notebook's inputs."""
    allmesh = tmp_path / "allMeSH_2020.json"
    with open(allmesh, "w") as f:
        f.write('{"articles":[\n')  # header line: no article
        for i in range(5):
            f.write(json.dumps({"journal": "J", "abstractText":
                                f"abstract text about disease {i}",
                                "pmid": str(1000 + i),
                                "title": f"Study {i}", "year": "2020"}) + ",\n")
        # a malformed line the raw-extraction fallback must still parse
        f.write('{"journal":"J","abstractText":"fallback abstract","pmid":"2000","title":"Fallback study."}\n')
    fixes = tmp_path / "manual-fixes.csv"
    fixes.write_text("3000,Fixed title,Fixed text body\n")

    golden = tmp_path / "golden"
    golden.mkdir()
    for part in (1, 2):
        with open(golden / f"8B{part}_golden.json", "w") as f:
            json.dump({"questions": [
                {"id": f"q{part}", "body": f"question about disease {part}",
                 "documents": [f"http://www.ncbi.nlm.nih.gov/pubmed/{1000 + part}"]},
            ]}, f)
    return allmesh, golden, fixes


def test_bioasq_convert_and_load(tmp_path, bioasq_raw):
    from sgpt_tpu.cli import bioasq_convert
    from sgpt_tpu.evaluation import load_beir_dataset

    allmesh, golden, fixes = bioasq_raw
    out = tmp_path / "datasets" / "bioasq"
    sys.argv = ["x", "--allmesh", str(allmesh), "--questions", str(golden),
                "--out", str(out), "--manual-fixes", str(fixes)]
    bioasq_convert.main()

    corpus, queries, qrels = load_beir_dataset(str(out), "test")
    assert "1001" in corpus and corpus["1001"]["title"] == "Study 1"
    assert "2000" in corpus  # malformed-line fallback worked
    assert "3000" in corpus and corpus["3000"]["text"] == "Fixed text body"
    assert queries == {"q1": "question about disease 1",
                       "q2": "question about disease 2"}
    assert qrels == {"q1": {"1001": 1}, "q2": {"1002": 1}}


def test_bioasq_training_json_input(tmp_path, bioasq_raw):
    from sgpt_tpu.data.bioasq import convert_queries
    training = tmp_path / "training8b.json"
    training.write_text(json.dumps({"questions": [
        {"id": "tq", "body": "train question",
         "documents": ["http://x/pubmed/42", "http://x/pubmed/43"]}]}))
    nq, nr = convert_queries(str(training), str(tmp_path / "queries.jsonl"),
                             str(tmp_path / "qrels" / "test.tsv"))
    assert (nq, nr) == (1, 2)


def test_bm25_cli_feeds_sgptce(tmp_path, bioasq_raw, monkeypatch):
    """The notebook pipeline: convert → BM25 first stage → CE rerank."""
    import jax

    from sgpt_tpu.cli import bioasq_convert, bm25_retriever, sgptce
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    allmesh, golden, fixes = bioasq_raw
    datadir = tmp_path / "datasets"
    sys.argv = ["x", "--allmesh", str(allmesh), "--questions", str(golden),
                "--out", str(datadir / "bioasq")]
    bioasq_convert.main()

    monkeypatch.chdir(tmp_path)
    sys.argv = ["x", "--dataset", "bioasq", "--datadir", str(datadir),
                "--topk", "5"]
    bm25_retriever.main()
    results_path = tmp_path / "results_bioasq.json"
    assert results_path.exists()
    results = json.loads(results_path.read_text())
    assert set(results) == {"q1", "q2"} and all(results.values())

    # idempotence: second run skips (the notebook's if-exists guard)
    bm25_retriever.main()

    def fake_build(model_name, random_init=False, dtype_str="bfloat16"):
        cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2,
                   vocab_size=256)
        return (init_params(cfg, jax.random.key(0)), cfg,
                SimpleTokenizer(vocab_size=256))

    monkeypatch.setattr(sgptce, "build_model", fake_build)
    sys.argv = ["x", "--dataset", "bioasq", "--datadir", str(datadir),
                "--bm25results", str(results_path), "--randominit",
                "--batchsize", "2", "--topk", "3", "--maxseqlen", "48",
                "--output", str(tmp_path / "ce.json")]
    sgptce.main()
    out = json.loads((tmp_path / "ce.json").read_text())
    assert "ce_ndcg" in out and "bm25_ndcg" in out
