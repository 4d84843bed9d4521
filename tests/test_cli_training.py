"""End-to-end CLI training smoke tests (tiny models, synthetic data files)."""
import gzip
import json
import sys

import numpy as np
import pytest

import jax


def _fake_build(model_name, random_init=False, dtype_str="bfloat16"):
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer
    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=256)
    return (init_params(cfg, jax.random.key(0)), cfg,
            SimpleTokenizer(vocab_size=256))


def test_train_nli_cli(tmp_path, monkeypatch):
    from sgpt_tpu.cli import train_nli
    monkeypatch.setattr(train_nli, "build_model", _fake_build)
    monkeypatch.chdir(tmp_path)

    with gzip.open(tmp_path / "AllNLI.tsv.gz", "wt") as f:
        f.write("split\tsentence1\tsentence2\tlabel\n")
        for i in range(24):
            f.write(f"train\tpremise {i}\tentailed {i}\tentailment\n")
            f.write(f"train\tpremise {i}\tcontradicted {i}\tcontradiction\n")
    with gzip.open(tmp_path / "stsb.tsv.gz", "wt") as f:
        f.write("split\tsentence1\tsentence2\tscore\n")
        for i in range(8):
            f.write(f"dev\tsent a {i}\tsent b {i}\t{i % 5}\n")

    sys.argv = ["x", "--model_name", "tiny", "--randominit",
                "--nli_path", str(tmp_path / "AllNLI.tsv.gz"),
                "--stsb_path", str(tmp_path / "stsb.tsv.gz"),
                "--train_batch_size", "8", "--max_seq_length", "16",
                "--num_epochs", "1", "--lr", "1e-3", "--freezenonbias",
                "--learntmean", "--addxlinear", "1", "--useact",
                "--model_save_path", str(tmp_path / "out")]
    train_nli.main()
    assert (tmp_path / "out" / "meta.json").exists()


def test_train_nli_cli_mesh(tmp_path, monkeypatch):
    """--dp/--tp reaches multi-device training through the real CLI."""
    from sgpt_tpu.cli import train_nli
    monkeypatch.setattr(train_nli, "build_model", _fake_build)
    monkeypatch.chdir(tmp_path)

    with gzip.open(tmp_path / "AllNLI.tsv.gz", "wt") as f:
        f.write("split\tsentence1\tsentence2\tlabel\n")
        for i in range(16):
            f.write(f"train\tpremise {i}\tentailed {i}\tentailment\n")
            f.write(f"train\tpremise {i}\tcontradicted {i}\tcontradiction\n")

    sys.argv = ["x", "--model_name", "tiny", "--randominit",
                "--nli_path", str(tmp_path / "AllNLI.tsv.gz"),
                "--train_batch_size", "8", "--max_seq_length", "16",
                "--num_epochs", "1", "--lr", "1e-3", "--freezenonbias",
                "--dp", "4", "--tp", "2",
                "--model_save_path", str(tmp_path / "out_mesh")]
    train_nli.main()
    assert (tmp_path / "out_mesh" / "meta.json").exists()


def test_train_msmarco_cli(tmp_path, monkeypatch):
    from sgpt_tpu.cli import train_msmarco
    monkeypatch.setattr(train_msmarco, "build_model", _fake_build)
    monkeypatch.chdir(tmp_path)

    data = tmp_path / "msmarco"
    data.mkdir()
    with open(data / "collection.tsv", "w") as f:
        for i in range(20):
            f.write(f"p{i}\tpassage number {i} words here\n")
    with open(data / "queries.tsv", "w") as f:
        for i in range(10):
            f.write(f"q{i}\tquery number {i}\n")
    with open(data / "ce-scores.json", "w") as f:
        json.dump({f"q{i}": {f"p{j}": float(10 - j) for j in range(20)}
                   for i in range(10)}, f)
    with open(data / "hard-negatives.jsonl", "w") as f:
        for i in range(10):
            f.write(json.dumps({
                "qid": f"q{i}", "pos": [f"p{i}"],
                "neg": {"bm25": [f"p{(i + j) % 20}" for j in range(5, 10)]},
            }) + "\n")

    sys.argv = ["x", "--model_name", "tiny", "--randominit",
                "--data_folder", str(data), "--train_batch_size", "4",
                "--max_seq_length", "16", "--epochs", "1", "--lr", "1e-3",
                "--specb", "--model_save_path", str(tmp_path / "out2")]
    train_msmarco.main()
    assert (tmp_path / "out2" / "meta.json").exists()


def test_fewshot_crossencoder_prompt():
    from sgpt_tpu.crossencoder import CrossEncoderRanker
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("gptj", vocab_size=256)
    params = init_params(cfg, jax.random.key(1))
    tok = SimpleTokenizer(vocab_size=256)
    plain = CrossEncoderRanker(params, cfg, tok, batch_size=1, max_length=64)
    fewshot = CrossEncoderRanker(params, cfg, tok, batch_size=1, max_length=64,
                                 fewshots=("example doc", "example query"))
    # few-shot prefix must lengthen the protected instruction
    assert fewshot.instruction_len > plain.instruction_len
    s1 = plain.predict([("the query", "the doc")])
    s2 = fewshot.predict([("the query", "the doc")])
    assert s1[0] != s2[0]  # prefix changes the conditioning

    # instruction-preserving truncation keeps the few-shot prefix intact
    long_doc = " ".join(f"w{i}" for i in range(200))
    ctx = tok.encode(fewshot.fewshot_prefix + fewshot.prompt_doc.format(long_doc))
    cont = tok.encode("q")
    inp, inplen, _ = fewshot._pack(ctx, cont)
    assert inp[: fewshot.instruction_len] == ctx[: fewshot.instruction_len]
    assert inplen <= 64
