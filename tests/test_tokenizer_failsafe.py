"""Fail-safe tokenizer loading: no silent hash-tokenizer fallback under real
weights, and GPT-2-family bracket-id preflight (reference
beir_dense_retriever.py:100-104,150-153)."""
import json
import os
import sys

import pytest

from sgpt_tpu.tokenization import (GPT2_BRACKET_IDS, SimpleTokenizer,
                                   TokenizerLoadError, check_specb_brackets,
                                   get_tokenizer)


def test_strict_load_raises_on_missing_tokenizer():
    with pytest.raises(TokenizerLoadError):
        get_tokenizer("/nonexistent/model/path", fallback=False)


def test_fallback_load_warns_loudly(caplog):
    import logging
    with caplog.at_level(logging.WARNING, logger="sgpt_tpu.tokenization.base"):
        tok = get_tokenizer("/nonexistent/model/path")
    assert isinstance(tok, SimpleTokenizer)
    assert any("FALLING BACK" in r.message for r in caplog.records)


class _FakeTok:
    """Minimal Tokenizer-protocol stub with configurable bracket ids."""

    def __init__(self, vocab_size, brackets):
        self.vocab_size = vocab_size
        self.eos_id = 1
        self.pad_id = 0
        self._brackets = brackets

    def encode(self, text):
        return [7]

    def bracket_ids(self, bracket):
        return self._brackets[bracket]


def test_bracket_preflight_passes_on_reference_ids():
    check_specb_brackets(_FakeTok(50257, GPT2_BRACKET_IDS), "good")


def test_bracket_preflight_rejects_corrupt_gpt2_tokenizer():
    bad = dict(GPT2_BRACKET_IDS)
    bad["["] = [12345]
    with pytest.raises(TokenizerLoadError, match="bracket ids"):
        check_specb_brackets(_FakeTok(50257, bad), "corrupt")


def test_bracket_preflight_skips_non_gpt2_vocabs():
    # BLOOM-style 250k vocab with multi-token brackets: not our contract
    check_specb_brackets(
        _FakeTok(250680, {b: [9, 9] for b in "[]{}"}), "bloom")


def test_build_model_real_weights_require_real_tokenizer(monkeypatch):
    """If weights load but the tokenizer doesn't, build_model must raise."""
    from sgpt_tpu.cli import common
    import sgpt_tpu.models as models

    def fake_load(name, dtype=None):
        from sgpt_tpu.models import tiny, init_params
        import jax
        cfg = tiny("neo")
        return init_params(cfg, jax.random.key(0)), cfg

    monkeypatch.setattr(models, "load_pretrained", fake_load)
    with pytest.raises(TokenizerLoadError):
        common.build_model("/nonexistent/weights-ok-tokenizer-missing",
                          dtype_str="float32")


def test_parity_run_exits_3_when_model_unavailable(tmp_path, monkeypatch):
    """--expect-ndcg with unloadable weights: distinct exit 3, not a score
    failure (PARITY.md contract)."""
    from sgpt_tpu.cli import beir_retriever
    d = tmp_path / "datasets" / "toybeir"
    os.makedirs(d / "qrels")
    with open(d / "corpus.jsonl", "w") as f:
        f.write(json.dumps({"_id": "d0", "title": "", "text": "hello"}) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q0", "text": "hello"}) + "\n")
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\nq0\td0\t1\n")
    monkeypatch.chdir(tmp_path)
    sys.argv = ["x", "--modelname", "/nonexistent/sgpt-125m", "--dataset",
                "toybeir", "--datapath", str(tmp_path / "datasets"),
                "--expect-ndcg", "0.569"]
    with pytest.raises(SystemExit) as ei:
        beir_retriever.main()
    assert ei.value.code == 3
