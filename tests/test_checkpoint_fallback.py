"""Checkpoint npz fallback (orbax-less environments) must round-trip fully."""
import builtins

import numpy as np
import pytest

import jax

from sgpt_tpu.training import checkpoint as ckpt


@pytest.fixture
def no_orbax(monkeypatch):
    real_import = builtins.__import__

    def fake_import(name, *args, **kw):
        if name.startswith("orbax"):
            raise ImportError("orbax disabled for test")
        return real_import(name, *args, **kw)

    monkeypatch.setattr(builtins, "__import__", fake_import)


def test_npz_roundtrip_nested_tree(tmp_path, no_orbax):
    tree = {
        "model": {"wte": np.arange(6.0).reshape(2, 3),
                  "layers": {"ln": {"scale": np.ones(3)}}},
        "aux": {"heads": [{"w": np.full((2, 2), 2.0)},
                          {"w": np.full((2, 2), 3.0), "b": np.zeros(2)}],
                "pos_weights": np.arange(4.0)},
    }
    ckpt.save_checkpoint(str(tmp_path / "c"), tree, step=7)
    import json
    with open(tmp_path / "c" / "meta.json") as f:
        assert json.load(f)["backend"] == "npz"

    restored = ckpt.load_checkpoint(str(tmp_path / "c"))
    np.testing.assert_array_equal(restored["model"]["wte"], tree["model"]["wte"])
    assert isinstance(restored["aux"]["heads"], list)
    np.testing.assert_array_equal(restored["aux"]["heads"][1]["b"],
                                  tree["aux"]["heads"][1]["b"])
    np.testing.assert_array_equal(restored["aux"]["pos_weights"],
                                  tree["aux"]["pos_weights"])


def test_sgptmodel_save_load_without_orbax(tmp_path, no_orbax):
    from sgpt_tpu.model import SGPTModel
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=128)
    tok = SimpleTokenizer(vocab_size=128)
    m = SGPTModel(init_params(cfg, jax.random.key(0)), cfg, tok, specb=True)
    want = m.encode(["orbaxless roundtrip"])
    m.save(str(tmp_path / "m"))
    m2 = SGPTModel.load(str(tmp_path / "m"), tokenizer=tok)
    np.testing.assert_allclose(m2.encode(["orbaxless roundtrip"]), want,
                               atol=1e-5)


def test_denoise_ratio_direction():
    import random
    from sgpt_tpu.data.datasets import denoise_text
    rng = random.Random(0)
    text = " ".join(f"w{i}" for i in range(2000))
    kept = len(denoise_text(text, del_ratio=0.6, rng=rng).split())
    # deletion ratio 0.6 ⇒ ~40% kept (the reference's keep rule)
    assert 0.3 < kept / 2000 < 0.5
