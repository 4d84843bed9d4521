"""HF export: our pytree → state dict → pytree must round-trip exactly, and an
HF model loaded from the export must reproduce our forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.models import tiny, init_params, convert_hf_state_dict, forward
from sgpt_tpu.models.hf_export import to_hf_state_dict

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("family", ["neo", "gptj", "bloom"])
def test_roundtrip_exact(family):
    cfg = tiny(family, num_layers=2, hidden_size=32, num_heads=4, vocab_size=64)
    params = init_params(cfg, jax.random.key(0))
    sd = to_hf_state_dict(params, cfg, family)
    back = convert_hf_state_dict(sd, cfg, family)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_causal_lm_style_roundtrips_untied_head():
    cfg = tiny("gptj", num_layers=2, hidden_size=32, num_heads=4, vocab_size=64)
    params = init_params(cfg, jax.random.key(2))
    params["lm_head"] = {"w": jax.random.normal(jax.random.key(3),
                                                (32, 64), "float32")}
    sd = to_hf_state_dict(params, cfg, "gptj")  # auto → causal_lm
    assert "lm_head.weight" in sd
    assert all(k == "lm_head.weight" or k.startswith("transformer.")
               for k in sd)
    back = convert_hf_state_dict(sd, cfg, "gptj")
    np.testing.assert_allclose(np.asarray(back["lm_head"]["w"]),
                               np.asarray(params["lm_head"]["w"]), atol=1e-7)


def test_export_loads_into_hf_model():
    from transformers import GPTNeoConfig, GPTNeoModel

    hf_cfg = GPTNeoConfig(
        vocab_size=257, hidden_size=64, num_layers=2, num_heads=4,
        attention_types=[[["global", "local"], 1]], window_size=8,
        max_position_embeddings=128, intermediate_size=256,
        resid_dropout=0.0, embed_dropout=0.0, attention_dropout=0.0,
    )
    from sgpt_tpu.models import config_from_hf
    cfg = config_from_hf(hf_cfg, "neo")
    params = init_params(cfg, jax.random.key(1))

    sd = {k: torch.from_numpy(v.copy())
          for k, v in to_hf_state_dict(params, cfg, "neo").items()}
    model = GPTNeoModel(hf_cfg)
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model.eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 257, size=(2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    with torch.no_grad():
        hf_out = model(input_ids=torch.tensor(ids),
                       attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    ours = np.asarray(forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg))
    np.testing.assert_allclose(ours, hf_out, atol=2e-4)
