"""Numerical parity of the unified decoder vs HuggingFace reference implementations.

Zero-egress: builds tiny *randomly initialized* HF models from configs (no
downloads) and checks our forward reproduces their hidden states. This validates
the architecture math (rotary layout, alibi, local attention, residual order)
that published-score parity depends on (SURVEY.md §7 "hard parts").
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sgpt_tpu.models import (
    convert_hf_state_dict, config_from_hf, forward, logits, tiny, init_params,
)

torch = pytest.importorskip("torch")


def _run_hf(model, input_ids, attention_mask):
    model.eval()
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            output_hidden_states=True,
        )
    return [h.numpy() for h in out.hidden_states]


def _check_parity(hf_model, cfg, family, atol=2e-4):
    rng = np.random.default_rng(0)
    B, T = 3, 17
    input_ids = rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    attention_mask = np.ones((B, T), dtype=np.int32)
    attention_mask[1, 12:] = 0  # right padding on one row
    attention_mask[2, 9:] = 0

    hf_hidden = _run_hf(hf_model, input_ids, attention_mask)
    params = convert_hf_state_dict(hf_model.state_dict(), cfg, family)
    ours = forward(params, jnp.asarray(input_ids), jnp.asarray(attention_mask),
                   cfg, output_hidden_states=True)
    ours = np.asarray(ours)

    assert ours.shape[0] == len(hf_hidden)
    mask = attention_mask[:, :, None]
    for i, ref in enumerate(hf_hidden):
        diff = np.abs(ours[i] - ref) * mask  # padded positions are don't-care
        assert diff.max() < atol, f"layer {i}: max diff {diff.max():.2e}"


def test_gpt_neo_parity():
    from transformers import GPTNeoConfig, GPTNeoModel
    hf_cfg = GPTNeoConfig(
        vocab_size=257, hidden_size=64, num_layers=4, num_heads=4,
        attention_types=[[["global", "local"], 2]], window_size=8,
        max_position_embeddings=128, intermediate_size=256,
        resid_dropout=0.0, embed_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = GPTNeoModel(hf_cfg)
    cfg = config_from_hf(hf_cfg, "neo")
    assert cfg.local_flags() == (False, True, False, True)
    assert not cfg.scale_attn
    _check_parity(model, cfg, "neo")


def test_gptj_parity():
    from transformers import GPTJConfig, GPTJModel
    hf_cfg = GPTJConfig(
        vocab_size=257, n_embd=64, n_layer=3, n_head=4, rotary_dim=8,
        n_positions=128, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    model = GPTJModel(hf_cfg)
    cfg = config_from_hf(hf_cfg, "gptj")
    assert cfg.parallel_residual and cfg.position_embedding == "rotary"
    _check_parity(model, cfg, "gptj")


def test_bloom_parity():
    from transformers import BloomConfig, BloomModel
    hf_cfg = BloomConfig(
        vocab_size=257, hidden_size=64, n_layer=3, n_head=4,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = BloomModel(hf_cfg)
    cfg = config_from_hf(hf_cfg, "bloom")
    assert cfg.position_embedding == "alibi" and cfg.embedding_layernorm
    _check_parity(model, cfg, "bloom")


def test_init_and_logits_shapes():
    import jax
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.zeros((2, 5), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    h = forward(params, ids, mask, cfg)
    assert h.shape == (2, 5, cfg.hidden_size)
    lg = logits(params, h, cfg)
    assert lg.shape == (2, 5, cfg.vocab_size)

    hs = forward(params, ids, mask, cfg, output_hidden_states=True)
    assert hs.shape == (cfg.num_layers + 1, 2, 5, cfg.hidden_size)
