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


def test_bert_parity():
    """BERT backbone (bidirectional, post-LN, token types, exact GELU) vs the
    HF BertModel — baseline parity for the ST fork's BERT runs
    (models/Transformer.py:30-40 accepts any HF name)."""
    from transformers import BertConfig, BertModel
    hf_cfg = BertConfig(
        vocab_size=257, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(hf_cfg)
    cfg = config_from_hf(hf_cfg, "bert")
    assert cfg.bidirectional and cfg.post_layernorm and cfg.gelu_exact
    assert cfg.token_type_vocab == 2 and cfg.layer_norm_eps == 1e-12
    _check_parity(model, cfg, "bert")


def test_bert_token_types_change_output():
    """token_type_ids flow into the embedding sum (segment embeddings)."""
    from sgpt_tpu.models import tiny as tiny_cfg
    cfg = tiny_cfg("bert")
    params = init_params(cfg, __import__("jax").random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 9)), jnp.int32)
    mask = jnp.ones((2, 9), jnp.int32)
    h0 = np.asarray(forward(params, ids, mask, cfg))
    h1 = np.asarray(forward(params, ids, mask, cfg,
                            token_type_ids=jnp.ones((2, 9), jnp.int32)))
    assert np.abs(h0 - h1).max() > 1e-4


def test_bert_end_to_end_engine_and_trainer():
    """BERT drives the same EmbeddingEngine + ContrastiveTrainer surface the
    decoder families use (--modelname bert-base-uncased works in the BEIR/
    USEB drivers; training_nli_v2.py accepts any HF name)."""
    import jax
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.models import tiny as tiny_cfg
    from sgpt_tpu.tokenization import SimpleTokenizer
    from sgpt_tpu.training import ContrastiveTrainer, TrainConfig

    cfg = tiny_cfg("bert", vocab_size=256)
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=256)

    eng = EmbeddingEngine(params, cfg, tok, method="mean", batch_size=4,
                          max_seq_len=32, normalize_embeddings=True)
    emb = eng.encode([f"document {i} words" for i in range(5)])
    assert emb.shape == (5, 64) and np.isfinite(emb).all()

    batch = [(f"anchor {i}", f"positive {i}") for i in range(4)]
    t = ContrastiveTrainer(params, cfg, tok,
                           TrainConfig(batch_size=4, max_seq_len=16, lr=1e-3,
                                       pooling="mean"))
    out = t.fit(lambda: iter([batch, batch]), steps_per_epoch=2)
    losses = [h["loss"] for h in out["history"] if "loss" in h]
    assert len(losses) == 2 and all(np.isfinite(losses))
