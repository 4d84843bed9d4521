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


def test_t5_encoder_parity():
    """T5 ENCODER backbone (RMSNorm, bucketed relative position bias,
    unscaled scores, no biases) vs HF T5EncoderModel — backs the ST fork's
    models.T5 token embedder (sentence_transformers/models/T5.py:36-46)."""
    from transformers import T5Config, T5EncoderModel
    hf_cfg = T5Config(
        vocab_size=257, d_model=64, num_layers=3, num_heads=4, d_kv=16,
        d_ff=256, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
    )
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg)
    cfg = config_from_hf(hf_cfg, "t5")
    assert cfg.norm_style == "rms" and cfg.relative_attention
    assert not cfg.scale_attn and cfg.mlp_activation == "relu"
    _check_parity(model, cfg, "t5")


def test_t5_gated_gelu_parity():
    """T5 v1.1 variant: gated-GELU MLP (wi_0/wi_1)."""
    from transformers import T5Config, T5EncoderModel
    hf_cfg = T5Config(
        vocab_size=257, d_model=64, num_layers=2, num_heads=4, d_kv=16,
        d_ff=256, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu",
    )
    torch.manual_seed(1)
    model = T5EncoderModel(hf_cfg)
    cfg = config_from_hf(hf_cfg, "t5")
    assert cfg.mlp_activation == "gated_gelu"
    _check_parity(model, cfg, "t5")


def test_clip_parity():
    """CLIP dual-tower vs HF CLIPModel: text (causal, quick-GELU, EOT pool,
    projection) and vision (patchify-as-matmul == strided Conv2d, class
    token, pre/post LN, projection). Backs the ST fork's models.CLIPModel
    (sentence_transformers/models/CLIPModel.py:20-46)."""
    from transformers import (CLIPConfig as HFCLIPConfig, CLIPModel,
                              CLIPTextConfig, CLIPVisionConfig)

    from sgpt_tpu.models.clip import (clip_config_from_hf, convert_hf_clip,
                                      encode_image, encode_text)

    hf_cfg = HFCLIPConfig(
        text_config_dict=None,
        projection_dim=24,
        text_config=CLIPTextConfig(
            vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            max_position_embeddings=16, projection_dim=24,
            # EOT must be the top vocab id (real CLIP: 49407) — HF pools at
            # the eos position it searches for, we pool at argmax(ids)
            eos_token_id=98, attention_dropout=0.0).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=48, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=192, image_size=12, patch_size=4,
            projection_dim=24, attention_dropout=0.0).to_dict(),
    )
    torch.manual_seed(0)
    model = CLIPModel(hf_cfg)
    model.eval()
    cfg = clip_config_from_hf(hf_cfg)
    params = convert_hf_clip(model.state_dict(), cfg)

    rng = np.random.default_rng(0)
    B, T = 3, 11
    # EOT (highest vocab id) appended like CLIP's tokenizer does
    ids = rng.integers(1, 98, size=(B, T)).astype(np.int32)
    lens = [11, 8, 5]
    mask = np.zeros((B, T), np.int32)
    for i, n in enumerate(lens):
        ids[i, n - 1] = 98
        ids[i, n:] = 0
        mask[i, :n] = 1
    pixels = rng.standard_normal((B, 3, 12, 12)).astype(np.float32)

    with torch.no_grad():
        ref_t = model.get_text_features(
            input_ids=torch.tensor(ids.astype(np.int64)),
            attention_mask=torch.tensor(mask.astype(np.int64))).numpy()
        ref_v = model.get_image_features(
            pixel_values=torch.tensor(pixels)).numpy()

    ours_t = np.asarray(encode_text(params, jnp.asarray(ids),
                                    jnp.asarray(mask), cfg))
    ours_v = np.asarray(encode_image(params, jnp.asarray(pixels), cfg))
    assert np.abs(ours_t - ref_t).max() < 2e-4, np.abs(ours_t - ref_t).max()
    assert np.abs(ours_v - ref_v).max() < 2e-4, np.abs(ours_v - ref_v).max()


def test_clip_encoder_mixed_batch():
    """ST CLIPModel runtime: mixed text/image list embeds in input order."""
    from sgpt_tpu.models.clip import CLIPEncoder, clip_tiny, init_clip_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    import jax

    cfg = clip_tiny()
    params = init_clip_params(cfg, jax.random.key(0))
    enc = CLIPEncoder(params, cfg, SimpleTokenizer(vocab_size=99),
                      normalize_embeddings=True)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (20, 30, 3)).astype(np.uint8)
    items = ["a cat photo", img, "a dog", img]
    out = enc.encode(items)
    assert out.shape == (4, cfg.projection_dim)
    assert np.allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
    # same image at positions 1 and 3 → identical embeddings; texts differ
    assert np.allclose(out[1], out[3])
    assert not np.allclose(out[0], out[2])
