"""Full-pipeline parity: EmbeddingEngine output == the reference's embed()
algorithm (beir_dense_retriever.py:158-306) replayed step-by-step in torch on
the same random-init HF model and the same tokenizer.

This is the zero-egress stand-in for pretrained score-parity tests (SURVEY.md
§4): everything except the checkpoint weights — tokenize, SPECB insertion,
truncation budget, padding, forward, pooling, normalize — is verified
numerically end to end.
"""
import numpy as np
import pytest

import jax

from sgpt_tpu.encoder import EmbeddingEngine
from sgpt_tpu.models import config_from_hf, convert_hf_state_dict
from sgpt_tpu.tokenization import SimpleTokenizer

torch = pytest.importorskip("torch")

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "semantic search with neural sentence embeddings works well",
    "short",
    "a somewhat longer document that will exercise padding across the batch "
    "with many extra words appended to make it longer than the others",
]


@pytest.fixture(scope="module")
def hf_and_ours():
    from transformers import GPTNeoConfig, GPTNeoModel

    hf_cfg = GPTNeoConfig(
        vocab_size=512, hidden_size=64, num_layers=3, num_heads=4,
        attention_types=[[["global", "local"], 1], [["global"], 1]],
        window_size=8, max_position_embeddings=64, intermediate_size=256,
        resid_dropout=0.0, embed_dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = GPTNeoModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg, "neo")
    params = convert_hf_state_dict(model.state_dict(), cfg, "neo")
    tok = SimpleTokenizer(vocab_size=512)
    return model, params, cfg, tok


def _reference_embed(model, tok, texts, *, is_query, specb, max_seq_len,
                     method="weightedmean"):
    """The reference algorithm: per-text tokenize → truncate to budget →
    brackets → pad-to-longest → forward → pool on hidden_states[-1]."""
    budget = max_seq_len - 2 if specb else max_seq_len
    rows = []
    for txt in texts:
        ids = tok.encode(txt)[:budget]
        if specb:
            br = ("[", "]") if is_query else ("{", "}")
            ids = tok.bracket_ids(br[0]) + ids + tok.bracket_ids(br[1])
        rows.append(ids)
    T = max(len(r) for r in rows)
    input_ids = torch.full((len(rows), T), tok.pad_id, dtype=torch.long)
    mask = torch.zeros((len(rows), T), dtype=torch.long)
    for i, r in enumerate(rows):
        input_ids[i, : len(r)] = torch.tensor(r)
        mask[i, : len(r)] = 1
    with torch.no_grad():
        out = model(input_ids=input_ids, attention_mask=mask,
                    output_hidden_states=True)
    hidden = out.hidden_states[-1]
    m = mask.unsqueeze(-1).float()
    if method == "weightedmean":
        w = torch.arange(1, T + 1).float().view(1, T, 1)
        emb = (hidden * m * w).sum(1) / (m * w).sum(1)
    else:
        emb = (hidden * m).sum(1) / m.sum(1)
    return emb.numpy()


@pytest.mark.parametrize("specb,is_query", [(False, False), (True, True),
                                            (True, False)])
def test_full_pipeline_parity(hf_and_ours, specb, is_query):
    model, params, cfg, tok = hf_and_ours
    engine = EmbeddingEngine(params, cfg, tok, method="weightedmean",
                             specb=specb, max_seq_len=64, batch_size=4)
    ours = engine.encode(TEXTS, is_query=is_query)
    ref = _reference_embed(model, tok, TEXTS, is_query=is_query, specb=specb,
                           max_seq_len=64)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_pipeline_parity_mean_pooling(hf_and_ours):
    model, params, cfg, tok = hf_and_ours
    engine = EmbeddingEngine(params, cfg, tok, method="mean", max_seq_len=64,
                             batch_size=4)
    ours = engine.encode(TEXTS)
    ref = _reference_embed(model, tok, TEXTS, is_query=False, specb=False,
                           max_seq_len=64, method="mean")
    np.testing.assert_allclose(ours, ref, atol=5e-4)
