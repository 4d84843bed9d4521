"""sgpt_tpu — a TPU-native embed→index→query engine with the capabilities of SGPT.

Built from scratch in JAX/XLA/Pallas/pjit (not a port of the reference's
torch/sentence-transformers stack). See SURVEY.md at the repo root for the
reference analysis this framework is built against.

Public surface:
    models      — GPT decoder forwards (GPT-Neo / GPT-J / BLOOM), HF weight import
    ops         — pooling, similarity, top-k retrieval, log-prob scoring, Pallas kernels
    parallel    — device mesh + partition specs (dp/tp) for pjit
    tokenization— tokenizer protocol, SPECB bracket semantics
    encoder     — EmbeddingEngine: jit-compiled batched encode with length bucketing
    retrieval   — DenseRetriever: sharded brute-force MIPS with on-device top-k merge
    crossencoder— zero-shot log-prob reranker
    modules     — upstream ST word-level modules (WordEmbeddings/BoW/CNN/LSTM)
    losses      — MultipleNegativesRankingLoss (+ distributed negatives), GradCache
    training    — contrastive fit loop, BitFit masking, schedules, checkpoints
    evaluation  — BEIR/USEB/STS metrics and harnesses
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports (keep `import sgpt_tpu` light)."""
    lazy = {
        "SGPTModel": ("sgpt_tpu.model", "SGPTModel"),
        "AsymModel": ("sgpt_tpu.model", "AsymModel"),
        "EmbeddingEngine": ("sgpt_tpu.encoder", "EmbeddingEngine"),
        "DenseRetriever": ("sgpt_tpu.retrieval", "DenseRetriever"),
        "DenseIndex": ("sgpt_tpu.index", "DenseIndex"),
        "IVFIndex": ("sgpt_tpu.index_ivf", "IVFIndex"),
        "BM25Retriever": ("sgpt_tpu.retrieval_bm25", "BM25Retriever"),
        "CrossEncoderRanker": ("sgpt_tpu.crossencoder", "CrossEncoderRanker"),
        "YesNoRanker": ("sgpt_tpu.crossencoder", "YesNoRanker"),
        "SearchService": ("sgpt_tpu.serving", "SearchService"),
        "MicroBatcher": ("sgpt_tpu.serving", "MicroBatcher"),
        "ContrastiveTrainer": ("sgpt_tpu.training", "ContrastiveTrainer"),
        "TrainConfig": ("sgpt_tpu.training", "TrainConfig"),
    }
    if name in lazy:
        import importlib
        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'sgpt_tpu' has no attribute {name!r}")
