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
    losses      — MultipleNegativesRankingLoss (+ distributed negatives), GradCache
    training    — contrastive fit loop, BitFit masking, schedules, checkpoints
    evaluation  — BEIR/USEB/STS metrics and harnesses
"""

__version__ = "0.1.0"
