from .batching import InputExample, NoDuplicatesBatcher
from .nli import build_nli_triplets, load_nli_tsv
from .msmarco import MSMARCOTriplets

__all__ = ["InputExample", "NoDuplicatesBatcher", "build_nli_triplets",
           "load_nli_tsv", "MSMARCOTriplets"]
