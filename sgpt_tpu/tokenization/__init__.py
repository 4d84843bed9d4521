from .base import Tokenizer, SimpleTokenizer, HFTokenizer, get_tokenizer
from .specb import SpecbCodec, BatchEncoding, encode_batch

__all__ = ["Tokenizer", "SimpleTokenizer", "HFTokenizer", "get_tokenizer",
           "SpecbCodec", "BatchEncoding", "encode_batch"]
