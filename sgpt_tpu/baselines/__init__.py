from .openai_embeddings import OpenAIRetriever
from .openai_search import construct_context, get_score, openai_search

__all__ = ["OpenAIRetriever", "construct_context", "get_score", "openai_search"]
