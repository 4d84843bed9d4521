from .openai_embeddings import OpenAIRetriever
from .openai_search import construct_context, get_score, openai_search
from .openai_client import (OpenAIEmbedClient, fetch_beir_dataset,
                            fetch_useb_data)

__all__ = ["OpenAIRetriever", "construct_context", "get_score", "openai_search",
           "OpenAIEmbedClient", "fetch_beir_dataset", "fetch_useb_data"]
