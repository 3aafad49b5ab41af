from .flow import RetrievalAgentFlow
from .tpu_backend import TPUHybridRetrievalBackend
from .retrieval_adapter import RetrievalAdapter

__all__ = ["RetrievalAdapter", "RetrievalAgentFlow", "TPUHybridRetrievalBackend"]
