from .query_engine import EngineConfig, QueryResult, TPUQueryEngine

__all__ = ["EngineConfig", "QueryResult", "TPUQueryEngine"]
