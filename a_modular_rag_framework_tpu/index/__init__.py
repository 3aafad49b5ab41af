from .corpus import SentenceCorpus, flatten_hotpotqa_context, read_docs_jsonl, write_docs_jsonl
from .packed import PackedIndex
from .builder import build_packed_index

__all__ = [
    "PackedIndex",
    "SentenceCorpus",
    "build_packed_index",
    "flatten_hotpotqa_context",
    "read_docs_jsonl",
    "write_docs_jsonl",
]
