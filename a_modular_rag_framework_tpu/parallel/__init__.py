from .mesh import build_mesh, mesh_from_settings
from .sharded import shard_corpus_rows, sharded_dense_topk

__all__ = ["build_mesh", "mesh_from_settings", "shard_corpus_rows", "sharded_dense_topk"]
