from .mesh import build_mesh, mesh_from_settings
from .sharded import shard_corpus_rows, sharded_dense_topk
from .sharded_engine import ShardedDenseEngine

__all__ = ["ShardedDenseEngine", "build_mesh", "mesh_from_settings",
           "shard_corpus_rows", "sharded_dense_topk"]
