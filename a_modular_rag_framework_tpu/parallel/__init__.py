from .mesh import build_mesh, mesh_from_settings
from .sharded import shard_corpus_rows, sharded_dense_topk
from .sharded_engine import ShardedDenseEngine
from .sharded_hybrid import ShardedHybridEngine, shard_hybrid_arrays

__all__ = ["ShardedDenseEngine", "ShardedHybridEngine", "build_mesh",
           "mesh_from_settings", "shard_corpus_rows", "shard_hybrid_arrays",
           "sharded_dense_topk"]
