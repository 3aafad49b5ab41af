"""Sharded dense retrieval: corpus rows over the ``data`` mesh axis.

The index-sharding design of SURVEY.md §2b: the corpus embedding matrix is
row-sharded across devices (`NamedSharding` on axis 0); queries are
replicated; each device computes a local fused matmul+top-k over its shard;
per-shard candidates are merged into global top-k with one `all_gather`
over ICI. No [B, N] score matrix ever exists, on any chip.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import dense_topk_xla, _iterative_topk  # noqa: F401


def shard_corpus_rows(emb, mesh: Mesh, axis: str = "data"):
    """Place [N, d] corpus embeddings row-sharded over ``axis``.

    N must divide evenly by the axis size (pad with zero rows upstream)."""
    return jax.device_put(emb, NamedSharding(mesh, P(axis, None)))


def sharded_dense_topk(
    q: jax.Array,
    emb_sharded: jax.Array,
    k: int,
    mesh: Mesh,
    axis: str = "data",
    precision=None,
) -> Tuple[jax.Array, jax.Array]:
    """Global top-k over a row-sharded corpus.

    Per shard: local scores [B, N/s] -> local top-k (ids offset to global
    rows) -> all_gather over ``axis`` -> merge [B, s*k] -> global top-k.
    The gather moves only s*k candidates per query, not the score matrix.
    """
    n_shards = mesh.shape[axis]
    local_rows = emb_sharded.shape[0] // n_shards

    def local_fn(q_rep, emb_local):
        s, i = dense_topk_xla(q_rep, emb_local, k, precision=precision)
        offset = jax.lax.axis_index(axis).astype(jnp.int32) * local_rows
        i = jnp.where(i >= 0, i + offset, -1)
        # gather every shard's candidates: [s, B, k] -> merge on each device
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        B = q_rep.shape[0]
        cat_s = jnp.moveaxis(all_s, 0, 1).reshape(B, n_shards * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(B, n_shards * k)
        top_s, top_i = jax.lax.top_k(cat_s, k)
        picked = jnp.take_along_axis(cat_i, top_i, axis=1)
        return top_s, picked

    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(), P(axis, None)),
            out_specs=(P(), P()),
            # outputs are value-replicated after the all_gather+merge, but
            # the static checker can't prove it (axis_index taints them)
            check_vma=False,
        )
    )
    return fn(q, emb_sharded)
