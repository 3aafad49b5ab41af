"""Multi-channel score fusion on device.

Replaces the reference's dict-based fuse (retrieval_backend.py:296-372):
per-channel min-max normalization over each channel's own candidate pool,
alpha-weighted sum over the union, final top-k — one jitted program over
dense [N] channel scores with presence masks.

Exact semantics parity:
  - min-max is computed over PRESENT entries only (the channel's pool);
  - if vmax <= vmin the whole channel normalizes to 0 (reference
    _minmax_norm, retrieval_backend.py:296-301);
  - absent entries contribute 0 to the fused score;
  - the fused candidate set is the union of channel pools; entries present
    in no channel never reach the top-k (masked to -inf).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # plain float: jnp scalars can't be captured by pallas kernels


def minmax_normalize(scores: jax.Array, present: jax.Array) -> jax.Array:
    """Min-max over present entries; all-0 when the pool is degenerate."""
    big = jnp.float32(1e30)
    vmin = jnp.min(jnp.where(present, scores, big))
    vmax = jnp.max(jnp.where(present, scores, -big))
    span = vmax - vmin
    ok = span > 0
    normed = jnp.where(present, (scores - vmin) / jnp.where(ok, span, 1.0), 0.0)
    return jnp.where(ok, normed, jnp.zeros_like(scores))


@functools.partial(jax.jit, static_argnames=("k",))
def fuse_channels(
    channel_scores: jax.Array,  # [C, N] f32
    channel_present: jax.Array,  # [C, N] bool
    alphas: jax.Array,  # [C] f32
    *,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Return (top scores [k], top ids [k], normalized [C, N]).

    Padded output slots (union smaller than k) carry id -1.
    """
    normed = jax.vmap(minmax_normalize)(channel_scores, channel_present)
    fused = jnp.einsum("c,cn->n", alphas, normed)
    union = jnp.any(channel_present, axis=0)
    masked = jnp.where(union, fused, NEG_INF)
    top_s, top_i = jax.lax.top_k(masked, k)
    valid = top_s > NEG_INF / 2
    return (
        jnp.where(valid, top_s, 0.0),
        jnp.where(valid, top_i, -1).astype(jnp.int32),
        normed,
    )
