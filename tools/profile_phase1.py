"""Substage attribution for bm25_topk_sorted (phase-1) at the bench shape.

Each stage-truncated jit returns a SMALL reduction of its intermediate so
fetch-timing doesn't drown in output transfer.

  python tools/profile_phase1.py [--batch 2048] [--n_samples 600]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--n_samples", type=int, default=600)
    ap.add_argument("--topm", type=int, default=32)
    ap.add_argument("--pool_k", type=int, default=200)
    args = ap.parse_args()

    from a_modular_rag_framework_tpu.core.dataset_loader import SyntheticHotpotQALoader
    from a_modular_rag_framework_tpu.engine.query_engine import EngineConfig, TPUQueryEngine
    from a_modular_rag_framework_tpu.index.builder import build_packed_index
    from a_modular_rag_framework_tpu.index.corpus import SentenceCorpus

    samples = SyntheticHotpotQALoader({"count": args.n_samples, "seed": 0,
                                       "n_distractors": 8,
                                       "unique_entities": True}).load()
    corpus = SentenceCorpus.from_hotpotqa(samples)
    idx = build_packed_index(corpus, embed_dim=64, embed_dtype="bfloat16")
    B = args.batch
    engine = TPUQueryEngine(idx, config=EngineConfig(
        top_k=10, pool_k=args.pool_k, graph_window=2, batch_buckets=(B,),
        bm25_term_topm=args.topm, query_df_ratio_max=0.05))
    questions = [s["question"] for s in samples[:B]]
    questions = (questions * ((B // len(questions)) + 1))[:B]
    questions = [engine._prune_query(q) for q in questions]
    term_ids = engine.encode_term_ids([[q] for q in questions], n_variants=1)
    used_t = int((term_ids >= 0).any(axis=(0, 1)).nonzero()[0].max() + 1)
    T = 8
    while T < used_t:
        T *= 2
    tid = jnp.asarray(term_ids[:, :, :T])
    bm = engine._bm25
    n, m = idx.n_docs, args.topm
    doc_ids = bm["doc_ids"]
    contribs = bm["scores"]
    row_ptr = bm["row_ptr"]
    print(f"N={n} B={B} T={T} m={m} postings={int(doc_ids.shape[0])}",
          file=sys.stderr)

    doc_ids_p = jnp.concatenate([doc_ids, jnp.full((m,), n, jnp.int32)])
    contribs_p = jnp.concatenate([contribs, jnp.zeros((m,), jnp.float32)])

    def windows(t):
        flat_t = t.reshape(-1)
        valid = flat_t >= 0
        t_safe = jnp.maximum(flat_t, 0)
        starts = row_ptr[t_safe]
        lengths = jnp.minimum(row_ptr[t_safe + 1] - starts, m)
        j = jnp.arange(m, dtype=jnp.int32)[None, :]
        win_idx = starts[:, None] + j
        docs_w = jnp.take(doc_ids_p, win_idx)
        c_w = jnp.take(contribs_p, win_idx)
        in_range = (j < lengths[:, None]) & valid[:, None]
        docs_w = jnp.where(in_range, docs_w, n)
        c_w = jnp.where(in_range, c_w, 0.0)
        W = T * m
        return docs_w.reshape(B, W), c_w.reshape(B, W)

    @jax.jit
    def s_gather(t):
        d, c = windows(t)
        return jnp.sum(c, axis=1)  # tiny output

    @jax.jit
    def s_sort(t):
        d, c = windows(t)
        ds, cs = jax.lax.sort((d, c), dimension=1, num_keys=1)
        return jnp.sum(cs * ds.astype(jnp.float32), axis=1)

    @jax.jit
    def s_scan(t):
        d, c = windows(t)
        ds, cs = jax.lax.sort((d, c), dimension=1, num_keys=1)
        idx2 = jax.lax.broadcasted_iota(jnp.int32, ds.shape, 1)
        boundary = jnp.concatenate(
            [jnp.ones((B, 1), bool), ds[:, 1:] != ds[:, :-1]], axis=1)
        c_cum = jnp.cumsum(cs, axis=1)
        start_idx = jax.lax.associative_scan(
            jnp.maximum, jnp.where(boundary, idx2, -1), axis=1)
        base = jnp.where(start_idx > 0,
                         jnp.take_along_axis(c_cum,
                                             jnp.maximum(start_idx - 1, 0),
                                             axis=1), 0.0)
        return jnp.sum(c_cum - base, axis=1)

    @jax.jit
    def s_topk(t):
        d, c = windows(t)
        ds, cs = jax.lax.sort((d, c), dimension=1, num_keys=1)
        idx2 = jax.lax.broadcasted_iota(jnp.int32, ds.shape, 1)
        boundary = jnp.concatenate(
            [jnp.ones((B, 1), bool), ds[:, 1:] != ds[:, :-1]], axis=1)
        c_cum = jnp.cumsum(cs, axis=1)
        start_idx = jax.lax.associative_scan(
            jnp.maximum, jnp.where(boundary, idx2, -1), axis=1)
        base = jnp.where(start_idx > 0,
                         jnp.take_along_axis(c_cum,
                                             jnp.maximum(start_idx - 1, 0),
                                             axis=1), 0.0)
        run_total = c_cum - base
        is_end = jnp.concatenate(
            [ds[:, 1:] != ds[:, :-1], jnp.ones((B, 1), bool)], axis=1)
        score_at = jnp.where(is_end & (ds < n), run_total, 0.0)
        K = min(args.pool_k, score_at.shape[1])
        vs, vp = jax.lax.top_k(score_at, K)
        return jnp.sum(vs, axis=1)

    print(f"{'substage':22s} {'ms':>9s}", flush=True)
    for name, fn in [("window gather", s_gather), ("+ sort", s_sort),
                     ("+ scan aggregate", s_scan), ("+ top_k", s_topk)]:
        print(f"{name:22s} {timeit(fn, tid):9.2f}", flush=True)


if __name__ == "__main__":
    main()
