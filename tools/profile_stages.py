"""Per-stage device timing of the hybrid query program (VERDICT r1 item 3).

Times stage-truncated jits of the engine program on the bench corpus so the
dominant stage is identified before optimizing. Run on the TPU:

  python tools/profile_stages.py [--batch 512] [--n_samples 600]
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


def _fetch(out):
    # time through a host fetch: under the remote tunnel
    # jax.block_until_ready can return before execution completes
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)
        break


def timeit(fn, *args, reps=5):
    _fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _fetch(fn(*args))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n_samples", type=int, default=600)
    ap.add_argument("--pool_k", type=int, default=200)
    ap.add_argument("--window", type=int, default=2)
    ap.add_argument("--term_topm", type=int, default=32)
    ap.add_argument("--prune", type=float, default=0.05,
                    help="query_df_ratio_max (0 = off)")
    args = ap.parse_args()

    from a_modular_rag_framework_tpu.core.dataset_loader import SyntheticHotpotQALoader
    from a_modular_rag_framework_tpu.engine.query_engine import EngineConfig, TPUQueryEngine
    from a_modular_rag_framework_tpu.index.builder import build_packed_index
    from a_modular_rag_framework_tpu.index.corpus import SentenceCorpus
    from a_modular_rag_framework_tpu.ops.bm25 import bm25_rescore_pool, bm25_topk_sorted
    from a_modular_rag_framework_tpu.ops.graph import expand_frontier_weighted

    samples = SyntheticHotpotQALoader({"count": args.n_samples, "seed": 0,
                                       "n_distractors": 8,
                                       "unique_entities": True}).load()
    corpus = SentenceCorpus.from_hotpotqa(samples)
    idx = build_packed_index(corpus, embed_dim=64, embed_dtype="bfloat16")
    B, pool_k, window = args.batch, args.pool_k, args.window
    cfg = EngineConfig(top_k=10, pool_k=pool_k, graph_window=window,
                       batch_buckets=(B,), bm25_term_topm=args.term_topm,
                       bm25_posting_cap=1024,
                       query_df_ratio_max=args.prune)
    engine = TPUQueryEngine(idx, config=cfg)
    n = idx.n_docs
    print(f"N={n} B={B} pool_k={pool_k} window={window} "
          f"deg={np.asarray(engine._nbrs).shape[1]}", file=sys.stderr)

    questions = [s["question"] for s in samples[:B]]
    questions = (questions * ((B // len(questions)) + 1))[:B]
    if engine._high_df_terms:
        questions = [engine._prune_query(q) for q in questions]
    variants = [[q] for q in questions]
    q_emb, term_ids = engine.encode_queries(variants, n_variants=1)
    used_t = int((term_ids >= 0).any(axis=(0, 1)).nonzero()[0].max() + 1)
    T_eff = 8
    while T_eff < used_t:
        T_eff *= 2
    term_ids = jnp.asarray(term_ids[:, :, :T_eff])
    q_emb = jnp.asarray(q_emb)
    bm = engine._bm25
    emb = engine._emb
    nbrs = engine._nbrs
    topm = min(cfg.bm25_term_topm, int(bm["doc_ids"].shape[0]))
    print(f"T_eff={T_eff}", file=sys.stderr)

    # full program for the end-to-end anchor
    r = engine.query_batch(questions)
    full_ms = timeit(lambda t: engine.query_batch(questions), term_ids)
    # NB: query_batch includes host encode; device_ms from diagnostics
    dev_ms = engine.query_batch(questions).diagnostics["device_ms"]

    @jax.jit
    def stage_phase1(tid):
        return bm25_topk_sorted(tid, bm["doc_ids"], bm["scores"],
                                bm["row_ptr"], n_docs=n, term_topm=topm,
                                pool_k=pool_k)

    @jax.jit
    def stage_rescore(tid):
        s, i = bm25_topk_sorted(tid, bm["doc_ids"], bm["scores"],
                                bm["row_ptr"], n_docs=n, term_topm=topm,
                                pool_k=pool_k)
        return bm25_rescore_pool(i, tid, bm["doc_terms_padded"],
                                 bm["doc_scores_padded"], n_docs=n), i

    @jax.jit
    def stage_dense(tid, q):
        s, i = stage_rescore.__wrapped__(tid)
        valid = (s > 0) & (i >= 0)
        qn = q / jnp.maximum(
            jnp.sqrt(jnp.sum(q * q, axis=1, keepdims=True)), 1e-9)
        pe = jnp.take(emb, jnp.where(valid, i, 0), axis=0)
        d = jnp.einsum("bd,bkd->bk", qn, pe.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        return jnp.where(valid, d, 0.0)

    @jax.jit
    def stage_seeds(tid):
        s, i = stage_rescore.__wrapped__(tid)
        S_eff = min(cfg.max_seed_rows, pool_k)
        top_seed_s, seed_pos = jax.lax.top_k(s, S_eff)
        top_seed_i = jnp.take_along_axis(i, seed_pos, axis=1)
        rows_s = jnp.broadcast_to(jnp.arange(B)[:, None], (B, S_eff))
        ok = (top_seed_s > 0) & (top_seed_i >= 0)
        denom = jnp.maximum(top_seed_s[:, :1], 1e-9)
        vals = jnp.where(ok, top_seed_s / denom, 0.0)
        return (jnp.zeros((B, n + 1), dtype=jnp.float32)
                .at[rows_s, jnp.where(ok, top_seed_i, n)]
                .max(vals)[:, :n])

    @jax.jit
    def stage_expand(tid):
        seed_scores = stage_seeds.__wrapped__(tid)

        def one(sv):
            return expand_frontier_weighted(nbrs, sv, window=window)

        return jax.vmap(one)(seed_scores)

    @jax.jit
    def stage_gpool(tid):
        g = stage_expand.__wrapped__(tid)
        return jax.lax.top_k(g, min(pool_k, n))

    # print incrementally — remote compiles are minutes-scale and a timeout
    # mid-run must not lose the rows already measured
    print(f"{'stage':28s} {'ms':>9s} {'q/s':>9s}", flush=True)

    def row(name, fn, *a):
        ms = fn(*a) if callable(fn) else fn
        print(f"{name:28s} {ms:9.2f} {B / ms * 1e3:9.0f}", flush=True)

    row("FULL query_batch (e2e)", full_ms)
    row("FULL device_ms (diag)", dev_ms)
    row("bm25_phase1", lambda t: timeit(stage_phase1, t), term_ids)
    row("bm25_phase1+rescore", lambda t: timeit(stage_rescore, t), term_ids)
    row("..+dense", lambda t: timeit(stage_dense, t, q_emb), term_ids)
    row("..+seed_scatter", lambda t: timeit(stage_seeds, t), term_ids)
    row("..+graph_expand", lambda t: timeit(stage_expand, t), term_ids)
    row("..+graph_topk", lambda t: timeit(stage_gpool, t), term_ids)

    # ---- standalone stages not in the cumulative chain ----
    from a_modular_rag_framework_tpu.ops.fusion import fuse_pools_compact

    rng = np.random.default_rng(0)
    P = min(pool_k, n)
    pool_s = jnp.asarray(np.sort(rng.random((B, P)).astype(np.float32))[:, ::-1] + 1)
    pool_i = jnp.asarray(rng.integers(0, n, (B, P)).astype(np.int32))
    pool_v = jnp.ones((B, P), bool)
    dense_p = jnp.asarray(rng.random((B, P)).astype(np.float32))
    tg = jnp.asarray(rng.random((B, P)).astype(np.float32))
    g_s = jnp.asarray(np.sort(rng.random((B, P)).astype(np.float32))[:, ::-1])
    g_i = jnp.asarray(rng.integers(0, n, (B, P)).astype(np.int32))
    alphas = jnp.asarray([0.4, 0.2, 0.4], jnp.float32)

    @jax.jit
    def stage_fuse(ps, pi, dp, tgr, gs, gi):
        return fuse_pools_compact(ps, pi, pool_v, dp, tgr, gs, gi, pool_v,
                                  alphas=alphas, k=10, n=n)

    row("fusion (standalone)",
        lambda: timeit(stage_fuse, pool_s, pool_i, dense_p, tg, g_s, g_i))

    if hasattr(engine.encoder, "featurize") or hasattr(
            engine.encoder, "device_embed"):
        try:
            feat_a, feat_b = engine.encoder.featurize(questions)
            fa, fb = jnp.asarray(feat_a), jnp.asarray(feat_b)
            je = jax.jit(engine.encoder.device_embed)
            row("query embed (standalone)", lambda: timeit(je, fa, fb))
        except Exception as e:
            print(f"embed stage skipped: {e!r}", flush=True)


if __name__ == "__main__":
    main()
