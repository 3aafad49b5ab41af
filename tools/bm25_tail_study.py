"""Quantify the sorted-BM25 tail approximation (VERDICT r1 item 7).

The scatter-free phase-1 pool selection windows each query term's postings
to its top-``term_topm`` contributions; common terms with longer posting
lists get truncated, so pool membership at the tail is approximate (exact
re-scoring of selected members is unaffected). This study measures, at a
~100k-row corpus, for term_topm in {32, 64, 128, 256}:

  - pool-membership overlap vs the exact oracle pool (numpy BM25);
  - end-to-end Recall@10 delta through the full fused program.

Run (CPU is fine — identical math):
  JAX_PLATFORMS=cpu python tools/bm25_tail_study.py [--n_samples 4600]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def bm25_exact_scores(texts, queries, k1=1.5, b=0.75):
    """Vectorized exact BM25 oracle over the full corpus."""
    from collections import Counter

    from a_modular_rag_framework_tpu.models.hash_embed import tokenize

    doc_tfs = [Counter(tokenize(t)) for t in texts]
    doc_lens = np.array([sum(c.values()) for c in doc_tfs], dtype=np.float64)
    N = len(texts)
    avgdl = doc_lens.mean() if N else 1.0
    df = Counter()
    for c in doc_tfs:
        df.update(c.keys())
    postings = {}
    for d, c in enumerate(doc_tfs):
        for t, f in c.items():
            postings.setdefault(t, []).append((d, f))

    out = np.zeros((len(queries), N), dtype=np.float64)
    for qi, q in enumerate(queries):
        for t in tokenize(q):
            n = df.get(t, 0)
            if not n:
                continue
            idf = np.log((N - n + 0.5) / (n + 0.5) + 1.0)
            for d, f in postings[t]:
                denom = f + k1 * (1 - b + b * doc_lens[d] / avgdl)
                out[qi, d] += idf * f * (k1 + 1) / denom
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_samples", type=int, default=4600)
    ap.add_argument("--n_queries", type=int, default=64)
    ap.add_argument("--pool_k", type=int, default=200)
    args = ap.parse_args()

    import jax.numpy as jnp

    from a_modular_rag_framework_tpu.core.dataset_loader import SyntheticHotpotQALoader
    from a_modular_rag_framework_tpu.engine.query_engine import EngineConfig, TPUQueryEngine
    from a_modular_rag_framework_tpu.eval.harness import evaluate_retrieval
    from a_modular_rag_framework_tpu.index.builder import build_packed_index
    from a_modular_rag_framework_tpu.index.corpus import SentenceCorpus
    from a_modular_rag_framework_tpu.ops.bm25 import bm25_topk_sorted

    samples = SyntheticHotpotQALoader({"count": args.n_samples, "seed": 0,
                                       "n_distractors": 8,
                                       "unique_entities": True}).load()
    corpus = SentenceCorpus.from_hotpotqa(samples)
    idx = build_packed_index(corpus, embed_dim=64, embed_dtype="bfloat16")
    texts = corpus.texts()
    n = idx.n_docs
    queries = [s["question"] for s in samples[: args.n_queries]]
    eval_slice = samples[:128]
    print(f"corpus: {n} rows; df max = "
          f"{int(np.diff(np.asarray(idx.bm25.row_ptr)).max())}", file=sys.stderr)

    t0 = time.time()
    exact = bm25_exact_scores(texts, queries)
    print(f"oracle: {time.time()-t0:.1f}s", file=sys.stderr)
    exact_pools = []
    for qi in range(len(queries)):
        order = np.argsort(-exact[qi], kind="stable")
        exact_pools.append({int(i) for i in order[: args.pool_k]
                            if exact[qi, i] > 0})

    base_engine = TPUQueryEngine(idx, config=EngineConfig(
        top_k=10, pool_k=args.pool_k, graph_window=2, batch_buckets=(128,)))
    tid = jnp.asarray(base_engine.encode_term_ids([[q] for q in queries],
                                                  n_variants=1))
    bm = base_engine._bm25

    print(f"{'term_topm':>9s} {'pool_overlap':>12s} {'missed@tail':>11s} "
          f"{'recall@10':>9s} {'mrr':>7s}")
    for topm in (32, 64, 128, 256):
        s, i = bm25_topk_sorted(tid, bm["doc_ids"], bm["scores"],
                                bm["row_ptr"], n_docs=n, term_topm=topm,
                                pool_k=args.pool_k)
        s, i = np.asarray(s), np.asarray(i)
        overlaps, missed = [], []
        for qi, ep in enumerate(exact_pools):
            if not ep:
                continue
            got = {int(x) for x in i[qi][s[qi] > 0]}
            overlaps.append(len(got & ep) / len(ep))
            missed.append(len(ep - got))
        engine = TPUQueryEngine(idx, config=EngineConfig(
            top_k=10, pool_k=args.pool_k, graph_window=2,
            bm25_term_topm=topm, batch_buckets=(128,)))
        q = evaluate_retrieval(engine, eval_slice, k=10, batch_size=128)
        print(f"{topm:9d} {np.mean(overlaps):12.4f} {np.mean(missed):11.1f} "
              f"{q['recall_at_10']:9.4f} {q['mrr']:7.4f}")


if __name__ == "__main__":
    main()
