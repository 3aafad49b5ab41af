"""A/B the two hop-program levers for the iterative mode at scale.

profile_iterative_scale.py's attribution: hop-1 (top_k=20 for bridge
inspection) costs MORE than hop-2, and the gap grows with N — while the
variant bucket E is a non-factor (mb2: identical recall, no speedup).
Levers measured here, per corpus (100k, 1M), recall + pipelined q/s:

  A  baseline             (bench parity: inspect=20, hop-2 pool 200)
  B  hop1_inspect=10      (hop-1 becomes the EXACT single-pass k=10
                           program — compile-cache warm from the bench)
  C  B + hop2_pool_k=100  (hop-2 names the bridge title; the gold doc
                           heads the pool, so parity width is dead work)

Run:  python tools/probe_iterative_levers.py [--skip-1m]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import (  # noqa: E402
    CACHE_DIR_100K,
    N_SAMPLES_100K,
    SCALE_BATCH,
    TOP_K,
    build_or_load_index,
    make_scale_engine,
)


def eval_variant(engine, samples, batch, *, hop1_inspect, depth=2,
                 trials=2):
    from a_modular_rag_framework_tpu.eval.harness import gold_hit_ids
    from a_modular_rag_framework_tpu.eval.metrics import recall_at_k
    from a_modular_rag_framework_tpu.modules.retrieval.multihop import (
        iterative_retrieve,
        iterative_retrieve_pipelined,
    )

    eval_qs = [s["question"] for s in samples[:128]]
    qs = (eval_qs * ((batch // len(eval_qs)) + 1))[:batch]
    out = iterative_retrieve(engine, qs, top_k=TOP_K,
                             hop1_inspect=hop1_inspect)
    ids = np.asarray(out[0])
    recalls = []
    for row, s in enumerate(samples[:128]):
        got = [engine.index.corpus.hit_id(int(i)) for i in ids[row] if i >= 0]
        recalls.append(recall_at_k(got, gold_hit_ids(s), TOP_K))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in iterative_retrieve_pipelined(engine, [qs] * depth,
                                              top_k=TOP_K,
                                              hop1_inspect=hop1_inspect):
            pass
        best = min(best, (time.time() - t0) / depth)
    return float(np.mean(recalls)), batch / best


def run_corpus(label, idx, samples, results):
    from dataclasses import replace

    engine = make_scale_engine(idx)
    row = {"n_docs": idx.n_docs, "batch": SCALE_BATCH}
    for name, inspect, h2pool in (("A_baseline", 20, None),
                                  ("B_inspect10", 10, None),
                                  ("C_inspect10_pool100", 10, 100)):
        engine.config = replace(engine.config, hop2_pool_k=h2pool)
        rec, qps = eval_variant(engine, samples, SCALE_BATCH,
                                hop1_inspect=inspect)
        row[name] = {"recall_at_10": round(rec, 4), "qps": round(qps, 1)}
        print(f"[{label}] {name}: recall {rec:.4f} qps {qps:.1f}",
              flush=True)
    results[label] = row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-1m", action="store_true")
    ap.add_argument("--out", default="docs/PROBE_ITER_LEVERS.json")
    args = ap.parse_args()

    from a_modular_rag_framework_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,), np.float32)))
    print(f"device_init: {time.time() - t0:.1f}s", flush=True)

    results = {}
    idx1, samples1, _ = build_or_load_index(N_SAMPLES_100K, CACHE_DIR_100K,
                                            collide=True)
    run_corpus("scale_100k", idx1, samples1, results)

    if not args.skip_1m:
        from a_modular_rag_framework_tpu.core.dataset_loader import (
            SyntheticHotpotQALoader,
        )
        from a_modular_rag_framework_tpu.index.packed import PackedIndex

        cache = Path(__file__).resolve().parents[1] / "data" / "bench_cache_1m"
        if (cache / "manifest.json").exists():
            idxl = PackedIndex.load(cache)
            samplesl = SyntheticHotpotQALoader(
                {"count": SCALE_BATCH, "seed": 0, "n_distractors": 8,
                 "collide_entities": True}).load()
            run_corpus("scale_1m", idxl, samplesl, results)

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
