"""Round 2 of the iterative-mode lever A/B: hop-2 graph window.

probe_iterative_levers.py showed inspect=10 buys ~+7-10% q/s but costs
~0.01 recall (VERDICT's bar is recall UNCHANGED), and the hop-2 pool
width is a non-factor — so hop-2's remaining cost is dominated by its
graph wave. Hop-2 queries name the bridge title and carry the question's
predicate tokens, so BM25 lands directly on the gold sentence; the wave
may be fully redundant there. Variants (all hop1_inspect=20 = parity):

  A  baseline            (hop2_graph_window=1, the shipped scale config)
  D  h2w0                (hop-2 runs NO graph wave)
  E  h2w0 + hop2_pool_k=100
  F  E + inspect10       (max-speed reference, known -0.01 recall)

Run:  python tools/probe_iterative_levers2.py [--skip-1m]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import (  # noqa: E402
    CACHE_DIR_100K,
    N_SAMPLES_100K,
    SCALE_BATCH,
    build_or_load_index,
    make_scale_engine,
)
from tools.probe_iterative_levers import eval_variant  # noqa: E402


def run_corpus(label, idx, samples, results):
    from dataclasses import replace

    engine = make_scale_engine(idx)
    row = {"n_docs": idx.n_docs, "batch": SCALE_BATCH}
    for name, inspect, h2w, h2pool in (
            ("A_baseline", 20, 1, None),
            ("D_h2w0", 20, 0, None),
            ("E_h2w0_pool100", 20, 0, 100),
            ("F_E_inspect10", 10, 0, 100)):
        engine.config = replace(engine.config, hop2_graph_window=h2w,
                                hop2_pool_k=h2pool)
        rec, qps = eval_variant(engine, samples, SCALE_BATCH,
                                hop1_inspect=inspect)
        row[name] = {"recall_at_10": round(rec, 4), "qps": round(qps, 1)}
        print(f"[{label}] {name}: recall {rec:.4f} qps {qps:.1f}",
              flush=True)
    results[label] = row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-1m", action="store_true")
    ap.add_argument("--out", default="docs/PROBE_ITER_LEVERS2.json")
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
