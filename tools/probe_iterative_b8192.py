"""Batch-size lever at 1M: B=8192 vs the shipped SCALE_BATCH=4096.

probe_iterative_levers2.py landed h2w0+pool100 (recall-neutral, 1M
8,579 -> 8,960 q/s) but the 10k bar at 1M is still ~10% away and the
remaining per-batch cost is the two device programs' floor. A larger
bucket amortizes per-dispatch overheads (tunnel RTT, transfer latency,
program launch) over 2x the queries; the compact graph path is
N-independent in memory, so B=8192 fits at 1M.

Run:  python tools/probe_iterative_b8192.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import (  # noqa: E402
    SCALE_BATCH,
    make_engine,
    SCALE_TERM_TOPM,
    SCALE_COMPACT_CAP,
)
from tools.probe_iterative_levers import eval_variant  # noqa: E402


def main():
    from a_modular_rag_framework_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,), np.float32)))
    print(f"device_init: {time.time() - t0:.1f}s", flush=True)

    from a_modular_rag_framework_tpu.core.dataset_loader import (
        SyntheticHotpotQALoader,
    )
    from a_modular_rag_framework_tpu.index.packed import PackedIndex

    cache = Path(__file__).resolve().parents[1] / "data" / "bench_cache_1m"
    idx = PackedIndex.load(cache)
    samples = SyntheticHotpotQALoader(
        {"count": SCALE_BATCH, "seed": 0, "n_distractors": 8,
         "collide_entities": True}).load()

    results = {"n_docs": idx.n_docs}
    for B in (4096, 8192):
        engine = make_engine(idx, B, bm25_term_topm=SCALE_TERM_TOPM,
                             graph_compact_cap=SCALE_COMPACT_CAP,
                             dense_impl="auto",
                             hop2_graph_window=0, hop2_pool_k=100)
        rec, qps = eval_variant(engine, samples, B, hop1_inspect=20)
        results[f"b{B}"] = {"recall_at_10": round(rec, 4),
                            "qps": round(qps, 1)}
        print(f"[1m] B={B}: recall {rec:.4f} qps {qps:.1f}", flush=True)
        del engine

    Path("docs/PROBE_ITER_B8192.json").write_text(
        json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
