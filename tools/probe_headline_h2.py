"""hop-2 window/pool trim A/B on the HEADLINE 13.2k corpus.

The scale rows ship hop2_graph_window=0 + hop2_pool_k=100 (recall-neutral
at 100k/1M, docs/PROBE_ITER_LEVERS2.json). The headline row and the
serving engines still run h2w1 — this A/Bs the same trim where the
headline iterative q/s and the served-iterative mode live. If recall@10
holds at 1.0, make_engine can ship it globally and serving inherits it.

Run:  python tools/probe_headline_h2.py
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from bench import (  # noqa: E402
    BATCH,
    CACHE_DIR,
    N_SAMPLES,
    build_or_load_index,
    make_engine,
)
from tools.probe_iterative_levers import eval_variant  # noqa: E402


def main():
    from dataclasses import replace

    from a_modular_rag_framework_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,), np.float32)))
    print(f"device_init: {time.time() - t0:.1f}s", flush=True)

    idx, samples, _ = build_or_load_index(N_SAMPLES, CACHE_DIR)
    engine = make_engine(idx, BATCH)
    results = {"n_docs": idx.n_docs, "batch": BATCH}
    for name, h2w, h2pool in (("h2w1", 1, None),
                              ("h2w0", 0, None),
                              ("h2w0_pool100", 0, 100)):
        engine.config = replace(engine.config, hop2_graph_window=h2w,
                                hop2_pool_k=h2pool)
        rec, qps = eval_variant(engine, samples, BATCH, hop1_inspect=20)
        results[name] = {"recall_at_10": round(rec, 4),
                         "qps": round(qps, 1)}
        print(f"[13k] {name}: recall {rec:.4f} qps {qps:.1f}", flush=True)

    Path("docs/PROBE_HEADLINE_H2.json").write_text(
        json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
