"""A/B the iterative 2-hop mode's hop-2 program (VERDICT r4 item 4).

Hypothesis: hop-2 queries already name the bridge entity, so the cross-doc
second graph wave is redundant device work in the hop-2 program —
`EngineConfig.hop2_graph_window=1` should raise iterative q/s with recall
unchanged. Measures recall@10 + pipelined q/s for baseline vs h2w1 at the
13.2k headline corpus and the 101k colliding corpus in ONE process.

  python tools/ab_hop2.py [--skip-100k]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-100k", action="store_true")
    ap.add_argument("--hop2-window", type=int, default=1)
    args = ap.parse_args()

    from a_modular_rag_framework_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import (
        BATCH,
        CACHE_DIR,
        CACHE_DIR_100K,
        N_SAMPLES,
        N_SAMPLES_100K,
        SCALE_BATCH,
        attach_learned,
        build_or_load_index,
        iterative_eval,
        make_engine,
        make_scale_engine,
    )

    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,), jnp.float32)))
    print(f"device_init: {time.time() - t0:.1f}s", flush=True)

    out = {}
    rows = [("headline_13k", N_SAMPLES, CACHE_DIR, BATCH, False)]
    if not args.skip_100k:
        rows.append(("scale_100k", N_SAMPLES_100K, CACHE_DIR_100K,
                     SCALE_BATCH, True))
    for label, n, cache, batch, is_scale in rows:
        idx, samples, _ = build_or_load_index(n, cache, collide=is_scale)
        enc = None
        if is_scale:
            enc, _, _ = attach_learned(idx, cache)
        # baseline must explicitly pin hop2_graph_window=None: bench's
        # make_engine now defaults it to 1, so an empty-override arm would
        # silently measure h2w1 against itself (advisor r4, medium)
        for variant, overrides in (
                ("baseline", {"hop2_graph_window": None}),
                (f"h2w{args.hop2_window}",
                 {"hop2_graph_window": args.hop2_window})):
            if is_scale:
                engine = make_scale_engine(idx, encoder=enc, **overrides)
            else:
                engine = make_engine(idx, batch, **overrides)
            t0 = time.time()
            rec, qps = iterative_eval(engine, samples, batch)
            out[f"{label}/{variant}"] = {
                "recall_at_10": round(rec, 4),
                "iterative_2hop_qps": round(qps, 1) if qps else None,
                "wall_sec": round(time.time() - t0, 1),
            }
            print(json.dumps({f"{label}/{variant}":
                              out[f"{label}/{variant}"]}), flush=True)
            del engine
    print(json.dumps(out))


if __name__ == "__main__":
    main()
