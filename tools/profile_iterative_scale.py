"""Stage attribution + A/B for the iterative 2-hop mode at corpus scale.

VERDICT r4 item 6: iterative_2hop_qps is 9.9k at 100k and 8.6k at 1M vs
the 10k bar. The identified suspects are the hop-2 program's sort width
(hop-2 dispatches 1 query + 2 expansion variants, which pads to the
power-of-two variant bucket E=4 — 4x hop-1's phase-1 BM25 sort width,
with one row always empty) and the per-batch bridge scan. This tool
measures, in ONE device session (session establishment costs minutes
through the tunnel):

  1. single-pass pipelined q/s (context),
  2. iterative pipelined q/s + recall@10 (baseline, bench-identical),
  3. per-stage wall: hop-1 program, hop-2 host prep, hop-2 program, merge,
  4. the same with hop-2 capped at 2 bridge variants (E=2),
  5. optionally the same on the 1M cache.

Run:  python tools/profile_iterative_scale.py [--one-m] [--out FILE]
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
    TOP_K,
    attach_learned,
    build_or_load_index,
    iterative_eval,
    make_scale_engine,
)


def stage_times(engine, qs, *, max_bridge_entities=4, reps=3):
    """Best-of wall per stage of one iterative batch (serialized, so the
    stage costs are visible; the pipelined q/s overlaps them)."""
    from a_modular_rag_framework_tpu.modules.retrieval.multihop import (
        _merge_hop2,
        _prep_and_dispatch_hop2,
    )

    out = {}
    best = {"hop1": float("inf"), "prep": float("inf"),
            "hop2_wait": float("inf"), "merge": float("inf")}
    for _ in range(reps):
        t0 = time.time()
        r1 = engine.query_batch(qs, top_k=max(TOP_K, 20))
        t1 = time.time()
        ctx, p2 = _prep_and_dispatch_hop2(
            engine, qs, r1, top_k=TOP_K, hop1_inspect=20,
            max_bridge_entities=max_bridge_entities, graph_window=None,
            trace_id="")
        t2 = time.time()
        r2 = p2.result() if p2 is not None else None
        t3 = time.time()
        _merge_hop2(qs, ctx, r2, top_k=TOP_K, hop_decay=0.5,
                    hop2_reserve=None)
        t4 = time.time()
        best["hop1"] = min(best["hop1"], t1 - t0)
        best["prep"] = min(best["prep"], t2 - t1)
        best["hop2_wait"] = min(best["hop2_wait"], t3 - t2)
        best["merge"] = min(best["merge"], t4 - t3)
    for k, v in best.items():
        out[f"{k}_ms"] = round(v * 1e3, 1)
    out["serial_qps"] = round(len(qs) / sum(best.values()), 1)
    return out


def run_corpus(label, idx, samples, enc, results):
    from a_modular_rag_framework_tpu.modules.retrieval.multihop import (
        iterative_retrieve,
    )

    engine = make_scale_engine(idx, encoder=enc)
    qs = [s["question"] for s in samples[:SCALE_BATCH]]
    qs = (qs * ((SCALE_BATCH // len(qs)) + 1))[:SCALE_BATCH]

    row = {"n_docs": idx.n_docs, "batch": SCALE_BATCH}
    t0 = time.time()
    rec, qps = iterative_eval(engine, samples, SCALE_BATCH)
    row["baseline"] = {"recall_at_10": round(rec, 4),
                       "qps": round(qps, 1),
                       "warm_s": round(time.time() - t0, 1)}
    print(f"[{label}] baseline iterative: recall {rec:.4f} "
          f"qps {qps:.1f}", flush=True)
    row["stages"] = stage_times(engine, qs)
    print(f"[{label}] stages: {row['stages']}", flush=True)

    # A/B: 2 bridge variants -> variant bucket E=2 (vs 3 variants -> E=4)
    iterative_retrieve(engine, qs, top_k=TOP_K,
                       max_bridge_entities=2)  # compile E=2 program
    rec2, qps2 = iterative_eval_mb(engine, samples, SCALE_BATCH, 2)
    row["mb2"] = {"recall_at_10": round(rec2, 4), "qps": round(qps2, 1)}
    print(f"[{label}] mb2 iterative: recall {rec2:.4f} qps {qps2:.1f}",
          flush=True)
    row["stages_mb2"] = stage_times(engine, qs, max_bridge_entities=2)
    print(f"[{label}] stages mb2: {row['stages_mb2']}", flush=True)
    results[label] = row


def iterative_eval_mb(engine, samples, batch, mb, *, depth=2, trials=2):
    """iterative_eval with max_bridge_entities plumbed (bench's helper
    pins the default)."""
    from a_modular_rag_framework_tpu.eval.harness import gold_hit_ids
    from a_modular_rag_framework_tpu.eval.metrics import recall_at_k
    from a_modular_rag_framework_tpu.modules.retrieval.multihop import (
        iterative_retrieve,
        iterative_retrieve_pipelined,
    )

    eval_qs = [s["question"] for s in samples[:128]]
    qs = (eval_qs * ((batch // len(eval_qs)) + 1))[:batch]
    out = iterative_retrieve(engine, qs, top_k=TOP_K,
                             max_bridge_entities=mb)
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
                                              max_bridge_entities=mb):
            pass
        best = min(best, (time.time() - t0) / depth)
    return float(np.mean(recalls)), batch / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one-m", action="store_true")
    ap.add_argument("--no-learned", action="store_true",
                    help="skip the learned-sidecar attach (its in-run "
                         "rebuild costs up to 900s; the encoder changes "
                         "doc embeddings, not program shape or cost, so "
                         "throughput attribution is valid with hash64)")
    ap.add_argument("--out", default="docs/PROFILE_ITER_SCALE.json")
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
    enc1, enc1_label = (None, "hash64") if args.no_learned else \
        attach_learned(idx1, CACHE_DIR_100K)[:2]
    print(f"100k loaded, encoder={enc1_label}", flush=True)
    run_corpus("scale_100k", idx1, samples1, enc1, results)

    if args.one_m:
        root = Path(__file__).resolve().parents[1]
        cache = root / "data" / "bench_cache_1m"
        if (cache / "manifest.json").exists():
            from a_modular_rag_framework_tpu.core.dataset_loader import (
                SyntheticHotpotQALoader,
            )
            from a_modular_rag_framework_tpu.index.packed import PackedIndex

            idxl = PackedIndex.load(cache)
            # same deterministic prefix load as bench's 1M row
            samplesl = SyntheticHotpotQALoader(
                {"count": SCALE_BATCH, "seed": 0, "n_distractors": 8,
                 "collide_entities": True}).load()
            encl, encl_label = (None, "hash64") if args.no_learned else \
        attach_learned(idxl, cache)[:2]
            print(f"1m loaded, encoder={encl_label}", flush=True)
            run_corpus("scale_1m", idxl, samplesl, encl, results)

    Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
