"""One-session TPU measurement of the iterative-mode host-prep pass.

Batches everything needing the device into one process (device-session
establishment costs minutes through the tunnel): single-pass pipelined
headline (regression guard), iterative pipelined q/s (the pass's
target), and the steady-state exact top-k probes (warms their compile
cache for the recorded bench run).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    BATCH, CACHE_DIR, N_SAMPLES, TOP_K, build_or_load_index, make_engine,
    measure_throughput,
)


def main() -> None:
    import numpy as np

    from a_modular_rag_framework_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,), jnp.float32)))
    print(f"device_init: {time.time() - t0:.1f}s", flush=True)

    idx, samples, _ = build_or_load_index(N_SAMPLES, CACHE_DIR)
    engine = make_engine(idx, BATCH)
    questions = [s["question"] for s in samples[:BATCH]]
    questions = (questions * ((BATCH // len(questions)) + 1))[:BATCH]
    t0 = time.time()
    engine.query_batch(questions)
    print(f"first engine call: {time.time() - t0:.1f}s", flush=True)

    pipe, seq, device_ms = measure_throughput(engine, questions)
    print(f"single-pass: pipelined_qps={pipe:.1f} sequential_qps={seq:.1f} "
          f"device_ms={device_ms:.1f} "
          f"device_qps={BATCH / (device_ms / 1e3):.1f}", flush=True)

    from a_modular_rag_framework_tpu.modules.retrieval.multihop import (
        iterative_retrieve,
        iterative_retrieve_pipelined,
    )

    it_qs = questions
    t0 = time.time()
    iterative_retrieve(engine, it_qs, top_k=TOP_K)  # warm hop-2 program
    print(f"iterative warm: {time.time() - t0:.1f}s", flush=True)
    it_depth = 4
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in iterative_retrieve_pipelined(engine, [it_qs] * it_depth,
                                              top_k=TOP_K):
            pass
        best = min(best, (time.time() - t0) / it_depth)
    print(f"iterative: pipelined_qps={BATCH / best:.1f} "
          f"({best * 1e3:.1f} ms/batch)", flush=True)

    from bench import dense_probe_steady

    print("steady probes:", dense_probe_steady(), flush=True)


if __name__ == "__main__":
    main()
