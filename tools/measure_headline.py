"""Quick headline re-measurement: pipelined/sequential/device q/s on the
bench corpus, without the bench's quality/scale/serving stages. Use after
host-path changes to see the throughput effect in one TPU session
(device-session establishment costs minutes through the tunnel — batch
every measurement you need into this one process).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    BATCH, CACHE_DIR, N_SAMPLES, build_or_load_index, make_engine,
    measure_throughput,
)


def main() -> None:
    from a_modular_rag_framework_tpu.utils.jax_setup import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    idx, samples, _ = build_or_load_index(N_SAMPLES, CACHE_DIR)
    engine = make_engine(idx, BATCH)
    questions = [s["question"] for s in samples[:BATCH]]
    questions = (questions * ((BATCH // len(questions)) + 1))[:BATCH]
    t0 = time.time()
    engine.query_batch(questions)
    print(f"first call: {time.time() - t0:.1f}s", flush=True)
    pipe, seq, device_ms = measure_throughput(engine, questions)
    print(f"pipelined_qps={pipe:.1f} sequential_qps={seq:.1f} "
          f"device_ms={device_ms:.1f} "
          f"device_qps={BATCH / (device_ms / 1e3):.1f}")


if __name__ == "__main__":
    main()
