"""JAX runtime setup: persistent compilation cache.

Under the remote-compile TPU tunnel a single program compile can take
minutes; the persistent cache makes every shape compile once per machine
instead of once per process. Called by the engine, system facade, bench and
CLIs; a no-op when the cache is already configured or unavailable.
"""
from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_DONE = False


def _host_fingerprint() -> str:
    """Short stable id for the HOST CPU's feature set.

    JAX's persistent-cache key does not include host machine features, so
    XLA:CPU AOT executables compiled on one machine load on another and
    can SIGILL (observed: a cache dir that survived a container move
    logged 'Target machine feature +prefer-no-gather is not supported on
    the host machine ... could lead to execution errors such as SIGILL').
    Namespacing the cache dir by the cpuinfo flags line keeps entries from
    a different host physically separate. TPU executables are unaffected
    either way (compiled for the device, not the host)."""
    import zlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return f"{zlib.crc32(line.encode()) & 0xffffffff:08x}"
    except OSError:
        pass
    import platform

    return platform.machine() or "unknown"


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    # Earlier remote-compile TPU tunnels (axon) deadlocked when the
    # persistent cache serialized executables; re-measured on the current
    # tunnel: writes and cross-process hits both work (cold 13k-corpus
    # program ~330s -> warm ~seconds). Keep an escape hatch in case a
    # future tunnel regresses.
    if os.environ.get("AMRF_DISABLE_JAX_CACHE") == "1":
        return
    try:
        import jax

        # numeric sanitizer (SURVEY §5 "race detection/sanitizers" TPU
        # equivalent): fail fast on NaN/Inf escaping any jitted program
        if os.environ.get("AMRF_DEBUG_NANS") == "1":
            jax.config.update("jax_debug_nans", True)

        path = (cache_dir
                or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or str(Path.home() / ".cache" / "amrf_tpu_jax_cache"
                       / _host_fingerprint()))
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program, even fast-compiling ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never break startup over caching
        logger.debug("compilation cache setup failed: %r", e)
