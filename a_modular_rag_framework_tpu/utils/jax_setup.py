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


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    # Remote-compile TPU tunnels (axon) deadlock when the persistent cache
    # tries to serialize executables — measured: a trivial jit hangs. Only
    # enable the cache for locally-compiled backends.
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
        return
    try:
        import jax

        path = (cache_dir
                or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                or str(Path.home() / ".cache" / "amrf_tpu_jax_cache"))
        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every program, even fast-compiling ones
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never break startup over caching
        logger.debug("compilation cache setup failed: %r", e)
