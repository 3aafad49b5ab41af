"""Concurrent query serving: a micro-batching front for the query engine.

BASELINE.json config 5's serving story: many concurrent callers, one
device-resident index. Requests land in a queue; a dispatcher thread drains
up to ``max_batch`` at a time into a single engine call (bucketed shapes
mean no recompiles), and futures resolve per-caller. The host agent loop
never starves the device: while one batch executes, the next accumulates.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import CancelledError, Future
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from ..core.dto import Hit


@dataclass
class _Request:
    query: str
    expansions: Optional[Sequence[str]]
    seed_rows: Optional[Sequence[int]]
    top_k: Optional[int]
    graph_window: Optional[int]
    mode: str = "single"  # "single" | "iterative" (bridge-entity 2-hop)
    future: Future = field(default_factory=Future)


class _Resolved:
    """Adapter giving already-computed results the PendingQuery surface."""

    def __init__(self, result: Any):
        self._result = result

    def result(self) -> Any:
        return self._result


class QueryServer:
    """Thread-safe micro-batching wrapper around `TPUQueryEngine`.

    Usage:
        server = QueryServer(engine, max_batch=64)
        server.start()
        fut = server.submit("who wrote x")
        hits = fut.result()   # List[Hit]
        server.stop()
    """

    def __init__(self, engine, *, max_batch: int = 64,
                 max_wait_ms: float = 2.0):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self._q: "queue.Queue[_Request]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.stats: Dict[str, Any] = {"batches": 0, "queries": 0,
                                      "batch_sizes": []}

    # ---- lifecycle ----

    def start(self) -> "QueryServer":
        if self._thread is not None:
            return self
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="query-server")
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        # reject anything still queued so no caller hangs on .result()
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(
                    CancelledError("QueryServer stopped before dispatch")
                )

    def __enter__(self) -> "QueryServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # ---- client API ----

    def submit(
        self,
        query: str,
        *,
        expansions: Optional[Sequence[str]] = None,
        seed_rows: Optional[Sequence[int]] = None,
        top_k: Optional[int] = None,
        graph_window: Optional[int] = None,
        mode: str = "single",
    ) -> Future:
        """Returns a Future resolving to List[Hit]. ``mode="iterative"``
        serves the bridge-entity 2-hop quality mode (multihop.py) through
        the same micro-batching dispatch loop."""
        if mode not in ("single", "iterative"):
            raise ValueError(f"unknown mode {mode!r} "
                             "(expected single | iterative)")
        req = _Request(query=query, expansions=expansions, seed_rows=seed_rows,
                       top_k=top_k, graph_window=graph_window, mode=mode)
        self._q.put(req)
        return req.future

    def query(self, query: str, **kw) -> List[Hit]:
        return self.submit(query, **kw).result()

    # ---- dispatcher ----

    def _drain(self) -> List[_Request]:
        batch: List[_Request] = []
        try:
            batch.append(self._q.get(timeout=0.05))
        except queue.Empty:
            return batch
        deadline = time.time() + self.max_wait_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                batch.append(self._q.get(timeout=timeout))
            except queue.Empty:
                break
        return batch

    def _finish(self, pending: Any, reqs: List[_Request]) -> None:
        try:
            result = pending.result()
            for i, r in enumerate(reqs):
                r.future.set_result(self.engine.hydrate_hits(result, i))
            self.stats["batches"] += 1
            self.stats["queries"] += len(reqs)
            self.stats["batch_sizes"].append(len(reqs))
        except Exception as e:  # pragma: no cover
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)

    def _loop(self) -> None:
        import collections

        # keep one batch in flight: dispatch group i+1 before fetching
        # group i's results, so host hydration overlaps device execution
        # (engines without query_batch_async resolve synchronously)
        dispatch_async = getattr(self.engine, "query_batch_async", None)
        inflight: "collections.deque" = collections.deque()
        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                while inflight:
                    self._finish(*inflight.popleft())
                continue
            # requests sharing (top_k, window, seed-mode) can share a program;
            # group to keep shapes uniform
            groups: Dict[Any, List[_Request]] = {}
            for r in batch:
                key = (r.top_k, r.graph_window, r.seed_rows is not None,
                       r.mode)
                groups.setdefault(key, []).append(r)
            for (top_k, window, has_seeds, mode), reqs in groups.items():
                kwargs = dict(
                    expansions=[list(r.expansions or []) for r in reqs],
                    seed_rows=([list(r.seed_rows or []) for r in reqs]
                               if has_seeds else None),
                    top_k=top_k,
                    graph_window=window,
                )
                queries = [r.query for r in reqs]
                try:
                    if mode == "iterative":
                        from ..modules.retrieval.multihop import (
                            IterativePending,
                        )

                        k_eff = int(top_k or self.engine.config.top_k)
                        p1 = (dispatch_async or self.engine.query_batch)(
                            queries, top_k=max(k_eff, 20),
                            expansions=kwargs["expansions"],
                            seed_rows=kwargs["seed_rows"],
                            graph_window=window)
                        if dispatch_async is None:
                            p1 = _Resolved(p1)
                        inflight.append((IterativePending(
                            self.engine, queries, p1, top_k=k_eff,
                            graph_window=window), reqs))
                    elif dispatch_async is not None:
                        inflight.append((dispatch_async(queries, **kwargs),
                                         reqs))
                    else:
                        result = self.engine.query_batch(queries, **kwargs)
                        self._finish(_Resolved(result), reqs)
                except Exception as e:  # pragma: no cover
                    for r in reqs:
                        if not r.future.done():
                            r.future.set_exception(e)
                while len(inflight) > 1:
                    self._finish(*inflight.popleft())
            # nothing else queued: resolve immediately rather than letting a
            # lone synchronous caller wait out the next drain timeout
            # (~50ms) — pipelining only pays under sustained load anyway
            if self._q.empty():
                while inflight:
                    self._finish(*inflight.popleft())
        while inflight:
            self._finish(*inflight.popleft())
