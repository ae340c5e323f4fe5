"""HBM memory accounting: per-query contexts + a shared pool.

The reference tracks memory in a 3-level hierarchy (operator → task →
query pools; ``lib/trino-memory-context``, ``memory/MemoryPool.java``),
blocks or kills queries on pool exhaustion
(``memory/TotalReservationOnBlockedNodesLowMemoryKiller.java``), and
enforces per-query limits.  Static shapes make the TPU version simpler and
*predictable*: every operator output is a padded device buffer whose size
is known without any device sync (capacity × row width), so accounting is
exact at trace time.

* :class:`QueryMemoryContext` — per-query tree of operator reservations
  keyed by plan path; a parent's completion frees its consumed children
  (post-order execution means child buffers die when the parent
  materialises).  Enforces ``query_max_memory``.
* :class:`MemoryPool` — process-wide byte budget shared by concurrent
  queries; exhaustion triggers the low-memory killer (largest reservation
  dies, the reference's TotalReservation strategy).
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

Path = Tuple[int, ...]


class ExceededMemoryLimitError(Exception):
    pass


class QueryKilledError(Exception):
    pass


def batch_bytes(batch) -> int:
    """Device bytes of a RecordBatch (static: capacity x column widths)."""
    total = 0
    for c in batch.columns.values():
        cap = int(c.data.shape[0]) if c.data.ndim else 1
        total += cap * c.data.dtype.itemsize
        if c.validity is not None:
            total += cap  # bool byte per row
    return total


class QueryMemoryContext:
    """Per-query operator-level accounting (AggregatedMemoryContext analog)."""

    def __init__(self, query_id: str = "",
                 max_bytes: Optional[int] = None,
                 pool: Optional["MemoryPool"] = None):
        self.query_id = query_id
        self.max_bytes = max_bytes
        self.pool = pool
        self.entries: Dict[Path, int] = {}
        self.current = 0
        self.peak = 0
        self.killed: Optional[str] = None
        self._lock = threading.Lock()

    def set_bytes(self, path: Path, nbytes: int) -> None:
        with self._lock:
            if self.killed:
                raise QueryKilledError(self.killed)
            # the node at `path` just materialised: its children's outputs
            # are consumed and their buffers dead
            for p in [p for p in self.entries
                      if len(p) > len(path) and p[:len(path)] == path]:
                self.current -= self.entries.pop(p)
            delta = nbytes - self.entries.get(path, 0)
            self.entries[path] = nbytes
            self.current += delta
            self.peak = max(self.peak, self.current)
        if self.max_bytes is not None and self.current > self.max_bytes:
            raise ExceededMemoryLimitError(
                f"query exceeded per-query memory limit: "
                f"{self.current} > {self.max_bytes} bytes")
        if self.pool is not None and delta > 0:
            self.pool.reserve(self, delta)

    def release_all(self) -> None:
        with self._lock:
            freed = self.current
            self.entries.clear()
            self.current = 0
        if self.pool is not None and freed > 0:
            self.pool.free(freed)

    def kill(self, reason: str) -> None:
        self.killed = reason


class MemoryPool:
    """Shared byte budget with a low-memory killer.

    ``reserve`` never blocks (the TPU step queue has no cooperative
    yielding to resume into): on exhaustion it kills the largest consumer
    — the requesting query itself if it is the largest."""

    def __init__(self, capacity_bytes: int):
        self.capacity = capacity_bytes
        self.reserved = 0
        self.queries: Dict[str, QueryMemoryContext] = {}
        self._lock = threading.Lock()

    def register(self, ctx: QueryMemoryContext) -> None:
        with self._lock:
            self.queries[ctx.query_id] = ctx

    def unregister(self, ctx: QueryMemoryContext) -> None:
        with self._lock:
            self.queries.pop(ctx.query_id, None)

    def reserve(self, ctx: QueryMemoryContext, nbytes: int) -> None:
        with self._lock:
            if self.reserved + nbytes > self.capacity:
                victim = max(self.queries.values(),
                             key=lambda q: q.current, default=None)
                if victim is not None:
                    victim.kill(
                        "killed by the cluster low-memory killer "
                        f"(largest reservation: {victim.current} bytes)")
                if victim is ctx or victim is None:
                    raise ExceededMemoryLimitError(
                        f"memory pool exhausted: {self.reserved} + {nbytes} "
                        f"> {self.capacity} bytes")
            self.reserved += nbytes

    def free(self, nbytes: int) -> None:
        with self._lock:
            self.reserved = max(self.reserved - nbytes, 0)

    def info(self) -> dict:
        with self._lock:
            return {
                "capacity": self.capacity,
                "reserved": self.reserved,
                "queries": {q: c.current for q, c in self.queries.items()},
            }
