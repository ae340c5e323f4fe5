"""Query event pipeline.

The analog of the reference's EventListener SPI + QueryMonitor
(``spi/eventlistener/EventListener.java``, ``event/QueryMonitor.java``):
structured query-lifecycle events dispatched to registered listeners; a
JSONL file listener ships in-box.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from typing import Callable, List, Optional


@dataclass
class QueryEvent:
    kind: str  # 'created' | 'completed' | 'failed'
    query_id: str
    sql: str
    user: str
    ts: float = field(default_factory=time.time)
    wall_s: Optional[float] = None
    rows: Optional[int] = None
    error: Optional[str] = None


class EventBus:
    def __init__(self):
        self._listeners: List[Callable[[QueryEvent], None]] = []

    def register(self, listener: Callable[[QueryEvent], None]) -> None:
        self._listeners.append(listener)

    def emit(self, event: QueryEvent) -> None:
        for fn in self._listeners:
            try:
                fn(event)
            except Exception:
                pass  # listeners must not break queries


def jsonl_listener(path: str):
    def listen(event: QueryEvent) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(asdict(event)) + "\n")

    return listen
