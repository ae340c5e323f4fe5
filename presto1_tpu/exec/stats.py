"""Per-operator execution statistics and EXPLAIN ANALYZE.

The analog of the reference's OperatorStats → … → QueryStats rollup
(``operator/OperatorStats``, timed by ``operator/OperationTimer``) and its
EXPLAIN ANALYZE rendering (``operator/ExplainAnalyzeOperator.java:34``,
``sql/planner/planprinter/``).  Eager mode times each operator around its
device sync; compiled mode reports whole-fragment wall time (XLA owns the
intra-fragment schedule, so per-op wall time is a profiler concern — see
jax.profiler integration notes in README).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class OperatorStats:
    name: str
    detail: str = ""
    wall_s: float = 0.0
    output_rows: int = 0
    invocations: int = 0


@dataclass
class QueryStats:
    """Stats tree keyed by plan-node path."""

    operators: Dict[Tuple[int, ...], OperatorStats] = field(default_factory=dict)
    wall_s: float = 0.0
    peak_capacity_rows: int = 0

    def record(self, path, name, detail, wall_s, output_rows, capacity):
        op = self.operators.setdefault(path, OperatorStats(name, detail))
        op.wall_s += wall_s
        op.output_rows = output_rows
        op.invocations += 1
        self.peak_capacity_rows = max(self.peak_capacity_rows, capacity)

    def render(self, plan) -> str:
        lines: List[str] = [f"Query: {self.wall_s * 1000:.1f} ms total"]
        self._render(plan, (), 0, lines)
        return "\n".join(lines)

    def _render(self, node, path, indent, lines):
        from ..sql.logical import plan_tree

        op = self.operators.get(path)
        head = plan_tree(node, 0).split("\n")[0]
        pad = "  " * indent
        if op is not None:
            extra = f", {op.detail}" if op.detail else ""
            lines.append(
                f"{pad}{head}   [{op.wall_s * 1000:.1f} ms, "
                f"{op.output_rows} rows{extra}]")
        else:
            lines.append(f"{pad}{head}")
        for i, child in enumerate(node.children):
            self._render(child, path + (i,), indent + 1, lines)


class Timer:
    def __init__(self):
        self.t0 = time.time()

    def stop(self) -> float:
        return time.time() - self.t0
