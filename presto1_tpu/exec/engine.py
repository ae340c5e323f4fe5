"""Engine facade: SQL in, decoded results out.

The single-node analog of the reference's LocalQueryRunner
(``core/trino-main/.../testing/LocalQueryRunner.java``): wires parser →
planner → optimizer → executor over a catalog with no server in between,
plus the query-lifecycle plumbing (sessions, events, EXPLAIN ANALYZE).
"""

from __future__ import annotations

import time
from typing import Optional

from ..sql import parser as sql_parser
from ..sql.logical import LogicalNode, plan_tree
from ..sql.optimizer import optimize
from ..sql.planner import Planner
from .catalog import Catalog
from .events import EventBus, QueryEvent
from .executor import Executor
from .session import Session
from .stats import QueryStats


class Engine:
    def __init__(self, catalog: Catalog, session: Optional[Session] = None,
                 events: Optional[EventBus] = None):
        self.catalog = catalog
        self.session = session or Session()
        self.events = events or EventBus()

    def plan(self, sql: str) -> LogicalNode:
        q = sql_parser.parse(sql)
        plan = Planner(self.catalog).plan(q)
        return optimize(plan, self.catalog)

    def explain(self, sql: str) -> str:
        return plan_tree(self.plan(sql))

    def sql(self, sql: str, stats: Optional[QueryStats] = None):
        """Execute; returns the Output RecordBatch (display-named columns).

        A fresh Executor per statement: capacity/range records are
        plan-specific (sharing them across different plans would corrupt
        shapes)."""
        self.events.emit(QueryEvent("created", self.session.query_id, sql,
                                    self.session.user))
        t0 = time.time()
        try:
            plan = self.plan(sql)
            out = Executor(self.catalog, stats=stats).execute(plan)
            rows = out.num_rows if isinstance(out.num_rows, int) \
                else int(out.num_rows)
        except Exception as e:
            self.events.emit(QueryEvent(
                "failed", self.session.query_id, sql, self.session.user,
                wall_s=time.time() - t0, error=str(e)))
            raise
        self.events.emit(QueryEvent(
            "completed", self.session.query_id, sql, self.session.user,
            wall_s=time.time() - t0, rows=rows))
        if stats is not None:
            stats.wall_s = time.time() - t0
        return out

    def sql_pandas(self, sql: str):
        return self.sql(sql).to_pandas()

    def explain_analyze(self, sql: str) -> str:
        stats = QueryStats()
        plan = self.plan(sql)
        t0 = time.time()
        Executor(self.catalog, stats=stats).execute(plan)
        stats.wall_s = time.time() - t0
        return stats.render(plan)

    def compile(self, sql: str):
        """Compile the whole query pipeline into one jitted XLA program
        (runs one eager discovery pass to fix buffer capacities)."""
        from .executor import CompiledQuery

        return CompiledQuery(self.catalog, self.plan(sql))
