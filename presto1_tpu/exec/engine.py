"""Engine facade: SQL in, decoded results out.

The single-node analog of the reference's LocalQueryRunner
(``core/trino-main/.../testing/LocalQueryRunner.java``): wires parser →
planner → optimizer → executor over a catalog with no server in between.
"""

from __future__ import annotations

from ..sql import parser as sql_parser
from ..sql.logical import LogicalNode, plan_tree
from ..sql.optimizer import optimize
from ..sql.planner import Planner
from .catalog import Catalog
from .executor import Executor


class Engine:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def plan(self, sql: str) -> LogicalNode:
        q = sql_parser.parse(sql)
        plan = Planner(self.catalog).plan(q)
        return optimize(plan, self.catalog)

    def explain(self, sql: str) -> str:
        return plan_tree(self.plan(sql))

    def sql(self, sql: str):
        """Execute; returns the Output RecordBatch (display-named columns).

        A fresh Executor per statement: capacity/range records are
        plan-specific (sharing them across different plans would corrupt
        shapes)."""
        return Executor(self.catalog).execute(self.plan(sql))

    def sql_pandas(self, sql: str):
        return self.sql(sql).to_pandas()

    def compile(self, sql: str):
        """Compile the whole query pipeline into one jitted XLA program
        (runs one eager discovery pass to fix buffer capacities)."""
        from .executor import CompiledQuery

        return CompiledQuery(self.catalog, self.plan(sql))
