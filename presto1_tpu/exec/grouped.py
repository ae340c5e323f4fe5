"""Grouped execution on the compiled path — the HBM bound for big scans.

The reference bounds working sets two ways: spilling revocable memory to
disk (``operator/HashBuilderOperator.java:155``) and grouped (lifespan)
execution that processes co-partitioned buckets one at a time
(``execution/Lifespan.java:26``, ``StageExecutionDescriptor.java:25-38``).
The eager engine already has both (``exec/spill.py``); this module is the
COMPILED-path analog (round-2 VERDICT item 6).

TPU-first design: instead of operator-level spill hooks inside one XLA
program (dynamic shapes, host round-trips mid-program), the plan's
dominant table is row-sharded into K splits and the partial-aggregation
fragment is compiled ONCE per distinct shard shape (row counts differ by
at most 1 across splits, so at most two programs exist).  The compiled
program runs K times, one split resident in HBM at a time; partial
aggregates accumulate on device and a final aggregation combines them.
Peak HBM ≈ (scan bytes)/K + partial outputs, with zero per-row host work.

Join shapes (Q9/Q18 class) work unchanged: only the dominant table's scan
is sharded, the build sides stay whole, and every probe split joins
against the full build — the same decomposition the mesh/DCN planes use
across devices/hosts, applied across TIME on one chip.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..sql import logical as L
from .catalog import Catalog, ShardedTable

Path = Tuple[int, ...]


class TableShardedCatalog(Catalog):
    """Catalog view sharding ONE table (the grouped-execution split
    source); every other table stays whole so join build sides are
    complete in each group."""

    def __init__(self, base: Catalog, table_name: str, index: int,
                 count: int):
        super().__init__()
        for name, t in base.tables.items():
            self.tables[name] = (ShardedTable(t, index, count)
                                 if name == table_name else t)


def _find_agg(node: L.LogicalNode, path: Path = ()) -> Optional[Path]:
    """Topmost Aggregate (BFS-ish: first in preorder)."""
    if isinstance(node, L.Aggregate):
        return path
    for i, c in enumerate(node.children):
        got = _find_agg(c, path + (i,))
        if got is not None:
            return got
    return None


def _node_at(plan: L.LogicalNode, path: Path) -> L.LogicalNode:
    for i in path:
        plan = plan.children[i]
    return plan


def _replace_at(plan: L.LogicalNode, path: Path,
                new: L.LogicalNode) -> L.LogicalNode:
    if not path:
        return new
    children = list(plan.children)
    children[path[0]] = _replace_at(children[path[0]], path[1:], new)
    return plan.with_children(children)


def _scan_tables(node: L.LogicalNode) -> List[str]:
    out = []
    if isinstance(node, L.Scan):
        out.append(node.table)
    for c in node.children:
        out += _scan_tables(c)
    return out


class GroupedCompiledQuery:
    """Compiled query executed in K row-shard groups of its dominant
    table.  ``info`` reports the grouping decisions for tests/EXPLAIN."""

    def __init__(self, engine, plan: L.LogicalNode, n_groups: int):
        from .dist_engine import split_aggregate

        self.engine = engine
        self.catalog = engine.catalog
        self.n_groups = n_groups

        agg_path = _find_agg(plan)
        if agg_path is None:
            raise ValueError("grouped compilation needs an aggregation")
        agg = _node_at(plan, agg_path)
        split = split_aggregate(agg)
        if split is None:
            raise ValueError(
                "aggregate is not partial/final splittable (distinct aggs)")
        partial, final, project = split
        self.partial_plan = partial.with_children([agg.child])
        tables = _scan_tables(self.partial_plan)
        if not tables:
            raise ValueError("no scans under the aggregation")
        self.table = max(tables,
                         key=lambda t: self.catalog.table(t).num_rows)

        # coordinator-side remainder: original plan with the Aggregate
        # replaced by final(+assemble); the merged partials arrive as a
        # stub at the final's child path
        local = final.with_children([self.partial_plan])
        self.stub_path: Path = agg_path + (0,)
        if project is not None:
            local = project.with_children([local])
            self.stub_path = agg_path + (0, 0)
        self.coord_plan = _replace_at(plan, agg_path, local)

        # at most two distinct shard shapes exist (row counts differ by
        # <= 1): compile one program per shape, lazily
        self._programs: Dict[int, object] = {}
        self.info = {"shards": n_groups, "table": self.table,
                     "programs": 0, "runs": 0}

    def _program_for(self, k: int):
        from .executor import CompiledQuery

        cat = TableShardedCatalog(self.catalog, self.table, k,
                                  self.n_groups)
        n = cat.table(self.table).num_rows
        if n not in self._programs:
            self._programs[n] = CompiledQuery(cat, self.partial_plan)
            self.info["programs"] = len(self._programs)
        return self._programs[n], cat

    def __call__(self):
        from .executor import Executor, ExecError
        from ..batch import concat_batches, round_capacity

        parts = []
        # double-buffered split pipelining (the exchange/compute-overlap
        # north star applied across TIME on one chip): shard k+1's
        # host->HBM upload is dispatched while shard k's program runs —
        # jax transfers are async, so collecting the next shard's arrays
        # BEFORE blocking on the current result overlaps PCIe with compute
        next_inputs = None
        for k in range(self.n_groups):
            cq, cat = self._program_for(k)
            if next_inputs is not None and next_inputs[0] == k:
                cq.inputs = next_inputs[1]
            else:
                cq.inputs = Executor(cat).scan_inputs(self.partial_plan)
            if k + 1 < self.n_groups:
                ncq, ncat = self._program_for(k + 1)
                next_inputs = (k + 1,
                               Executor(ncat).scan_inputs(
                                   self.partial_plan))
            try:
                out = cq()
            except ExecError:
                # this shard outgrew the discovery shard's capacities:
                # re-discover on it (fresh capacities) and retry once
                from .executor import CompiledQuery

                cq = CompiledQuery(cat, self.partial_plan)
                self._programs[cat.table(self.table).num_rows] = cq
                self.info["programs"] = len(self._programs)
                out = cq()
            self.info["runs"] += 1
            parts.append(out)
            del cq.inputs

        merged = parts[0]
        total = sum(int(p.num_rows) for p in parts)
        cap = round_capacity(max(total, 1))
        for p in parts[1:]:
            merged = concat_batches(merged, p, cap)
        from ..batch import RecordBatch

        merged = RecordBatch(merged.columns, total)
        return Executor(self.catalog,
                        stubs={self.stub_path: merged}).execute(
                            self.coord_plan)

    def to_pandas(self):
        return self().to_pandas()
