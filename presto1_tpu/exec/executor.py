"""Logical plan execution over device batches.

The stand-in for the reference's whole worker data plane
(LocalExecutionPlanner → Driver/operator chain,
``sql/planner/LocalExecutionPlanner.java:390``,
``operator/Driver.java:262``): each logical node maps to one vectorized
operator call; XLA fuses the expression work into the operator kernels.
This executor runs operator-at-a-time per fragment ("eager mode"),
synchronising row counts between operators so buffer capacities stay tight
and jit caches stay warm; fused single-program fragments ride the same
operator functions (see parallel/ for the SPMD path).

Filter→Aggregate is fused here the way the reference fuses
ScanFilterAndProject (``operator/ScanFilterAndProjectOperator.java:64``):
the filter never materialises, it becomes the aggregation mask.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch, round_capacity
from ..expr import ir
from ..expr.eval import bind_string_ops, eval_expr
from ..ops import (
    AggSpec, SortKey, filter_batch, global_aggregate, group_aggregate,
    hash_join, limit_batch, sort_batch,
)
from ..ops.filter import compact, filter_mask
from ..ops.join import cross_join
from ..ops.common import key_ranges
from ..sql.logical import (
    Aggregate, Filter, Join, Limit, LogicalNode, Output, Project, Scan, Sort,
)


class ExecError(Exception):
    pass


class Executor:
    def __init__(self, catalog):
        self.catalog = catalog

    # ---- helpers

    def _dicts(self, batch: RecordBatch) -> Dict[str, np.ndarray]:
        return {
            n: c.dictionary for n, c in batch.columns.items()
            if c.dictionary is not None
        }

    def _bind(self, e: ir.Expr, batch: RecordBatch) -> ir.Expr:
        return bind_string_ops(e, self._dicts(batch))

    def _shrink(self, batch: RecordBatch) -> RecordBatch:
        """Sync the row count to host and re-bucket capacity."""
        n = int(batch.num_rows) if not isinstance(batch.num_rows, int) else batch.num_rows
        cap = round_capacity(n)
        if cap < batch.capacity():
            cols = {
                name: c.with_data(
                    c.data[:cap],
                    c.validity[:cap] if c.validity is not None else None)
                for name, c in batch.columns.items()
            }
            return RecordBatch(cols, n)
        return RecordBatch(batch.columns, n)

    # ---- dispatch

    def execute(self, node: LogicalNode) -> RecordBatch:
        m = getattr(self, f"_x_{type(node).__name__}")
        return m(node)

    def _x_Output(self, node: Output) -> RecordBatch:
        b = self.execute(node.child)
        cols = {}
        for name, sym in node.names:
            c = b[sym]
            # allow duplicate display names by suffixing
            key = name
            i = 1
            while key in cols:
                key = f"{name}_{i}"
                i += 1
            cols[key] = c
        return RecordBatch(cols, b.num_rows)

    def _x_Scan(self, node: Scan) -> RecordBatch:
        table = self.catalog.table(node.table)
        b = table.batch(list(node.symbols.keys()))
        cols = {node.symbols[c]: col for c, col in b.columns.items()}
        return RecordBatch(cols, b.num_rows)

    def _x_Filter(self, node: Filter) -> RecordBatch:
        child = self.execute(node.child)
        pred = self._bind(node.predicate, child)
        out = filter_batch(pred, child)
        return self._shrink(out)

    def _x_Project(self, node: Project) -> RecordBatch:
        child = self.execute(node.child)
        cols: Dict[str, Column] = {}
        for sym, e in node.outputs:
            if isinstance(e, ir.ColumnRef):
                cols[sym] = child[e.name]
            else:
                cols[sym] = eval_expr(self._bind(e, child), child)
        return RecordBatch(cols, child.num_rows)

    def _x_Aggregate(self, node: Aggregate) -> RecordBatch:
        # fuse an immediate child Filter into the aggregation mask
        mask = None
        child_node = node.child
        if isinstance(child_node, Filter):
            below = self.execute(child_node.child)
            pred = self._bind(child_node.predicate, below)
            mask = filter_mask(pred, below)
            child = below
        else:
            child = self.execute(child_node)

        aggs = [
            AggSpec(
                a.fn,
                None if a.arg is None
                else eval_expr(self._bind(a.arg, child), child),
                a.symbol,
            )
            for a in node.aggs
        ]
        if not node.group:
            return global_aggregate(aggs, child.num_rows, child.capacity(),
                                    mask=mask)
        primary = node.primary or node.group
        keys = [(s, child[s]) for s in primary]
        carry = [(s, child[s]) for s in node.group if s not in primary]
        ranges = key_ranges([c for _, c in keys], child.num_rows)
        max_groups = round_capacity(child.num_rows)
        out = group_aggregate(keys, aggs, child.num_rows, ranges, max_groups,
                              mask=mask, carry=carry)
        return self._shrink(out)

    def _x_Join(self, node: Join) -> RecordBatch:
        left = self.execute(node.left)
        right = self.execute(node.right)

        if node.kind == "cross":
            if right.num_rows == 1:
                return cross_join(left, right, left.capacity())
            if left.num_rows == 1:
                return cross_join(right, left, right.capacity())
            cap = round_capacity(max(left.num_rows * right.num_rows, 1))
            return self._shrink(cross_join(left, right, cap))

        # materialise key expressions as temp columns
        lkeys, rkeys = [], []
        lb, rb = left, right
        for i, (a, b) in enumerate(node.equis):
            ln, rn = f"__lk{i}", f"__rk{i}"
            lb = RecordBatch({**lb.columns, ln: eval_expr(self._bind(a, left), left)},
                             lb.num_rows)
            rb = RecordBatch({**rb.columns, rn: eval_expr(self._bind(b, right), right)},
                             rb.num_rows)
            lkeys.append(ln)
            rkeys.append(rn)
        if not lkeys:
            raise ExecError(f"join without equi keys: {node.kind}")

        lr = key_ranges([lb[k] for k in lkeys], lb.num_rows)
        rr = key_ranges([rb[k] for k in rkeys], rb.num_rows)
        ranges = [(min(a[0], b[0]), max(a[1], b[1])) for a, b in zip(lr, rr)]

        residual = None
        if node.residual is not None:
            # bound against the combined pair schema
            merged = RecordBatch({**lb.columns, **rb.columns}, 0)
            residual = self._bind(node.residual, merged)

        if node.kind in ("semi", "anti"):
            cap = round_capacity(max(lb.num_rows, 1))
            if residual is not None:
                cap_pairs = round_capacity(max(lb.num_rows * 4, 128))
                while True:
                    stats: Dict[str, object] = {}
                    out = hash_join(lb, rb, lkeys, rkeys, node.kind, ranges,
                                    cap_pairs, residual=residual, stats=stats)
                    pairs_total = int(stats["pairs_total"])  # type: ignore[arg-type]
                    if pairs_total <= cap_pairs:
                        break
                    cap_pairs = round_capacity(pairs_total)
            else:
                out = hash_join(lb, rb, lkeys, rkeys, node.kind, ranges, cap)
            out = self._drop_temp(out)
            return self._shrink(out)

        # inner / left
        if node.build_unique:
            cap = round_capacity(max(lb.num_rows, 1))
        else:
            cap = round_capacity(max(lb.num_rows * 2, 128))
        while True:
            out = hash_join(lb, rb, lkeys, rkeys, node.kind, ranges, cap,
                            residual=residual)
            total = int(out.num_rows)
            if total <= cap:
                break
            cap = round_capacity(total)
        out = self._drop_temp(out)
        return self._shrink(out)

    def _drop_temp(self, b: RecordBatch) -> RecordBatch:
        cols = {n: c for n, c in b.columns.items() if not n.startswith("__")}
        return RecordBatch(cols, b.num_rows)

    def _x_Sort(self, node: Sort) -> RecordBatch:
        child = self.execute(node.child)
        keys = [
            SortKey(eval_expr(self._bind(e, child), child), asc, nf)
            for e, asc, nf in node.keys
        ]
        out = sort_batch(child, keys, limit=node.limit)
        return self._shrink(out)

    def _x_Limit(self, node: Limit) -> RecordBatch:
        child = self.execute(node.child)
        return self._shrink(limit_batch(child, node.n))
