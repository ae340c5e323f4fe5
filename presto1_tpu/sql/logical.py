"""Logical plan IR.

A compact analog of the reference's ~50 PlanNode types
(``core/trino-main/.../sql/planner/plan/``): Scan, Filter, Project,
Aggregate, Join, Sort, Limit, Output.  Every node carries its output
schema as {symbol: SqlType}; expressions are presto1_tpu.expr IR over
symbols (the reference's Symbol + RowExpression split).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..expr.ir import Expr
from ..types import SqlType


class LogicalNode:
    schema: Dict[str, SqlType]

    @property
    def children(self) -> List["LogicalNode"]:
        return []

    def with_children(self, children: List["LogicalNode"]) -> "LogicalNode":
        raise NotImplementedError


@dataclass
class Scan(LogicalNode):
    table: str
    symbols: Dict[str, str]  # column name -> symbol
    schema: Dict[str, SqlType]
    # TupleDomain over COLUMN names (not symbols), extracted from pushed
    # predicates — connectors may use it to prune row groups / splits
    # (reference: ConnectorTableHandle constraint / TupleDomain pushdown).
    # Pruning is advisory: every predicate is still evaluated in full.
    domain: Optional[object] = None

    def with_children(self, children):
        assert not children
        return self


@dataclass
class SingleRow(LogicalNode):
    """One anonymous row, no columns — FROM-less SELECT (the reference's
    ValuesNode with a single empty row, ``sql/planner/plan/ValuesNode``)."""

    @property
    def schema(self):
        return {}

    @property
    def children(self):
        return []

    def with_children(self, children):
        assert not children
        return self


@dataclass
class Filter(LogicalNode):
    child: LogicalNode
    predicate: Expr

    @property
    def schema(self):
        return self.child.schema

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return Filter(children[0], self.predicate)


@dataclass
class Project(LogicalNode):
    child: LogicalNode
    outputs: List[Tuple[str, Expr]]  # (symbol, expr)

    @property
    def schema(self):
        return {s: e.type for s, e in self.outputs}

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return Project(children[0], self.outputs)


@dataclass
class AggCall:
    symbol: str
    fn: str  # sum|avg|min|max|count|count_star|approx_percentile|median
    arg: Optional[Expr]
    distinct: bool = False
    type: SqlType = None  # filled by planner
    param: Optional[float] = None  # percentile fraction


@dataclass
class Aggregate(LogicalNode):
    child: LogicalNode
    group: List[str]  # group-by symbols (already projected in child)
    aggs: List[AggCall]
    # optimizer-proven minimal grouping subset; remaining group columns are
    # functionally dependent and just carried from a representative row
    primary: Optional[List[str]] = None

    @property
    def schema(self):
        out = {s: self.child.schema[s] for s in self.group}
        for a in self.aggs:
            out[a.symbol] = a.type
        return out

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return Aggregate(children[0], self.group, self.aggs, self.primary)


@dataclass
class Join(LogicalNode):
    left: LogicalNode
    right: LogicalNode
    kind: str  # inner|left|semi|anti|cross
    equis: List[Tuple[Expr, Expr]]  # (left expr, right expr)
    residual: Optional[Expr] = None
    build_unique: bool = False  # build keys known unique (PK) — sizing hint

    @property
    def schema(self):
        out = dict(self.left.schema)
        if self.kind in ("inner", "left", "cross"):
            out.update(self.right.schema)
        return out

    @property
    def children(self):
        return [self.left, self.right]

    def with_children(self, children):
        return Join(children[0], children[1], self.kind, self.equis,
                    self.residual, self.build_unique)


@dataclass
class Union(LogicalNode):
    inputs: List[LogicalNode]
    # outputs[i] = (union symbol, type, [per-child source symbol])
    outputs: List[Tuple[str, SqlType, List[str]]]

    @property
    def schema(self):
        return {s: t for s, t, _ in self.outputs}

    @property
    def children(self):
        return list(self.inputs)

    def with_children(self, children):
        return Union(list(children), self.outputs)


@dataclass
class WinCall:
    """One window function call (analog of Trino's WindowFunctionDefinition).

    ``frame`` = (unit, start_kind, start_val, end_kind, end_val) with kinds
    'up'/'p'/'c'/'f'/'uf'; None = SQL default frame.  ``param`` carries the
    constant integer argument (lag/lead offset, nth_value n, ntile buckets);
    ``default`` is lag/lead's third argument.
    """

    symbol: str
    fn: str
    arg: Optional[Expr]
    type: SqlType
    frame: Optional[tuple] = None
    default: Optional[Expr] = None
    param: Optional[int] = None


@dataclass
class WindowNode(LogicalNode):
    child: LogicalNode
    partition_by: List[Expr]
    order_by: List[Tuple[Expr, bool, Optional[bool]]]
    calls: List[WinCall]

    @property
    def schema(self):
        out = dict(self.child.schema)
        for c in self.calls:
            out[c.symbol] = c.type
        return out

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return WindowNode(children[0], self.partition_by, self.order_by,
                          self.calls)


@dataclass
class Sort(LogicalNode):
    child: LogicalNode
    keys: List[Tuple[Expr, bool, Optional[bool]]]  # (expr, asc, nulls_first)
    limit: Optional[int] = None
    offset: int = 0

    @property
    def schema(self):
        return self.child.schema

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return Sort(children[0], self.keys, self.limit, self.offset)


@dataclass
class MergeSorted(LogicalNode):
    """Consume an input that is ALREADY globally ordered by ``keys`` (the
    coordinator side of a distributed sort: per-task sorted outputs were
    k-way merged at the exchange — ``exec/merge.py``); applies only the
    offset/limit.  The plan-level witness that a distributed ORDER BY
    merges instead of re-sorting (reference:
    ``operator/MergeOperator.java:44``, ``docs/.../admin/dist-sort.rst``)."""

    child: LogicalNode
    keys: List[Tuple[Expr, bool, Optional[bool]]]
    limit: Optional[int] = None
    offset: int = 0

    @property
    def schema(self):
        return self.child.schema

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return MergeSorted(children[0], self.keys, self.limit, self.offset)


@dataclass
class Limit(LogicalNode):
    child: LogicalNode
    n: Optional[int]
    offset: int = 0

    @property
    def schema(self):
        return self.child.schema

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return Limit(children[0], self.n, self.offset)


@dataclass
class Output(LogicalNode):
    child: LogicalNode
    names: List[Tuple[str, str]]  # (display name, symbol)

    @property
    def schema(self):
        return {s: self.child.schema[s] for _, s in self.names}

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return Output(children[0], self.names)


def plan_tree(node: LogicalNode, indent: int = 0) -> str:
    """EXPLAIN-style rendering (reference: sql/planner/planprinter/)."""
    pad = "  " * indent
    name = type(node).__name__
    detail = ""
    if isinstance(node, Scan):
        detail = f" {node.table} -> {list(node.symbols.values())}"
    elif isinstance(node, Filter):
        detail = f" {_short(node.predicate)}"
    elif isinstance(node, Aggregate):
        detail = f" group={node.group} aggs={[(a.fn, a.symbol) for a in node.aggs]}"
    elif isinstance(node, Join):
        detail = f" {node.kind} on={[(_short(a), _short(b)) for a, b in node.equis]}"
        if node.residual is not None:
            detail += f" residual={_short(node.residual)}"
    elif isinstance(node, Project):
        detail = f" {[s for s, _ in node.outputs]}"
    elif isinstance(node, Sort):
        detail = f" keys={[(_short(e), a) for e, a, _ in node.keys]} limit={node.limit}"
    elif isinstance(node, MergeSorted):
        detail = (f" keys={[(_short(e), a) for e, a, _ in node.keys]}"
                  f" limit={node.limit} (k-way merge of sorted tasks)")
    elif isinstance(node, Output):
        detail = f" {[n for n, _ in node.names]}"
    elif isinstance(node, Limit):
        detail = f" {node.n}"
    lines = [f"{pad}{name}{detail}"]
    for c in node.children:
        lines.append(plan_tree(c, indent + 1))
    return "\n".join(lines)


def _short(e) -> str:
    from ..expr.ir import Call, ColumnRef, DictLookup, Literal

    if isinstance(e, ColumnRef):
        return e.name
    if isinstance(e, Literal):
        return repr(e.value)
    if isinstance(e, DictLookup):
        return f"lut[{e.label}]"
    if isinstance(e, Call):
        return f"{e.fn}({', '.join(_short(a) for a in e.args)})"
    return "?"


@dataclass
class MarkDistinct(LogicalNode):
    """Mark the first occurrence of each (group keys, marker keys) combo
    with a boolean column (reference: ``sql/planner/plan/MarkDistinctNode``,
    ``operator/MarkDistinctOperator.java``).  Multiple distinct aggregates
    rewrite to one MarkDistinct per distinct argument set; each distinct
    aggregate then consumes rows where its marker is true
    (``iterative/rule/MultipleDistinctAggregationToMarkDistinct.java``).

    Output order equals input order (markers are computed in sorted key
    space and routed back through the inverse permutation), so ordering
    chains and partitioning properties pass straight through."""

    child: LogicalNode
    group: List[str]                         # aggregation group symbols
    markers: List[Tuple[str, List[Expr]]]    # (marker symbol, key exprs)

    @property
    def schema(self):
        from ..types import BOOLEAN

        out = dict(self.child.schema)
        for msym, _ in self.markers:
            out[msym] = BOOLEAN
        return out

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return MarkDistinct(children[0], self.group, self.markers)


@dataclass
class Unnest(LogicalNode):
    """Expand an array-typed expression: each input row emits one output
    row per element (reference: ``operator/unnest/``, UnnestNode).  Map
    unnest emits (key, value) pairs via ``value_symbol``."""

    child: LogicalNode
    array: Expr                      # array/map expr over child's schema
    symbol: str                      # element (or key) output symbol
    value_symbol: Optional[str] = None  # map values

    @property
    def schema(self):
        out = dict(self.child.schema)
        t = self.array.type
        if t.kind == "map":
            out[self.symbol] = t.key
            if self.value_symbol:
                out[self.value_symbol] = t.value
        else:
            out[self.symbol] = t.element
        return out

    @property
    def children(self):
        return [self.child]

    def with_children(self, children):
        return Unnest(children[0], self.array, self.symbol,
                      self.value_symbol)
