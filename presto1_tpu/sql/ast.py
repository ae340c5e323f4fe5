"""SQL abstract syntax tree.

The compact analog of the reference's 187-class AST
(``core/trino-parser/src/main/java/io/trino/sql/tree/``), covering the
query subset the engine executes (full TPC-H plus general
SELECT/JOIN/GROUP/ORDER/WITH).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple


class Node:
    pass


# ---------------------------------------------------------------- queries


@dataclass
class Query(Node):
    ctes: List[Tuple[str, "Query"]]
    select: "Select"


@dataclass
class SetOp(Node):
    left: Node  # Select | SetOp
    right: Node  # Select
    all: bool = False
    # trailing ORDER BY / LIMIT / OFFSET of the whole set operation
    # (SQL scoping)
    order_by: List["OrderItem"] = field(default_factory=list)
    limit: Optional[int] = None
    offset: int = 0
    op: str = "union"  # union | intersect | except


@dataclass
class Select(Node):
    items: List["SelectItem"]
    from_: Optional["FromItem"]
    where: Optional["Expr"] = None
    group_by: List["Expr"] = field(default_factory=list)
    having: Optional["Expr"] = None
    order_by: List["OrderItem"] = field(default_factory=list)
    limit: Optional[int] = None
    distinct: bool = False
    # GROUPING SETS / ROLLUP / CUBE: list of sets, each a list of indices
    # into group_by; None = plain GROUP BY
    grouping_sets: Optional[List[List[int]]] = None
    offset: int = 0


@dataclass
class SelectItem(Node):
    expr: Optional["Expr"]  # None = star
    alias: Optional[str] = None
    star_qualifier: Optional[str] = None  # for t.* / *


@dataclass
class OrderItem(Node):
    expr: "Expr"
    ascending: bool = True
    nulls_first: Optional[bool] = None


# ---------------------------------------------------------------- from


class FromItem(Node):
    pass


@dataclass
class TableRef(FromItem):
    name: str
    alias: Optional[str] = None


@dataclass
class SubqueryRef(FromItem):
    query: Query
    alias: str


@dataclass
class UnnestRef(FromItem):
    """UNNEST(expr) [AS alias (col [, col])] — array (1 col) or map (2)."""
    expr: "Expr"
    alias: Optional[str] = None
    columns: Optional[List[str]] = None


@dataclass
class JoinItem(FromItem):
    left: FromItem
    right: FromItem
    kind: str  # 'inner' | 'left' | 'right' | 'full' | 'cross'
    on: Optional["Expr"] = None


# ---------------------------------------------------------------- exprs


class Expr(Node):
    pass


@dataclass
class Identifier(Expr):
    parts: List[str]  # [col] or [qualifier, col]

    @property
    def name(self):
        return self.parts[-1]

    @property
    def qualifier(self):
        return self.parts[0] if len(self.parts) > 1 else None


@dataclass
class NumberLit(Expr):
    text: str  # keep literal text to preserve decimal scale


@dataclass
class StringLit(Expr):
    value: str


@dataclass
class BinaryLit(Expr):
    value: str  # hex digits, e.g. X'AB01' -> 'AB01'


@dataclass
class DateLit(Expr):
    value: str  # 'YYYY-MM-DD'


@dataclass
class TimestampLit(Expr):
    value: str  # 'YYYY-MM-DD[ HH:MM:SS[.fff]]'


@dataclass
class IntervalLit(Expr):
    value: int
    unit: str  # 'day' | 'month' | 'year'


@dataclass
class AtTimeZone(Expr):
    expr: "Expr"
    zone: str  # '+05:30' | 'UTC'


@dataclass
class BinaryOp(Expr):
    op: str
    left: Expr
    right: Expr


@dataclass
class UnaryOp(Expr):
    op: str  # '-' | 'not'
    operand: Expr


@dataclass
class FuncCall(Expr):
    name: str
    args: List[Expr]
    distinct: bool = False
    is_star: bool = False  # count(*)


@dataclass
class WindowCall(Expr):
    name: str
    args: List[Expr]
    partition_by: List[Expr]
    order_by: List["OrderItem"]
    is_star: bool = False
    # (unit, start_kind, start_val, end_kind, end_val); None = SQL default
    frame: Optional[tuple] = None


@dataclass
class Case(Expr):
    whens: List[Tuple[Expr, Expr]]
    else_: Optional[Expr] = None
    operand: Optional[Expr] = None  # CASE x WHEN v THEN ...


@dataclass
class Cast(Expr):
    expr: Expr
    type_name: str


@dataclass
class Between(Expr):
    expr: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclass
class InList(Expr):
    expr: Expr
    items: List[Expr]
    negated: bool = False


@dataclass
class InSubquery(Expr):
    expr: Expr
    query: Query
    negated: bool = False


@dataclass
class Exists(Expr):
    query: Query
    negated: bool = False


@dataclass
class ScalarSubquery(Expr):
    query: Query


@dataclass
class Like(Expr):
    expr: Expr
    pattern: Expr
    negated: bool = False


@dataclass
class IsNull(Expr):
    expr: Expr
    negated: bool = False


@dataclass
class Extract(Expr):
    field: str  # 'year' | 'month'
    expr: Expr


@dataclass
class Substring(Expr):
    expr: Expr
    start: Expr
    length: Optional[Expr] = None


# ---------------------------------------------------------------- statements


@dataclass
class CreateTable(Node):
    name: str
    columns: Optional[List[Tuple[str, str]]] = None  # (name, type name)
    as_query: Optional[Query] = None


@dataclass
class InsertInto(Node):
    name: str
    query: Optional[Query] = None
    values: Optional[List[List["Expr"]]] = None


@dataclass
class DropTable(Node):
    name: str


@dataclass
class Show(Node):
    what: str  # tables | columns | schemas | catalogs | session | functions
    target: Optional[str] = None  # table name for SHOW COLUMNS / DESCRIBE


@dataclass
class Explain(Node):
    query: Query
    analyze: bool = False


@dataclass
class ArrayLit(Expr):
    """ARRAY[e1, e2, ...] constructor."""
    items: List[Expr]


@dataclass
class Lambda(Expr):
    """Inline lambda ``x -> body`` (array function argument)."""
    params: List[str]
    body: Expr
