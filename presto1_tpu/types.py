"""SQL type system and its mapping onto device dtypes.

Replaces the reference type registry (``core/trino-spi/src/main/java/io/trino/
spi/type/`` — BigintType, DoubleType, VarcharType, DecimalType, DateType, …)
with a small set of fixed-width device representations:

| SQL type      | device repr                           |
|---------------|---------------------------------------|
| BIGINT        | int64                                 |
| INTEGER       | int32                                 |
| DOUBLE        | float64                               |
| BOOLEAN       | bool                                  |
| DATE          | int32 days since 1970-01-01           |
| DECIMAL(p,s)  | int64 scaled by 10**s (exact arith)   |
| VARCHAR/CHAR  | int32 dictionary codes (order-preserving sorted dictionary) |

DECIMAL-as-scaled-int64 is a deliberate TPU-first choice: TPU has no native
f64, and TPC-H money arithmetic is exact in scaled integers.  The reference
types TPC-H money columns as DOUBLE (``plugin/trino-tpch/.../TpchMetadata``);
we keep exact decimals internally and compare doubles within-ulp at the
output boundary (policy documented in SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class SqlType:
    kind: str  # 'bigint','integer','double','boolean','date','varchar','decimal'

    @property
    def np_dtype(self):
        return _NP_DTYPES[self.kind]

    @property
    def is_string(self) -> bool:
        return self.kind == "varchar"

    @property
    def is_numeric(self) -> bool:
        return self.kind in ("bigint", "integer", "double", "decimal")

    def __str__(self):
        return self.kind


@dataclass(frozen=True)
class DecimalType(SqlType):
    precision: int = 12
    scale: int = 2

    def __init__(self, precision: int = 12, scale: int = 2):
        object.__setattr__(self, "kind", "decimal")
        object.__setattr__(self, "precision", precision)
        object.__setattr__(self, "scale", scale)

    def __str__(self):
        return f"decimal({self.precision},{self.scale})"


_NP_DTYPES = {
    "bigint": np.dtype(np.int64),
    "integer": np.dtype(np.int32),
    "double": np.dtype(np.float64),
    "boolean": np.dtype(np.bool_),
    "date": np.dtype(np.int32),
    "decimal": np.dtype(np.int64),
    "varchar": np.dtype(np.int32),  # dictionary codes
}

BIGINT = SqlType("bigint")
INTEGER = SqlType("integer")
DOUBLE = SqlType("double")
BOOLEAN = SqlType("boolean")
DATE = SqlType("date")
VARCHAR = SqlType("varchar")


def parse_type_str(name: str) -> SqlType:
    """Inverse of ``str(SqlType)`` (used by the page wire format and DDL)."""
    n = name.strip().lower()
    if n.startswith("decimal"):
        inner = n[n.find("(") + 1:n.find(")")] if "(" in n else "12,2"
        p, s = (inner.split(",") + ["0"])[:2]
        return DecimalType(int(p.strip()), int(s.strip()))
    for prefix, t in (("double", "double"), ("bigint", "bigint"),
                      ("integer", "integer"), ("int", "integer"),
                      ("date", "date"), ("varchar", "varchar"),
                      ("char", "varchar"), ("boolean", "boolean")):
        if n.startswith(prefix):
            return SqlType(t) if t != "varchar" else VARCHAR
    raise ValueError(f"unknown type {name}")


def common_supertype(a: SqlType, b: SqlType) -> SqlType:
    """Result type of binary arithmetic/comparison coercion.

    Mirrors the reference's ``TypeCoercion`` lattice for the types we
    support: integer -> bigint -> decimal -> double.
    """
    if a == b:
        return a
    order = {"integer": 0, "bigint": 1, "date": 1, "decimal": 2, "double": 3}
    if a.kind in order and b.kind in order:
        hi = a if order[a.kind] >= order[b.kind] else b
        lo = b if hi is a else a
        if hi.kind == "decimal" and lo.kind == "decimal":
            # widen to max scale
            return hi if hi.scale >= lo.scale else lo  # type: ignore[attr-defined]
        return hi
    if a.kind == "date" and b.kind == "date":
        return a
    raise TypeError(f"no common supertype for {a} and {b}")
