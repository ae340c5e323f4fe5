"""Row-expression IR.

The functional replacement for the reference's ``sql/relational`` RowExpression
kinds (CallExpression, ConstantExpression, InputReferenceExpression,
SpecialForm — ``core/trino-main/.../sql/relational/``).  Where Trino compiles
RowExpressions to JVM bytecode at query time (``sql/gen/PageFunctionCompiler``),
we trace them with jax.jit: `eval_expr` *is* the codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import numpy as np

from ..types import (
    BIGINT, BOOLEAN, DOUBLE, SqlType, DecimalType, VARCHAR, common_supertype,
)


@dataclass(frozen=True)
class Expr:
    type: SqlType = field(init=False)


@dataclass(frozen=True)
class Literal(Expr):
    value: Any
    type: SqlType

    def __init__(self, value, type):
        object.__setattr__(self, "value", value)
        object.__setattr__(self, "type", type)


@dataclass(frozen=True)
class ColumnRef(Expr):
    name: str
    type: SqlType

    def __init__(self, name, type):
        object.__setattr__(self, "name", name)
        object.__setattr__(self, "type", type)


@dataclass(frozen=True)
class Lambda(Expr):
    """Inline lambda for array functions (transform/filter/..._match):
    ``body`` references its parameter as ColumnRef(param).  The analog of
    the reference's LambdaDefinitionExpression
    (``sql/relational/LambdaDefinitionExpression``)."""

    params: Tuple[str, ...]
    body: "Expr"
    type: SqlType

    def __init__(self, params, body, type):
        object.__setattr__(self, "params", tuple(params))
        object.__setattr__(self, "body", body)
        object.__setattr__(self, "type", type)


@dataclass(frozen=True)
class Call(Expr):
    """fn ∈ {'+','-','*','/','neg','=','<>','<','<=','>','>=','and','or',
    'not','in','case','cast','is_null','coalesce','extract_year','like',
    'substring','||','min2','max2'} — string-typed subtrees are folded into
    DictLookup before device evaluation (see eval.bind_string_ops)."""

    fn: str
    args: Tuple[Expr, ...]
    type: SqlType

    def __init__(self, fn, args, type):
        object.__setattr__(self, "fn", fn)
        object.__setattr__(self, "args", tuple(args))
        object.__setattr__(self, "type", type)


@dataclass(frozen=True)
class DictLookup(Expr):
    """table[codes(column)] — a string-expression subtree pre-evaluated over
    one varchar column's dictionary.  ``table`` has one entry per dictionary
    code (+1 overflow slot for out-of-range/null codes)."""

    column: ColumnRef
    table: Any  # np.ndarray, len = len(dictionary) + 1
    type: SqlType
    label: str = ""
    dictionary: Any = None  # for varchar-valued lookups: the new sorted dict
    valid_table: Any = None  # bool per entry; None = all valid (NULL-aware
    #                          folds, e.g. CASE without ELSE)

    def __init__(self, column, table, type, label="", dictionary=None,
                 valid_table=None):
        object.__setattr__(self, "column", column)
        object.__setattr__(self, "table", table)
        object.__setattr__(self, "type", type)
        object.__setattr__(self, "label", label)
        object.__setattr__(self, "dictionary", dictionary)
        object.__setattr__(self, "valid_table", valid_table)

    def __hash__(self):
        return hash((self.column, self.label, id(self.table)))

    def __eq__(self, other):
        return (
            isinstance(other, DictLookup)
            and self.column == other.column
            and self.label == other.label
            and self.table is other.table
        )


# ---------------------------------------------------------------- helpers

_CMP = ("=", "<>", "<", "<=", ">", ">=")
_BOOL = ("and", "or", "not")


def lit(value, type=None) -> Literal:
    if type is None:
        if isinstance(value, bool):
            type = BOOLEAN
        elif isinstance(value, int):
            from ..types import BIGINT

            type = BIGINT
        elif isinstance(value, float):
            type = DOUBLE
        else:
            raise TypeError(f"cannot infer literal type for {value!r}")
    return Literal(value, type)


def col(name, type) -> ColumnRef:
    return ColumnRef(name, type)


def call(fn: str, *args: Expr, type: Optional[SqlType] = None) -> Call:
    if type is None:
        type = infer_type(fn, args)
    return Call(fn, args, type)


def infer_type(fn: str, args) -> SqlType:
    if fn in _CMP or fn in _BOOL or fn in ("in", "is_null", "like"):
        return BOOLEAN
    if fn in ("+", "-", "*", "/", "min2", "max2"):
        t = common_supertype(args[0].type, args[1].type)
        if fn == "*" and t.kind == "decimal":
            a, b = args[0].type, args[1].type
            sa = a.scale if a.kind == "decimal" else 0  # type: ignore[attr-defined]
            sb = b.scale if b.kind == "decimal" else 0  # type: ignore[attr-defined]
            return DecimalType(38, sa + sb)
        if fn == "/" and t.kind == "decimal":
            return DOUBLE  # simple policy; reference uses decimal division rules
        return t
    if fn == "neg":
        return args[0].type
    if fn == "||":  # string/varbinary concatenation
        return common_supertype(args[0].type, args[1].type)
    if fn in ("extract_year", "extract_month", "length", "strpos",
              "codepoint", "json_array_length", "json_size",
              "url_extract_port", "regexp_count", "levenshtein_distance",
              "crc32"):
        return BIGINT
    if fn in ("md5", "sha1", "sha256", "sha512"):
        # reference signature is varbinary -> varbinary
        # (operator/scalar/VarbinaryFunctions.java); a varchar argument
        # keeps the legacy hex-string convenience form
        from ..types import VARBINARY

        return VARBINARY if args[0].type.kind == "varbinary" else VARCHAR
    if fn in ("to_utf8", "from_hex", "from_base64"):
        from ..types import VARBINARY

        return VARBINARY
    if fn in ("upper", "lower", "trim", "concat", "replace", "reverse",
              "ltrim", "rtrim", "lpad", "rpad", "split_part", "chr",
              "regexp_extract", "regexp_replace", "json_extract",
              "json_extract_scalar", "json_format", "url_extract_host",
              "url_extract_path", "url_extract_protocol",
              "url_extract_query", "url_extract_fragment", "url_encode",
              "url_decode", "to_hex", "normalize", "from_utf8",
              "to_base64"):
        return VARCHAR
    if fn in ("starts_with", "regexp_like", "is_nan", "is_finite",
              "is_infinite"):
        return BOOLEAN
    if fn in ("sin", "cos", "tan", "asin", "acos", "atan", "atan2",
              "sinh", "cosh", "tanh", "degrees", "radians", "cbrt",
              "truncate", "log"):
        return DOUBLE
    if fn == "sign":
        return BIGINT if args[0].type.kind in (
            "bigint", "integer", "smallint", "tinyint", "decimal") \
            else args[0].type
    if fn in ("abs", "negate"):
        return args[0].type
    if fn in ("floor", "ceil"):
        return BIGINT if args[0].type.kind in ("decimal", "bigint", "integer") else args[0].type
    if fn in ("sqrt", "power", "ln", "exp"):
        return DOUBLE
    if fn == "round":
        return args[0].type
    if fn == "mod":
        return common_supertype(args[0].type, args[1].type)
    if fn == "nullif":
        return args[0].type
    if fn in ("greatest", "least"):
        t = args[0].type
        for a in args[1:]:
            t = common_supertype(t, a.type)
        return t
    if fn == "coalesce":
        return args[0].type
    if fn == "case":
        # args = [cond1, val1, cond2, val2, ..., else_val]
        return args[1].type
    raise TypeError(f"cannot infer result type of {fn}")


def walk(expr: Expr):
    yield expr
    if isinstance(expr, Call):
        for a in expr.args:
            yield from walk(a)
    elif isinstance(expr, Lambda):
        yield from walk(expr.body)
    elif isinstance(expr, DictLookup):
        yield expr.column


def referenced_columns(expr: Expr):
    return {e.name for e in walk(expr) if isinstance(e, ColumnRef)}


def substitute(expr: Expr, mapping) -> Expr:
    """Replace ColumnRefs by name (ExpressionSymbolInliner analog).
    Lambda parameters shadow; a DictLookup's column must stay a plain
    column — substituting an expression into one raises ValueError."""
    if isinstance(expr, ColumnRef):
        return mapping.get(expr.name, expr)
    if isinstance(expr, Call):
        return Call(expr.fn,
                    tuple(substitute(a, mapping) for a in expr.args),
                    expr.type)
    if isinstance(expr, Lambda):
        inner = {k: v for k, v in mapping.items() if k not in expr.params}
        return Lambda(expr.params, substitute(expr.body, inner), expr.type)
    if isinstance(expr, DictLookup):
        c = substitute(expr.column, mapping)
        if c is expr.column:
            return expr
        if not isinstance(c, ColumnRef):
            raise ValueError("cannot inline an expression under DictLookup")
        return DictLookup(c, expr.table, expr.type, expr.label,
                          expr.dictionary, expr.valid_table)
    return expr
