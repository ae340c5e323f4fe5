from .ir import (
    Expr, Literal, ColumnRef, Call, DictLookup, lit, col, call,
)
from .eval import eval_expr, bind_string_ops

__all__ = [
    "Expr", "Literal", "ColumnRef", "Call", "DictLookup", "lit", "col",
    "call", "eval_expr", "bind_string_ops",
]
