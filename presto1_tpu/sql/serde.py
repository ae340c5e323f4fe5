"""JSON serde for logical plans and expression IR.

The multi-host control plane ships plan fragments to workers the way the
reference ships a serialized ``PlanFragment`` inside ``TaskUpdateRequest``
(``server/TaskUpdateRequest.java``, ``server/remotetask/HttpRemoteTask.java:503``).
Expressions serialize structurally; DictLookup tables (host numpy arrays
produced by string-predicate binding) ride along as base64 npy blobs.
"""

from __future__ import annotations

import base64
import io
from typing import Any, Dict

import numpy as np

from ..expr import ir
from ..types import SqlType, parse_type_str
from . import logical as L


def _np_to_b64(arr: np.ndarray) -> str:
    bio = io.BytesIO()
    np.save(bio, np.asarray(arr), allow_pickle=False)
    return base64.b64encode(bio.getvalue()).decode()


def _np_from_b64(s: str) -> np.ndarray:
    return np.load(io.BytesIO(base64.b64decode(s)), allow_pickle=False)


def _t(t: SqlType) -> str:
    return str(t)


# ---------------------------------------------------------------- exprs

def expr_to_json(e: ir.Expr) -> Dict[str, Any]:
    if isinstance(e, ir.Literal):
        v = e.value
        if isinstance(v, (np.integer,)):
            v = int(v)
        elif isinstance(v, (np.floating,)):
            v = float(v)
        elif isinstance(v, np.ndarray):
            return {"k": "lit_arr", "v": _np_to_b64(v), "t": _t(e.type)}
        return {"k": "lit", "v": v, "t": _t(e.type)}
    if isinstance(e, ir.ColumnRef):
        return {"k": "col", "name": e.name, "t": _t(e.type)}
    if isinstance(e, ir.DictLookup):
        return {
            "k": "dict", "col": expr_to_json(e.column),
            "table": _np_to_b64(e.table), "t": _t(e.type),
            "label": e.label,
            "dictionary": None if e.dictionary is None
            else _np_to_b64(e.dictionary),
            "valid_table": None if e.valid_table is None
            else _np_to_b64(e.valid_table),
        }
    if isinstance(e, ir.Call):
        return {"k": "call", "fn": e.fn,
                "args": [expr_to_json(a) for a in e.args], "t": _t(e.type)}
    if isinstance(e, ir.Lambda):
        return {"k": "lambda", "params": list(e.params),
                "body": expr_to_json(e.body), "t": _t(e.type)}
    raise TypeError(f"unserializable expr {type(e).__name__}")


def expr_from_json(d: Dict[str, Any]) -> ir.Expr:
    k = d["k"]
    t = parse_type_str(d["t"])
    if k == "lit":
        return ir.Literal(d["v"], t)
    if k == "lit_arr":
        return ir.Literal(_np_from_b64(d["v"]), t)
    if k == "col":
        return ir.ColumnRef(d["name"], t)
    if k == "dict":
        col = expr_from_json(d["col"])
        dic = None if d["dictionary"] is None else _np_from_b64(d["dictionary"])
        vt = d.get("valid_table")
        return ir.DictLookup(col, _np_from_b64(d["table"]), t,
                             label=d["label"], dictionary=dic,
                             valid_table=None if vt is None
                             else _np_from_b64(vt))
    if k == "call":
        return ir.Call(d["fn"], tuple(expr_from_json(a) for a in d["args"]), t)
    if k == "lambda":
        return ir.Lambda(tuple(d["params"]), expr_from_json(d["body"]), t)
    raise ValueError(f"unknown expr kind {k}")


# ---------------------------------------------------------------- plans

def plan_to_json(n: L.LogicalNode) -> Dict[str, Any]:
    if isinstance(n, L.Scan):
        return {"k": "scan", "table": n.table, "symbols": n.symbols,
                "schema": {s: _t(t) for s, t in n.schema.items()},
                "domain": None if n.domain is None else n.domain.to_json()}
    if isinstance(n, L.Filter):
        return {"k": "filter", "child": plan_to_json(n.child),
                "predicate": expr_to_json(n.predicate)}
    if isinstance(n, L.Project):
        return {"k": "project", "child": plan_to_json(n.child),
                "outputs": [[s, expr_to_json(e)] for s, e in n.outputs]}
    if isinstance(n, L.Aggregate):
        return {
            "k": "agg", "child": plan_to_json(n.child), "group": n.group,
            "primary": n.primary,
            "aggs": [{"symbol": a.symbol, "fn": a.fn,
                      "arg": None if a.arg is None else expr_to_json(a.arg),
                      "distinct": a.distinct, "t": _t(a.type),
                      "param": a.param}
                     for a in n.aggs],
        }
    if isinstance(n, L.Join):
        return {
            "k": "join", "left": plan_to_json(n.left),
            "right": plan_to_json(n.right), "kind": n.kind,
            "equis": [[expr_to_json(a), expr_to_json(b)] for a, b in n.equis],
            "residual": None if n.residual is None
            else expr_to_json(n.residual),
            "build_unique": n.build_unique,
        }
    if isinstance(n, L.SingleRow):
        return {"k": "single_row"}
    if isinstance(n, L.Union):
        return {"k": "union",
                "inputs": [plan_to_json(c) for c in n.inputs],
                "outputs": [[s, _t(t), srcs] for s, t, srcs in n.outputs]}
    if isinstance(n, L.WindowNode):
        return {
            "k": "window", "child": plan_to_json(n.child),
            "partition_by": [expr_to_json(e) for e in n.partition_by],
            "order_by": [[expr_to_json(e), asc, nf]
                         for e, asc, nf in n.order_by],
            "calls": [[c.symbol, c.fn,
                       None if c.arg is None else expr_to_json(c.arg),
                       _t(c.type),
                       None if c.frame is None else list(c.frame),
                       None if c.default is None else expr_to_json(c.default),
                       c.param]
                      for c in n.calls],
        }
    if isinstance(n, L.Unnest):
        return {"k": "unnest", "child": plan_to_json(n.child),
                "array": expr_to_json(n.array), "symbol": n.symbol,
                "value_symbol": n.value_symbol}
    if isinstance(n, L.MarkDistinct):
        return {"k": "mark_distinct", "child": plan_to_json(n.child),
                "group": list(n.group),
                "markers": [[m, [expr_to_json(e) for e in keys]]
                            for m, keys in n.markers]}
    if isinstance(n, L.Sort):
        return {"k": "sort", "child": plan_to_json(n.child),
                "keys": [[expr_to_json(e), asc, nf] for e, asc, nf in n.keys],
                "limit": n.limit, "offset": n.offset}
    if isinstance(n, L.MergeSorted):
        return {"k": "merge_sorted", "child": plan_to_json(n.child),
                "keys": [[expr_to_json(e), asc, nf] for e, asc, nf in n.keys],
                "limit": n.limit, "offset": n.offset}
    if isinstance(n, L.Limit):
        return {"k": "limit", "child": plan_to_json(n.child), "n": n.n,
                "offset": n.offset}
    if isinstance(n, L.Output):
        return {"k": "output", "child": plan_to_json(n.child),
                "names": [list(p) for p in n.names]}
    raise TypeError(f"unserializable plan node {type(n).__name__}")


def plan_from_json(d: Dict[str, Any]) -> L.LogicalNode:
    k = d["k"]
    if k == "scan":
        from .domain import TupleDomain

        dom = d.get("domain")
        return L.Scan(d["table"], dict(d["symbols"]),
                      {s: parse_type_str(t) for s, t in d["schema"].items()},
                      None if dom is None else TupleDomain.from_json(dom))
    if k == "filter":
        return L.Filter(plan_from_json(d["child"]),
                        expr_from_json(d["predicate"]))
    if k == "project":
        return L.Project(plan_from_json(d["child"]),
                         [(s, expr_from_json(e)) for s, e in d["outputs"]])
    if k == "agg":
        aggs = [L.AggCall(a["symbol"], a["fn"],
                          None if a["arg"] is None else expr_from_json(a["arg"]),
                          a["distinct"], parse_type_str(a["t"]),
                          param=a.get("param"))
                for a in d["aggs"]]
        return L.Aggregate(plan_from_json(d["child"]), list(d["group"]),
                           aggs, d["primary"])
    if k == "join":
        return L.Join(
            plan_from_json(d["left"]), plan_from_json(d["right"]), d["kind"],
            [(expr_from_json(a), expr_from_json(b)) for a, b in d["equis"]],
            None if d["residual"] is None else expr_from_json(d["residual"]),
            d["build_unique"])
    if k == "single_row":
        return L.SingleRow()
    if k == "union":
        return L.Union([plan_from_json(c) for c in d["inputs"]],
                       [(s, parse_type_str(t), list(srcs))
                        for s, t, srcs in d["outputs"]])
    if k == "window":
        return L.WindowNode(
            plan_from_json(d["child"]),
            [expr_from_json(e) for e in d["partition_by"]],
            [(expr_from_json(e), asc, nf) for e, asc, nf in d["order_by"]],
            [L.WinCall(c[0], c[1],
                       None if c[2] is None else expr_from_json(c[2]),
                       parse_type_str(c[3]),
                       frame=None if c[4] is None else tuple(c[4]),
                       default=None if c[5] is None else expr_from_json(c[5]),
                       param=c[6])
             for c in d["calls"]])
    if k == "unnest":
        return L.Unnest(plan_from_json(d["child"]),
                        expr_from_json(d["array"]), d["symbol"],
                        d.get("value_symbol"))
    if k == "mark_distinct":
        return L.MarkDistinct(
            plan_from_json(d["child"]), list(d["group"]),
            [(m, [expr_from_json(e) for e in keys])
             for m, keys in d["markers"]])
    if k == "sort":
        return L.Sort(plan_from_json(d["child"]),
                      [(expr_from_json(e), asc, nf)
                       for e, asc, nf in d["keys"]], d["limit"],
                      d.get("offset", 0))
    if k == "merge_sorted":
        return L.MergeSorted(plan_from_json(d["child"]),
                             [(expr_from_json(e), asc, nf)
                              for e, asc, nf in d["keys"]], d["limit"],
                             d.get("offset", 0))
    if k == "limit":
        return L.Limit(plan_from_json(d["child"]), d["n"],
                       d.get("offset", 0))
    if k == "output":
        return L.Output(plan_from_json(d["child"]),
                        [tuple(p) for p in d["names"]])
    raise ValueError(f"unknown plan kind {k}")
