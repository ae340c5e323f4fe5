"""Expression evaluation: jnp tracing with SQL three-valued logic.

This module is the engine's "codegen": where the reference compiles
RowExpressions to JVM bytecode per query (``sql/gen/PageFunctionCompiler.java``,
``sql/gen/ExpressionCompiler.java``), we evaluate the IR with jnp ops inside a
jit trace, and XLA fuses the resulting elementwise graph into the surrounding
operator — the same "one fused inner loop per projection" outcome with no
bytecode machinery.

Null handling follows SQL 3VL (Kleene AND/OR), mirroring the reference's
null-propagation conventions.  Invalid lanes are normalised to zero so
garbage never leaks into downstream arithmetic.

String expressions never reach the device: `bind_string_ops` folds any
subtree over a single varchar column into a DictLookup — a host-evaluated
table over the column's sorted dictionary, gathered on device.  This is the
TPU-native replacement for Trino's per-row Slice operations
(``spi/block/VariableWidthBlock.java``).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch
from ..types import BOOLEAN, DOUBLE, DecimalType, SqlType, VARCHAR
from .ir import Call, ColumnRef, DictLookup, Expr, Lambda, Literal, walk

# ------------------------------------------------------------------ values

# Internal value: (data: jnp.ndarray | scalar, validity: jnp.ndarray | None)


def _norm(data, validity):
    """Zero out invalid lanes so they can't poison later arithmetic."""
    if validity is None:
        return data
    if data.dtype == jnp.bool_:
        return data & validity
    return jnp.where(validity, data, jnp.zeros((), data.dtype))


def _and_validity(va, vb):
    if va is None:
        return vb
    if vb is None:
        return va
    return va & vb


def _scale_of(t: SqlType) -> int:
    return t.scale if t.kind == "decimal" else 0  # type: ignore[attr-defined]


# HyperLogLog precision for approx_distinct: m = 2^11 = 2048 registers,
# standard error 1.04/sqrt(m) ≈ 2.3% — Trino's default
# (operator/aggregation/ApproximateCountDistinctAggregations.java).
HLL_P = 11
HLL_M = 1 << HLL_P


def _splitmix63(bits):
    """splitmix64 finalizer over int64 bits, masked to 63 bits (nonneg)."""
    x = bits.astype(jnp.uint64)
    x = (x ^ (x >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
    x = x ^ (x >> jnp.uint64(31))
    return (x & jnp.uint64((1 << 63) - 1)).astype(jnp.int64)


def _splitmix63_host(bits: "np.ndarray") -> "np.ndarray":
    with np.errstate(over="ignore"):
        x = bits.astype(np.uint64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        return (x & np.uint64((1 << 63) - 1)).astype(np.int64)


def _rescale(data, from_scale: int, to_scale: int):
    if to_scale == from_scale:
        return data
    if to_scale > from_scale:
        return data * (10 ** (to_scale - from_scale))
    # Round half away from zero, matching the reference's decimal rescale.
    f = 10 ** (from_scale - to_scale)
    return (data + jnp.sign(data) * (f // 2)) // f


def _to_double(data, t: SqlType):
    if t.kind == "decimal":
        return data.astype(jnp.float64) / (10 ** _scale_of(t))
    return data.astype(jnp.float64)


# ------------------------------------------------------------------ eval


class _Nested:
    """Array/map value inside the evaluator: [n, W] element matrix +
    per-row lengths (+ aligned value matrix for maps)."""

    __slots__ = ("data", "lengths", "map_values")

    def __init__(self, data, lengths, map_values=None):
        self.data = data
        self.lengths = lengths
        self.map_values = map_values


def eval_expr(expr: Expr, batch: RecordBatch) -> Column:
    data, validity, dictionary = _eval(expr, batch)
    if isinstance(data, _Nested):
        return Column(data.data, expr.type, validity=validity,
                      dictionary=dictionary, lengths=data.lengths,
                      map_values=data.map_values)
    n = batch.capacity()
    if not hasattr(data, "shape") or data.shape == ():
        data = jnp.full((n,), data, dtype=np.dtype(expr.type.np_dtype))
    return Column(data, expr.type, validity=validity, dictionary=dictionary)


def eval_predicate(expr: Expr, batch: RecordBatch) -> jnp.ndarray:
    """WHERE semantics: NULL counts as false."""
    c = eval_expr(expr, batch)
    mask = c.data
    if c.validity is not None:
        mask = mask & c.validity
    return mask


def _eval(expr: Expr, batch: RecordBatch):
    if isinstance(expr, Literal):
        if expr.value is None:  # typed NULL (grouping sets, defaults)
            n = batch.capacity()
            t = expr.type
            dt = jnp.int64 if t.kind == "decimal" else np.dtype(t.np_dtype)
            dic = np.empty(0, dtype="U1") if t.is_string else None
            return (jnp.zeros((n,), dt), jnp.zeros((n,), bool), dic)
        if expr.type.is_string and isinstance(expr.value, str):
            # constant varchar: a one-entry dictionary, code 0 everywhere
            return (jnp.zeros((), jnp.int32), None,
                    np.asarray([expr.value]))
        return _literal_value(expr), None, None
    if isinstance(expr, ColumnRef):
        c = batch[expr.name]
        if c.lengths is not None:
            return (_Nested(c.data, c.lengths, c.map_values), c.validity,
                    c.dictionary)
        return c.data, c.validity, c.dictionary
    if isinstance(expr, DictLookup):
        c = batch[expr.column.name]
        table = jnp.asarray(expr.table)
        overflow = len(expr.table) - 1
        codes = jnp.where(
            (c.data >= 0) & (c.data < overflow), c.data, overflow
        )
        data = jnp.take(table, codes)
        validity = c.validity
        if expr.valid_table is not None:  # NULL-bearing fold
            ve = jnp.take(jnp.asarray(expr.valid_table), codes)
            validity = ve if validity is None else (validity & ve)
        return _norm(data, validity), validity, expr.dictionary
    if isinstance(expr, Call):
        return _eval_call(expr, batch)
    raise TypeError(f"cannot evaluate {expr}")


def _literal_value(expr: Literal):
    t = expr.type
    if t.kind == "decimal":
        return jnp.asarray(int(expr.value), dtype=jnp.int64)
    if t.is_string:
        raise TypeError(
            "string literal reached device evaluation — bind_string_ops "
            f"should have folded it ({expr.value!r})"
        )
    return jnp.asarray(expr.value, dtype=np.dtype(t.np_dtype))


def _eval_call(expr: Call, batch: RecordBatch):
    fn = expr.fn

    if fn in ("and", "or"):
        a, va, _ = _eval(expr.args[0], batch)
        b, vb, _ = _eval(expr.args[1], batch)
        if fn == "and":
            data = a & b
            if va is None and vb is None:
                return data, None, None
            ta = a if va is None else (a & va)
            tb = b if vb is None else (b & vb)
            fa = (~a) if va is None else ((~a) & va)
            fb = (~b) if vb is None else ((~b) & vb)
            validity = (ta & tb) | fa | fb  # known unless an unknown survives
            return _norm(data, validity), validity, None
        else:
            data = a | b
            if va is None and vb is None:
                return data, None, None
            ta = a if va is None else (a & va)
            tb = b if vb is None else (b & vb)
            fa = (~a) if va is None else ((~a) & va)
            fb = (~b) if vb is None else ((~b) & vb)
            validity = (fa & fb) | ta | tb
            return _norm(data, validity), validity, None

    if fn == "not":
        a, va, _ = _eval(expr.args[0], batch)
        return _norm(~a, va), va, None

    if fn == "is_null":
        _, va, _ = _eval(expr.args[0], batch)
        n = batch.capacity()
        if va is None:
            return jnp.zeros((n,), dtype=jnp.bool_), None, None
        return ~va, None, None

    if fn == "__mask":
        # __mask(value, cond): value with validity &= cond — the aggregate
        # mask carrier for MarkDistinct rewrites (NULL rows don't count)
        data, va, d = _eval(expr.args[0], batch)
        cond, vc, _ = _eval(expr.args[1], batch)
        keep = cond if vc is None else (cond & vc)
        validity = keep if va is None else (va & keep)
        return _norm(data, validity), validity, d

    if fn == "coalesce":
        data, validity, d = _eval(expr.args[0], batch)
        for a in expr.args[1:]:
            if validity is None:
                break
            db, vb, _ = _eval(a, batch)
            data = jnp.where(validity, data, db)
            validity = validity | (jnp.ones_like(validity) if vb is None else vb)
        return _norm(data, validity), validity, d

    if fn == "case":
        # args = [c1, v1, c2, v2, ..., else]
        args = expr.args
        out_t = expr.type
        data, validity, _ = _eval_coerced(args[-1], batch, out_t)
        n = batch.capacity()
        if validity is None:
            validity = jnp.ones((n,), dtype=jnp.bool_)
        for i in range(len(args) - 3, -1, -2):
            cond, vc, _ = _eval(args[i], batch)
            val, vv, _ = _eval_coerced(args[i + 1], batch, out_t)
            take = cond if vc is None else (cond & vc)
            data = jnp.where(take, val, data)
            vv_arr = jnp.ones((n,), dtype=jnp.bool_) if vv is None else vv
            validity = jnp.where(take, vv_arr, validity)
        return _norm(data, validity), validity, None

    if fn == "in":
        child, vc, _ = _eval(expr.args[0], batch)
        t = expr.args[0].type
        hits = None
        for a in expr.args[1:]:
            av, _, _ = _eval_coerced(a, batch, t)
            h = child == av
            hits = h if hits is None else (hits | h)
        return _norm(hits, vc), vc, None

    if fn == "cast":
        return _eval_cast(expr, batch)

    if fn.startswith("extract_"):
        from ..types import MICROS_PER_DAY

        raw, va, _ = _eval(expr.args[0], batch)
        raw = raw.astype(jnp.int64)
        kind = expr.args[0].type.kind
        if kind == "timestamptz":  # civil fields read in the zone
            raw = raw + expr.args[0].type.offset_micros
        if kind in ("timestamp", "timestamptz"):
            days = jnp.floor_divide(raw, MICROS_PER_DAY)
            tod = raw - days * MICROS_PER_DAY  # micros within the day
        else:
            days, tod = raw, None
        field = fn[len("extract_"):]
        if field in ("hour", "minute", "second", "millisecond"):
            if tod is None:
                tod = jnp.zeros_like(days)
            if field == "hour":
                out = tod // 3_600_000_000
            elif field == "minute":
                out = (tod // 60_000_000) % 60
            elif field == "second":
                out = (tod // 1_000_000) % 60
            else:
                out = (tod // 1_000) % 1000
            return _norm(out.astype(jnp.int64), va), va, None
        y, m, dom = _civil_full(days)
        if field == "year":
            out = y
        elif field == "month":
            out = m
        elif field == "day":
            out = dom
        elif field == "quarter":
            out = (m - 1) // 3 + 1
        elif field in ("dow", "day_of_week"):  # ISO: 1=Monday..7=Sunday
            out = (days + 3) % 7 + 1
        elif field in ("doy", "day_of_year"):
            out = days - _days_from_civil(y, jnp.ones_like(m),
                                          jnp.ones_like(dom)) + 1
        elif field in ("week", "week_of_year"):  # ISO week number
            doy = days - _days_from_civil(y, jnp.ones_like(m),
                                          jnp.ones_like(dom)) + 1
            dow = (days + 3) % 7 + 1

            def weeks_in(yy):
                p = (yy + yy // 4 - yy // 100 + yy // 400) % 7
                py = yy - 1
                pp = (py + py // 4 - py // 100 + py // 400) % 7
                return 52 + ((p == 4) | (pp == 3)).astype(jnp.int64)

            wk = (doy - dow + 10) // 7
            out = jnp.where(wk < 1, weeks_in(y - 1),
                            jnp.where(wk > weeks_in(y), 1, wk))
        else:
            raise NotImplementedError(f"extract({field})")
        return _norm(out.astype(jnp.int64), va), va, None

    if fn == "date_trunc":
        from ..types import MICROS_PER_DAY

        unit = expr.args[0].value  # constant varchar
        raw, va, _ = _eval(expr.args[1], batch)
        raw = raw.astype(jnp.int64)
        tkind = expr.args[1].type.kind
        is_ts = tkind in ("timestamp", "timestamptz")
        # truncate in the zone's civil frame, then shift back to UTC
        off = (expr.args[1].type.offset_micros
               if tkind == "timestamptz" else 0)
        raw = raw + off
        if is_ts and unit in ("millisecond", "second", "minute", "hour"):
            step = {"millisecond": 1_000, "second": 1_000_000,
                    "minute": 60_000_000, "hour": 3_600_000_000}[unit]
            out = jnp.floor_divide(raw, step) * step - off
            return _norm(out, va), va, None
        days = jnp.floor_divide(raw, MICROS_PER_DAY) if is_ts else raw
        y, m, dom = _civil_full(days)
        one = jnp.ones_like(m)
        if unit == "day":
            out = days
        elif unit == "week":  # Monday
            out = days - ((days + 3) % 7)
        elif unit == "month":
            out = _days_from_civil(y, m, one)
        elif unit == "quarter":
            out = _days_from_civil(y, ((m - 1) // 3) * 3 + 1, one)
        elif unit == "year":
            out = _days_from_civil(y, one, one)
        else:
            raise NotImplementedError(f"date_trunc({unit})")
        if is_ts:
            return _norm(out * MICROS_PER_DAY - off, va), va, None
        return _norm(out.astype(jnp.int32), va), va, None

    if fn == "date_add":
        from ..types import MICROS_PER_DAY

        unit = expr.args[0].value
        n, vn, _ = _eval(expr.args[1], batch)
        raw, va, _ = _eval(expr.args[2], batch)
        raw = raw.astype(jnp.int64)
        n = n.astype(jnp.int64) if hasattr(n, "astype") else jnp.asarray(
            n, jnp.int64)
        is_ts = expr.args[2].type.kind == "timestamp"
        v = _and_validity(vn, va)
        if is_ts and unit in ("millisecond", "second", "minute", "hour"):
            step = {"millisecond": 1_000, "second": 1_000_000,
                    "minute": 60_000_000, "hour": 3_600_000_000}[unit]
            return _norm(raw + n * step, v), v, None
        if is_ts:
            days = jnp.floor_divide(raw, MICROS_PER_DAY)
            tod = raw - days * MICROS_PER_DAY
        else:
            days, tod = raw, None
        if unit == "day":
            out = days + n
        elif unit == "week":
            out = days + 7 * n
        elif unit in ("month", "year"):
            y, m, dom = _civil_full(days)
            months = (y * 12 + (m - 1)
                      + (n if unit == "month" else 12 * n))
            y2 = jnp.floor_divide(months, 12)
            m2 = months - y2 * 12 + 1
            # clamp day to the target month's length
            last = _days_from_civil(
                jnp.where(m2 == 12, y2 + 1, y2),
                jnp.where(m2 == 12, 1, m2 + 1),
                jnp.ones_like(m2)) - 1
            out = jnp.minimum(_days_from_civil(y2, m2, dom), last)
        else:
            raise NotImplementedError(f"date_add({unit})")
        if is_ts:
            return _norm(out * MICROS_PER_DAY + tod, v), v, None
        return _norm(out.astype(jnp.int32), v), v, None

    if fn == "date_diff":
        from ..types import MICROS_PER_DAY

        unit = expr.args[0].value
        a, va, _ = _eval(expr.args[1], batch)
        b, vb, _ = _eval(expr.args[2], batch)
        a = a.astype(jnp.int64)
        b = b.astype(jnp.int64)
        ta = expr.args[1].type.kind
        tb = expr.args[2].type.kind
        v = _and_validity(va, vb)
        if "timestamp" in (ta, tb):
            ua = a * MICROS_PER_DAY if ta == "date" else a
            ub = b * MICROS_PER_DAY if tb == "date" else b
            if unit in ("millisecond", "second", "minute", "hour"):
                step = {"millisecond": 1_000, "second": 1_000_000,
                        "minute": 60_000_000, "hour": 3_600_000_000}[unit]
                return _norm((ub - ua) // step, v), v, None
            a = jnp.floor_divide(ua, MICROS_PER_DAY)
            b = jnp.floor_divide(ub, MICROS_PER_DAY)
        if unit == "day":
            out = b - a
        elif unit == "week":
            out = (b - a) // 7
        elif unit in ("month", "year"):
            y1, m1, d1 = _civil_full(a)
            y2, m2, d2 = _civil_full(b)
            months = (y2 * 12 + m2) - (y1 * 12 + m1) - (d2 < d1)
            out = months if unit == "month" else months // 12
        else:
            raise NotImplementedError(f"date_diff({unit})")
        return _norm(out.astype(jnp.int64), v), v, None

    if fn in ("=", "<>", "<", "<=", ">", ">="):
        return _eval_compare(expr, batch)

    if fn in ("+", "-", "*", "/", "min2", "max2"):
        return _eval_arith(expr, batch)

    if fn == "neg":
        a, va, _ = _eval(expr.args[0], batch)
        return _norm(-a, va), va, None

    if fn == "abs":
        a, va, _ = _eval(expr.args[0], batch)
        return _norm(jnp.abs(a), va), va, None

    if fn in ("floor", "ceil"):
        a, va, _ = _eval(expr.args[0], batch)
        t = expr.args[0].type
        if t.kind == "decimal":
            s = 10 ** _scale_of(t)
            out = jnp.floor_divide(a, s) if fn == "floor" \
                else -jnp.floor_divide(-a, s)
        elif t.kind == "double":
            out = jnp.floor(a) if fn == "floor" else jnp.ceil(a)
            out = out.astype(jnp.float64)
        else:
            out = a
        if expr.type.kind == "bigint":
            out = out.astype(jnp.int64)
        return _norm(out, va), va, None

    if fn == "round":
        a, va, _ = _eval(expr.args[0], batch)
        t = expr.args[0].type
        d = int(expr.args[1].value) if len(expr.args) > 1 else 0
        if t.kind == "decimal":
            out = _rescale(_rescale(a, _scale_of(t), d), d, _scale_of(t))
        else:
            f = 10.0 ** d
            out = jnp.round(a * f) / f
        return _norm(out, va), va, None

    if fn == "sqrt":
        a, va, _ = _eval(expr.args[0], batch)
        return _norm(jnp.sqrt(_to_double(a, expr.args[0].type)), va), va, None

    if fn in ("array_ctor", "cardinality", "element_at", "contains",
              "array_position", "array_min", "array_max", "transform",
              "filter", "any_match", "all_match", "none_match", "map",
              "map_keys", "map_values", "array_concat"):
        return _eval_array_fn(expr, batch)

    if fn == "__hll_hash":
        # 63-bit avalanche hash of the value's int64 bits (splitmix64) —
        # the register/rho source for approx_distinct's HLL sketch.
        # Strings never reach here: they fold through the dictionary
        # (host hash_strings_host), so the hash is value-based and
        # identical on every host.
        a, va, _ = _eval(expr.args[0], batch)
        t = expr.args[0].type
        if t.kind in ("double", "real"):
            import jax

            bits = jax.lax.bitcast_convert_type(
                a.astype(jnp.float64), jnp.int64)
        else:
            bits = a.astype(jnp.int64)
        return _norm(_splitmix63(bits), va), va, None

    if fn == "__hll_reg":  # low HLL_P bits -> register index
        a, va, _ = _eval(expr.args[0], batch)
        return _norm(a & (HLL_M - 1), va), va, None

    if fn == "__hll_rho":  # leading-zero run of the remaining bits, +1
        import jax

        a, va, _ = _eval(expr.args[0], batch)
        w = a >> HLL_P  # 63-HLL_P significant bits
        rho = jax.lax.clz(w.astype(jnp.int64)) - (HLL_P + 1) + 1
        return _norm(rho.astype(jnp.int64), va), va, None

    if fn in ("ln", "exp", "log2", "log10"):
        a, va, _ = _eval(expr.args[0], batch)
        f = {"ln": jnp.log, "exp": jnp.exp, "log2": jnp.log2,
             "log10": jnp.log10}[fn]
        return _norm(f(_to_double(a, expr.args[0].type)), va), va, None

    if fn == "power":
        a, va, _ = _eval(expr.args[0], batch)
        b, vb, _ = _eval(expr.args[1], batch)
        v = _and_validity(va, vb)
        out = jnp.power(_to_double(a, expr.args[0].type),
                        _to_double(b, expr.args[1].type))
        return _norm(out, v), v, None

    if fn in ("sin", "cos", "tan", "asin", "acos", "atan", "sinh",
              "cosh", "tanh", "cbrt", "degrees", "radians"):
        a, va, _ = _eval(expr.args[0], batch)
        x = _to_double(a, expr.args[0].type)
        f = {"sin": jnp.sin, "cos": jnp.cos, "tan": jnp.tan,
             "asin": jnp.arcsin, "acos": jnp.arccos, "atan": jnp.arctan,
             "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
             "cbrt": jnp.cbrt, "degrees": jnp.degrees,
             "radians": jnp.radians}[fn]
        return _norm(f(x), va), va, None

    if fn == "atan2":
        a, va, _ = _eval(expr.args[0], batch)
        b, vb, _ = _eval(expr.args[1], batch)
        v = _and_validity(va, vb)
        out = jnp.arctan2(_to_double(a, expr.args[0].type),
                          _to_double(b, expr.args[1].type))
        return _norm(out, v), v, None

    if fn == "log":  # log(base, x) — Trino argument order
        a, va, _ = _eval(expr.args[0], batch)
        b, vb, _ = _eval(expr.args[1], batch)
        v = _and_validity(va, vb)
        out = (jnp.log(_to_double(b, expr.args[1].type))
               / jnp.log(_to_double(a, expr.args[0].type)))
        return _norm(out, v), v, None

    if fn == "sign":
        a, va, _ = _eval(expr.args[0], batch)
        out = jnp.sign(a)
        if expr.type.kind == "bigint":
            out = out.astype(jnp.int64)
        return _norm(out, va), va, None

    if fn == "truncate":
        a, va, _ = _eval(expr.args[0], batch)
        return _norm(jnp.trunc(_to_double(a, expr.args[0].type)), va), \
            va, None

    if fn in ("is_nan", "is_finite", "is_infinite"):
        a, va, _ = _eval(expr.args[0], batch)
        x = _to_double(a, expr.args[0].type)
        out = {"is_nan": jnp.isnan, "is_finite": jnp.isfinite,
               "is_infinite": jnp.isinf}[fn](x)
        return _norm(out, va), va, None

    if fn == "mod":
        a, b, va, vb, t = _common_pair(expr.args[0], expr.args[1], batch)
        v = _and_validity(va, vb)
        return _norm(a % b, v), v, None

    if fn == "nullif":
        a, va, _ = _eval(expr.args[0], batch)
        b, vb, _ = _eval_coerced(expr.args[1], batch, expr.args[0].type)
        eq = a == b
        validity = (~eq) if va is None else (va & ~eq)
        return _norm(a, validity), validity, None

    if fn in ("greatest", "least"):
        op = jnp.maximum if fn == "greatest" else jnp.minimum
        data, validity, _ = _eval_coerced(expr.args[0], batch, expr.type)
        for arg in expr.args[1:]:
            d2, v2, _ = _eval_coerced(arg, batch, expr.type)
            data = op(data, d2)
            validity = _and_validity(validity, v2)
        return _norm(data, validity), validity, None

    if fn in ("like", "substring", "||"):
        raise TypeError(
            f"string op '{fn}' reached device evaluation — run bind_string_ops first"
        )
    raise NotImplementedError(f"function {fn}")


def _eval_coerced(expr: Expr, batch: RecordBatch, target: SqlType):
    data, validity, d = _eval(expr, batch)
    t = expr.type
    if t == target:
        return data, validity, d
    if target.kind == "double":
        return _to_double(data, t), validity, d
    if target.kind == "decimal":
        if t.kind in ("bigint", "integer", "decimal"):
            return _rescale(
                data.astype(jnp.int64), _scale_of(t), _scale_of(target)
            ), validity, d
    if target.kind == "bigint":
        return data.astype(jnp.int64), validity, d
    if target.kind == "integer":
        return data.astype(jnp.int32), validity, d
    if target.kind == t.kind:
        return data, validity, d
    raise TypeError(f"cannot coerce {t} -> {target}")


def _common_pair(ea: Expr, eb: Expr, batch: RecordBatch):
    from ..types import common_supertype

    a, va, _ = _eval(ea, batch)
    b, vb, _ = _eval(eb, batch)
    ta, tb = ea.type, eb.type
    if ta.is_string or tb.is_string:
        raise TypeError("string comparison reached device evaluation")
    if ta == tb:
        return a, b, va, vb, ta
    t = common_supertype(ta, tb)
    if t.kind == "double":
        return _to_double(a, ta), _to_double(b, tb), va, vb, t
    if t.kind == "decimal":
        s = max(_scale_of(ta), _scale_of(tb))
        t = DecimalType(38, s)
        return (
            _rescale(a.astype(jnp.int64), _scale_of(ta), s),
            _rescale(b.astype(jnp.int64), _scale_of(tb), s),
            va, vb, t,
        )
    if t.kind == "timestamp":
        # date -> timestamp coercion changes units (days -> micros)
        from ..types import MICROS_PER_DAY

        def to_us(x, tx):
            x = x.astype(jnp.int64)
            return x * MICROS_PER_DAY if tx.kind == "date" else x

        return to_us(a, ta), to_us(b, tb), va, vb, t
    return a.astype(np.dtype(t.np_dtype)), b.astype(np.dtype(t.np_dtype)), va, vb, t


def _eval_compare(expr: Call, batch: RecordBatch):
    ea, eb = expr.args[0], expr.args[1]
    if {ea.type.kind, eb.type.kind} == {"decimal", "double"}:
        # decimal CMP double: scale the DOUBLE side up by 10^s and compare
        # against the raw scaled int — equivalent ordering with no f64
        # division over the (possibly join-expanded) decimal column.
        # f64 is emulated on TPU; the divide form also crashes the v5e
        # AOT compiler inside join-residual fusions (q17/q22, BASELINE).
        a, va, _ = _eval(ea, batch)
        b, vb, _ = _eval(eb, batch)
        if ea.type.kind == "decimal":
            a = a.astype(jnp.float64)
            b = b * (10.0 ** _scale_of(ea.type))
        else:
            a = a * (10.0 ** _scale_of(eb.type))
            b = b.astype(jnp.float64)
    else:
        a, b, va, vb, _ = _common_pair(ea, eb, batch)
    fn = expr.fn
    if fn == "=":
        out = a == b
    elif fn == "<>":
        out = a != b
    elif fn == "<":
        out = a < b
    elif fn == "<=":
        out = a <= b
    elif fn == ">":
        out = a > b
    else:
        out = a >= b
    v = _and_validity(va, vb)
    return _norm(out, v), v, None


def _eval_arith(expr: Call, batch: RecordBatch):
    fn = expr.fn
    ea, eb = expr.args[0], expr.args[1]
    ta, tb = ea.type, eb.type
    out_t = expr.type

    if fn == "*" and out_t.kind == "decimal":
        a, va, _ = _eval(ea, batch)
        b, vb, _ = _eval(eb, batch)
        a = a.astype(jnp.int64) if ta.kind != "double" else a
        b = b.astype(jnp.int64) if tb.kind != "double" else b
        v = _and_validity(va, vb)
        return _norm(a * b, v), v, None

    if fn == "/" and (ta.kind == "decimal" or tb.kind == "decimal") and out_t.kind == "double":
        a, va, _ = _eval(ea, batch)
        b, vb, _ = _eval(eb, batch)
        v = _and_validity(va, vb)
        out = _to_double(a, ta) / _to_double(b, tb)
        return _norm(out, v), v, None

    a, b, va, vb, t = _common_pair(ea, eb, batch)
    v = _and_validity(va, vb)
    if fn == "+":
        out = a + b
    elif fn == "-":
        out = a - b
    elif fn == "*":
        out = a * b
    elif fn == "min2":
        out = jnp.minimum(a, b)
    elif fn == "max2":
        out = jnp.maximum(a, b)
    else:  # '/'
        if t.kind == "real":
            out = a / b  # fp32 division (RealType semantics)
        elif t.kind == "double" or out_t.kind == "double":
            out = _to_double(a, t) / _to_double(b, t)
        else:
            out = a // b
    if out_t.kind == "double" and out.dtype != jnp.float64:
        out = _to_double(out, t)
    return _norm(out, v), v, None


def _eval_cast(expr: Call, batch: RecordBatch):
    child = expr.args[0]
    data, validity, d = _eval(child, batch)
    t, target = child.type, expr.type
    if target.kind == "double":
        return _to_double(data, t), validity, None
    if target.kind == "decimal":
        if t.kind == "double":
            s = 10 ** _scale_of(target)
            return jnp.round(data * s).astype(jnp.int64), validity, None
        return _rescale(data.astype(jnp.int64), _scale_of(t), _scale_of(target)), validity, None
    if target.kind == "bigint":
        if t.kind == "decimal":
            return _rescale(data, _scale_of(t), 0), validity, None
        return data.astype(jnp.int64), validity, None
    if target.kind == "integer":
        return data.astype(jnp.int32), validity, None
    if target.kind == "smallint":
        return data.astype(jnp.int16), validity, None
    if target.kind == "tinyint":
        return data.astype(jnp.int8), validity, None
    if target.kind == "real":
        return _to_double(data, t).astype(jnp.float32), validity, None
    if target.kind == "timestamp":
        from ..types import MICROS_PER_DAY

        if t.kind == "date":
            return (data.astype(jnp.int64) * MICROS_PER_DAY, validity, None)
        if t.kind == "timestamp":
            return data, validity, None
        if t.kind == "timestamptz":
            # the LOCAL civil timestamp in the column's zone
            return data + t.offset_micros, validity, None
    if target.kind == "timestamptz":
        from ..types import MICROS_PER_DAY

        # naive values are session-zone (= UTC) instants, so these casts
        # are instant-preserving; the target offset is display metadata
        if t.kind == "date":
            return (data.astype(jnp.int64) * MICROS_PER_DAY, validity,
                    None)
        if t.kind in ("timestamp", "timestamptz"):
            return data, validity, None
    if target.kind == "date" and t.kind in ("timestamp", "timestamptz"):
        from ..types import MICROS_PER_DAY

        local = data if t.kind == "timestamp" else data + t.offset_micros
        return (jnp.floor_divide(local, MICROS_PER_DAY).astype(jnp.int32),
                validity, None)
    if target.is_string and t.is_string:
        return data, validity, d  # char <-> varchar share dictionary codes
    if target.kind == t.kind:
        return data, validity, d
    raise TypeError(f"cast {t} -> {target} unsupported on device")


def _civil_from_days(days):
    """days-since-epoch → (year, month); Howard Hinnant's civil_from_days."""
    y, m, _ = _civil_full(days)
    return y, m


def _civil_full(days):
    """days-since-epoch → (year, month, day-of-month)."""
    z = days.astype(jnp.int64) + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = y + (m <= 2)
    return y, m, d


def _days_from_civil(y, m, d):
    """(year, month, day) → days-since-epoch (Hinnant's days_from_civil)."""
    y = y - (m <= 2)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


# ------------------------------------------------- string-op binding (host)


# ------------------------------------------------------------ array/map fns


def _lane_mask(lengths, w):
    return jnp.arange(w, dtype=jnp.int32)[None, :] < lengths[:, None]


def _eval_array_fn(expr: Call, batch: RecordBatch):
    """Array/map function family over the padded [n, W] representation
    (reference: ``operator/scalar/Array*Function.java``, ``MapKeys``,
    ``ArrayTransformFunction`` — lambda bodies re-enter the scalar
    evaluator over the flattened element space, the jnp analog of the
    reference's compiled lambda bytecode)."""
    fn = expr.fn
    n = batch.capacity()

    def nested(i):
        d, v, dic = _eval(expr.args[i], batch)
        assert isinstance(d, _Nested), f"{fn}: argument {i} is not nested"
        return d, v, dic

    if fn == "array_ctor":
        k = len(expr.args)
        vals, valids = [], []
        dic = None
        for a in expr.args:
            d, v, adic = _eval(a, batch)
            if adic is not None:
                dic = adic if dic is None else dic
            if not hasattr(d, "shape") or d.shape == ():
                d = jnp.full((n,), d)
            vals.append(d)
            valids.append(v)
        data = jnp.stack(vals, axis=1) if k else jnp.zeros((n, 0),
                                                           jnp.int64)
        lengths = jnp.full((n,), k, jnp.int32)
        return _Nested(data, lengths), None, dic

    if fn == "map":
        kd, kv, kdic = nested(0)
        vd, vv, vdic = nested(1)
        return (_Nested(kd.data, kd.lengths, vd.data),
                _and_validity(kv, vv), kdic or vdic)

    if fn == "map_keys":
        d, v, dic = nested(0)
        return _Nested(d.data, d.lengths), v, dic

    if fn == "map_values":
        d, v, dic = nested(0)
        return _Nested(d.map_values, d.lengths), v, dic

    if fn == "cardinality":
        d, v, _ = nested(0)
        return _norm(d.lengths.astype(jnp.int64), v), v, None

    if fn == "array_concat":
        a, va, adic = nested(0)
        b, vb, _ = nested(1)
        rows = a.data.shape[0]
        wa, wb = a.data.shape[1], b.data.shape[1]
        w = wa + wb
        j = jnp.broadcast_to(jnp.arange(w, dtype=jnp.int32)[None, :],
                             (rows, w))
        la = a.lengths[:, None].astype(jnp.int32)
        from_a = j < la
        da = jnp.take_along_axis(
            a.data, jnp.clip(j, 0, max(wa - 1, 0)), axis=1) if wa \
            else jnp.zeros((rows, w), b.data.dtype)
        db = jnp.take_along_axis(
            b.data, jnp.clip(j - la, 0, max(wb - 1, 0)), axis=1) if wb \
            else jnp.zeros((rows, w), a.data.dtype)
        data = jnp.where(from_a, da, db)
        return (_Nested(data, a.lengths + b.lengths),
                _and_validity(va, vb), adic)

    if fn == "element_at":
        d, v, dic = nested(0)
        arr_t = expr.args[0].type
        w = max(d.data.shape[1], 1)
        if arr_t.kind == "map":
            key, kv2, _ = _eval(expr.args[1], batch)
            if not hasattr(key, "shape") or key.shape == ():
                key = jnp.full((n,), key)
            lanes = _lane_mask(d.lengths, d.data.shape[1])
            hit = (d.data == key[:, None]) & lanes
            found = jnp.any(hit, axis=1)
            idx = jnp.argmax(hit, axis=1)
            out = jnp.take_along_axis(d.map_values, idx[:, None],
                                      axis=1)[:, 0]
            validity = _and_validity(_and_validity(v, kv2), found)
            return _norm(out, validity), validity, dic
        i, iv, _ = _eval(expr.args[1], batch)
        if not hasattr(i, "shape") or i.shape == ():
            i = jnp.full((n,), i)
        i = i.astype(jnp.int32)
        # 1-based; negative counts from the end (Trino element_at)
        idx = jnp.where(i < 0, d.lengths + i, i - 1)
        ok = (idx >= 0) & (idx < d.lengths) & (i != 0)
        out = jnp.take_along_axis(d.data,
                                  jnp.clip(idx, 0, w - 1)[:, None],
                                  axis=1)[:, 0]
        validity = _and_validity(_and_validity(v, iv), ok)
        return _norm(out, validity), validity, dic

    if fn in ("contains", "array_position"):
        d, v, dic = nested(0)
        x, xv, xdic = _eval(expr.args[1], batch)
        if dic is not None and xdic is not None:
            # dictionary-coded elements: compare by value through a code
            # translation (both sides are sorted dictionaries)
            trans = jnp.asarray(
                np.searchsorted(dic, xdic).clip(0, max(len(dic) - 1, 0)))
            match_val = jnp.asarray(
                np.asarray(dic)[np.searchsorted(
                    dic, xdic).clip(0, max(len(dic) - 1, 0))] ==
                np.asarray(xdic))
            xx = jnp.take(trans, x if hasattr(x, "shape") and x.shape
                          else jnp.full((n,), x, jnp.int32))
            valx = jnp.take(match_val, x if hasattr(x, "shape") and x.shape
                            else jnp.full((n,), x, jnp.int32))
        else:
            xx = x if hasattr(x, "shape") and x.shape else jnp.full((n,), x)
            valx = None
        lanes = _lane_mask(d.lengths, d.data.shape[1])
        hit = (d.data == xx[:, None]) & lanes
        if valx is not None:
            hit = hit & valx[:, None]
        validity = _and_validity(v, xv)
        if fn == "contains":
            out = jnp.any(hit, axis=1)
            return _norm(out, validity), validity, None
        pos = jnp.where(jnp.any(hit, axis=1),
                        jnp.argmax(hit, axis=1) + 1, 0).astype(jnp.int64)
        return _norm(pos, validity), validity, None

    if fn in ("array_min", "array_max"):
        d, v, dic = nested(0)
        lanes = _lane_mask(d.lengths, d.data.shape[1])
        big = jnp.asarray(np.iinfo(np.int64).max, d.data.dtype) \
            if d.data.dtype.kind == "i" else jnp.asarray(np.inf,
                                                         d.data.dtype)
        if fn == "array_min":
            out = jnp.min(jnp.where(lanes, d.data, big), axis=1)
        else:
            out = jnp.max(jnp.where(lanes, d.data, -big), axis=1)
        nonempty = d.lengths > 0
        validity = _and_validity(v, nonempty)
        return _norm(out, validity), validity, dic

    # ---- lambda family: evaluate the body over the flattened elements
    d, v, dic = nested(0)
    lam = expr.args[1]
    assert isinstance(lam, Lambda)
    rows = d.data.shape[0]
    if d.data.shape[1] == 0:
        # zero-width element matrix (e.g. ``array[]`` literals): every row
        # is empty — the flatten/reshape round-trip below has no elements
        # to carry, so answer directly (ADVICE r3: reshape(rows, 0) crash)
        if fn == "transform":
            return _Nested(d.data, d.lengths), v, dic
        if fn == "filter":
            return _Nested(d.data,
                           jnp.zeros((rows,), jnp.int32)), v, dic
        out = (jnp.ones((rows,), bool) if fn in ("all_match", "none_match")
               else jnp.zeros((rows,), bool))
        return _norm(out, v), v, None
    flat = d.data.reshape(rows * d.data.shape[1])
    elem_t = expr.args[0].type.element
    cols = {lam.params[0]: Column(flat, elem_t, dictionary=dic)}
    # outer columns referenced by the body broadcast element-wise
    from .ir import referenced_columns

    for name in referenced_columns(lam.body) - set(lam.params):
        c = batch[name]
        cols[name] = Column(
            jnp.repeat(c.data, d.data.shape[1]), c.type,
            validity=None if c.validity is None
            else jnp.repeat(c.validity, d.data.shape[1]),
            dictionary=c.dictionary)
    ebatch = RecordBatch(cols, rows * d.data.shape[1])
    body = eval_expr(lam.body, ebatch)
    bdata = body.data.reshape(rows, d.data.shape[1])
    lanes = _lane_mask(d.lengths, d.data.shape[1])

    if fn == "transform":
        return _Nested(bdata, d.lengths), v, body.dictionary
    mask = bdata.astype(bool) & lanes
    if body.validity is not None:
        mask = mask & body.validity.reshape(rows, d.data.shape[1])
    if fn == "filter":
        # per-row lane compaction: stable sort along lanes by keep-flag
        key = (~mask).astype(jnp.int8)
        import jax

        _, data2 = jax.lax.sort((key, d.data), num_keys=1, dimension=1,
                                is_stable=True)
        return _Nested(data2, jnp.sum(mask, axis=1).astype(jnp.int32)), \
            v, dic
    if fn == "any_match":
        out = jnp.any(mask, axis=1)
    elif fn == "all_match":
        out = jnp.all(jnp.where(lanes, mask, True), axis=1)
    else:  # none_match
        out = ~jnp.any(mask, axis=1)
    return _norm(out, v), v, None


def bind_string_ops(expr: Expr, dicts: Dict[str, np.ndarray]) -> Expr:
    """Fold every maximal single-varchar-column subtree into a DictLookup.

    ``dicts`` maps column name -> sorted dictionary (np str array).
    """
    if isinstance(expr, (Literal, ColumnRef, DictLookup)):
        return expr
    if isinstance(expr, Lambda):
        return Lambda(expr.params, bind_string_ops(expr.body, dicts),
                      expr.type)
    assert isinstance(expr, Call)
    if _foldable(expr, dicts):
        return _fold(expr, dicts)
    folded = _fold_const_string(expr)
    if folded is not None:
        return folded
    return Call(expr.fn, tuple(bind_string_ops(a, dicts) for a in expr.args), expr.type)


def _fold_const_string(expr: Call):
    """Constant-fold a string-consuming subtree with NO column references
    (e.g. ``ltrim('  x ')``): substitute the first string literal as a
    one-row pseudo-column, run the host string evaluator, and return the
    result as a Literal."""
    nodes = list(walk(expr))
    if any(isinstance(e, (ColumnRef, DictLookup)) for e in nodes):
        return None
    lits = [e for e in nodes
            if isinstance(e, Literal) and e.type.is_string
            and isinstance(e.value, str)]
    if not lits:
        return None
    target = lits[0]
    ref = ColumnRef("__lit", VARCHAR)

    def sub(e):
        if e is target:
            return ref
        if isinstance(e, Call):
            return Call(e.fn, tuple(sub(a) for a in e.args), e.type)
        return e

    try:
        vals = _eval_strings(sub(expr), np.array([target.value]))
    except NotImplementedError:
        return None
    v = np.asarray(vals).reshape(-1)[0]
    if expr.type.is_string:
        return Literal(str(v), expr.type)
    if expr.type.kind == "boolean":
        return Literal(bool(v), expr.type)
    if expr.type.kind in ("double", "real"):
        return Literal(float(v), expr.type)
    return Literal(int(v), expr.type)


def _string_columns(expr: Expr):
    return {
        e.name for e in walk(expr)
        if isinstance(e, ColumnRef) and e.type.is_string
    }


def _foldable(expr: Call, dicts) -> bool:
    cols = _string_columns(expr)
    if len(cols) != 1 or next(iter(cols)) not in dicts:
        return False
    if expr.type.is_string:
        return True  # varchar-valued subtree (e.g. substring for group key)
    # predicate/numeric over strings: every leaf must be the one varchar
    # column or a literal (no mixed numeric columns in the folded subtree)
    for e in walk(expr):
        if isinstance(e, ColumnRef) and not e.type.is_string:
            return False
        if isinstance(e, DictLookup):
            return False
    # only fold nodes that actually consume strings
    return any(
        isinstance(e, (ColumnRef, Literal)) and e.type.is_string for e in walk(expr)
    )


def _fold(expr: Call, dicts) -> Expr:
    name = next(iter(_string_columns(expr)))
    dictionary = dicts[name]
    values = _eval_strings(expr, dictionary)
    colref = next(
        e for e in walk(expr) if isinstance(e, ColumnRef) and e.name == name
    )
    if expr.type.is_string:
        # NOT dictionary.dtype: derived strings can be longer than the
        # source column's fixed width (md5 of a U14 column is U32)
        new_dict, codes = np.unique(np.asarray(values, dtype=str),
                                    return_inverse=True)
        table = np.append(codes.astype(np.int32), np.int32(0))
        return DictLookup(colref, table, expr.type, label=_label(expr),
                          dictionary=new_dict)
    table = np.asarray(values)
    valid_table = None
    if table.dtype == object:  # NULL-bearing fold (CASE without ELSE)
        valid = np.array([v is not None for v in values], dtype=bool)
        dt = (np.int64 if expr.type.kind == "decimal"
              else np.dtype(expr.type.np_dtype))
        table = np.array([v if v is not None else 0 for v in values],
                         dtype=dt)
        valid_table = np.append(valid, np.zeros((1,), bool))
    table = np.append(table, np.zeros((1,), dtype=table.dtype))
    return DictLookup(colref, table, expr.type, label=_label(expr),
                      valid_table=valid_table)


def _label(expr: Expr) -> str:
    if isinstance(expr, Literal):
        return repr(expr.value)
    if isinstance(expr, ColumnRef):
        return expr.name
    if isinstance(expr, Call):
        return f"{expr.fn}({','.join(_label(a) for a in expr.args)})"
    return "?"


def _eval_strings(expr: Expr, values: np.ndarray):
    """Host evaluation of a string subtree over dictionary entries."""
    if isinstance(expr, ColumnRef):
        return values
    if isinstance(expr, Literal):
        if expr.type.kind == "decimal":
            return expr.value / (10 ** _scale_of(expr.type))
        return expr.value
    assert isinstance(expr, Call)
    fn = expr.fn
    args = [_eval_strings(a, values) for a in expr.args]
    if fn == "__hll_hash":
        # value-based (host) string hash — identical on every host, so
        # HLL registers merge correctly across the DCN plane
        from ..batch import hash_strings_host

        h = hash_strings_host(np.asarray(args[0], dtype="U"))
        return _splitmix63_host(h.view(np.int64))
    if fn == "__hll_reg":
        return np.asarray(args[0], dtype=np.int64) & (HLL_M - 1)
    if fn == "__hll_rho":
        w = np.asarray(args[0], dtype=np.int64) >> HLL_P
        nbits = 64 - HLL_P - 1
        rho = np.zeros(len(w), np.int64)
        wz = w.astype(np.uint64)
        # vectorized leading-zero count over the (63-HLL_P)-bit window
        lz = np.full(len(w), 64, np.int64)
        nz = wz != 0
        lz[nz] = 63 - np.floor(np.log2(wz[nz].astype(np.float64))).astype(
            np.int64)
        rho = np.minimum(lz - (HLL_P + 1) + 1, nbits + 1)
        return rho
    if fn == "like":
        return _like(args[0], expr.args[1].value)
    if fn == "substring":
        start, length = int(args[1]), (int(args[2]) if len(args) > 2 else None)
        s = start - 1
        e = None if length is None else s + length
        return np.array([v[s:e] for v in args[0]], dtype=values.dtype)
    if fn in ("||", "concat"):
        return np.char.add(np.asarray(args[0], dtype=str), np.asarray(args[1], dtype=str))
    if fn == "length":
        return np.char.str_len(np.asarray(args[0], dtype=str)).astype(np.int64)
    if fn == "upper":
        return np.char.upper(np.asarray(args[0], dtype=str))
    if fn == "lower":
        return np.char.lower(np.asarray(args[0], dtype=str))
    if fn == "trim":
        return np.char.strip(np.asarray(args[0], dtype=str))
    if fn == "ltrim":
        return np.char.lstrip(np.asarray(args[0], dtype=str))
    if fn == "rtrim":
        return np.char.rstrip(np.asarray(args[0], dtype=str))
    if fn == "reverse":
        return np.array([v[::-1] for v in np.asarray(args[0], dtype=str)],
                        dtype=str)
    if fn == "replace":
        frm = args[1] if len(args) > 1 else ""
        to = args[2] if len(args) > 2 else ""
        return np.array([v.replace(frm, to)
                         for v in np.asarray(args[0], dtype=str)], dtype=str)
    if fn in ("lpad", "rpad"):
        n, pad = int(args[1]), (args[2] if len(args) > 2 else " ")
        out = []
        for v in np.asarray(args[0], dtype=str):
            if len(v) >= n:
                out.append(v[:n])
            else:
                fill = (pad * n)[:n - len(v)]
                out.append(fill + v if fn == "lpad" else v + fill)
        return np.array(out, dtype=str)
    if fn == "strpos":
        sub = args[1]
        return np.array([v.find(sub) + 1
                         for v in np.asarray(args[0], dtype=str)],
                        dtype=np.int64)
    if fn == "starts_with":
        return np.array([v.startswith(args[1])
                         for v in np.asarray(args[0], dtype=str)], dtype=bool)
    if fn == "split_part":
        delim, idx = args[1], int(args[2])
        out = []
        for v in np.asarray(args[0], dtype=str):
            parts = v.split(delim)
            out.append(parts[idx - 1] if 0 < idx <= len(parts) else "")
        return np.array(out, dtype=str)
    if fn == "codepoint":
        return np.array([ord(v[0]) if v else 0
                         for v in np.asarray(args[0], dtype=str)],
                        dtype=np.int64)
    if fn == "levenshtein_distance":
        import difflib  # noqa: F401 — stdlib-only Levenshtein below

        def lev(a, b):
            if len(a) < len(b):
                a, b = b, a
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        sub = args[1]
        return np.array([lev(v, sub)
                         for v in np.asarray(args[0], dtype=str)],
                        dtype=np.int64)
    # --- binary family (reference: operator/scalar/VarbinaryFunctions).
    # varbinary dictionary entries are latin-1 strings: byte k <-> code
    # point k, bijective and order-preserving, so the whole dictionary
    # machinery (sorting, comparisons, group-by on codes) is byte-exact.
    if fn in ("to_hex", "md5", "sha1", "sha256", "sha512", "crc32",
              "to_utf8", "from_utf8", "from_hex", "to_base64",
              "from_base64"):
        import base64
        import hashlib
        import zlib

        binary_in = expr.args[0].type.kind == "varbinary"

        def as_bytes(v: str) -> bytes:
            return v.encode("latin-1" if binary_in else "utf-8")

        vals = np.asarray(args[0], dtype=str)
        if fn == "to_hex":
            return np.array([as_bytes(v).hex().upper() for v in vals],
                            dtype=str)
        if fn == "from_hex":
            return np.array([bytes.fromhex(v).decode("latin-1")
                             for v in vals], dtype=str)
        if fn == "to_utf8":
            return np.array([v.encode("utf-8").decode("latin-1")
                             for v in vals], dtype=str)
        if fn == "from_utf8":
            return np.array(
                [v.encode("latin-1").decode("utf-8", errors="replace")
                 for v in vals], dtype=str)
        if fn == "to_base64":
            return np.array(
                [base64.b64encode(as_bytes(v)).decode() for v in vals],
                dtype=str)
        if fn == "from_base64":
            return np.array(
                [base64.b64decode(v).decode("latin-1") for v in vals],
                dtype=str)
        if fn == "crc32":
            return np.array([zlib.crc32(as_bytes(v)) for v in vals],
                            dtype=np.int64)
        digest = getattr(hashlib, fn)
        if binary_in:  # varbinary -> varbinary (reference signature)
            return np.array(
                [digest(as_bytes(v)).digest().decode("latin-1")
                 for v in vals], dtype=str)
        return np.array([digest(v.encode()).hexdigest() for v in vals],
                        dtype=str)
    # --- regex family (reference: operator/scalar/JoniRegexpFunctions) ---
    if fn == "regexp_like":
        pat = re.compile(args[1])
        return np.array([bool(pat.search(v))
                         for v in np.asarray(args[0], dtype=str)], dtype=bool)
    if fn == "regexp_extract":
        pat = re.compile(args[1])
        group = int(args[2]) if len(args) > 2 else 0
        out = []
        for v in np.asarray(args[0], dtype=str):
            m = pat.search(v)
            out.append(m.group(group) if m and group <= pat.groups else "")
        return np.array(out, dtype=str)
    if fn == "regexp_replace":
        pat = re.compile(args[1])
        repl = re.sub(r"\$(\d+)", r"\\\1", args[2]) if len(args) > 2 else ""
        return np.array([pat.sub(repl, v)
                         for v in np.asarray(args[0], dtype=str)], dtype=str)
    if fn == "regexp_count":
        pat = re.compile(args[1])
        return np.array([len(pat.findall(v))
                         for v in np.asarray(args[0], dtype=str)],
                        dtype=np.int64)
    # --- JSON family (reference: operator/scalar/JsonFunctions) ---
    if fn in ("json_extract", "json_extract_scalar", "json_array_length",
              "json_size", "json_format"):
        import json

        def parse(v):
            try:
                return json.loads(v)
            except Exception:  # noqa: BLE001 — malformed json -> NULL
                return None

        def jpath(doc, path):
            # $.a.b[0] subset of JsonPath (the common analytics usage)
            if doc is None or not path.startswith("$"):
                return None
            cur = doc
            for m in re.finditer(r"\.([A-Za-z_][\w]*)|\[(\d+)\]", path):
                if cur is None:
                    return None
                if m.group(1) is not None:
                    cur = cur.get(m.group(1)) if isinstance(cur, dict) else None
                else:
                    i = int(m.group(2))
                    cur = cur[i] if isinstance(cur, list) and i < len(cur) \
                        else None
            return cur

        docs = [parse(v) for v in np.asarray(args[0], dtype=str)]
        if fn == "json_format":
            return np.array([json.dumps(d) if d is not None else ""
                             for d in docs], dtype=str)
        if fn == "json_array_length":
            return np.array([len(d) if isinstance(d, list) else -1
                             for d in docs], dtype=np.int64)
        path = args[1]
        vals = [jpath(d, path) for d in docs]
        if fn == "json_size":
            return np.array([len(v) if isinstance(v, (dict, list)) else 0
                             for v in vals], dtype=np.int64)
        if fn == "json_extract":
            return np.array([json.dumps(v) if v is not None else ""
                             for v in vals], dtype=str)
        # json_extract_scalar: scalars only, as text
        return np.array(
            [("" if v is None or isinstance(v, (dict, list))
              else (json.dumps(v) if isinstance(v, bool) else str(v)))
             for v in vals], dtype=str)
    # --- URL family (reference: operator/scalar/UrlFunctions) ---
    if fn.startswith("url_"):
        from urllib.parse import quote, unquote, urlparse

        vals = np.asarray(args[0], dtype=str)
        if fn == "url_encode":
            return np.array([quote(v, safe="") for v in vals], dtype=str)
        if fn == "url_decode":
            return np.array([unquote(v) for v in vals], dtype=str)
        parts = [urlparse(v) for v in vals]
        if fn == "url_extract_host":
            return np.array([p.hostname or "" for p in parts], dtype=str)
        if fn == "url_extract_path":
            return np.array([p.path for p in parts], dtype=str)
        if fn == "url_extract_protocol":
            return np.array([p.scheme for p in parts], dtype=str)
        if fn == "url_extract_query":
            return np.array([p.query for p in parts], dtype=str)
        if fn == "url_extract_fragment":
            return np.array([p.fragment for p in parts], dtype=str)
        if fn == "url_extract_port":
            return np.array([p.port if p.port is not None else -1
                             for p in parts], dtype=np.int64)
    if fn == "=":
        return np.asarray(args[0]) == args[1] if np.ndim(args[0]) else args[0] == np.asarray(args[1])
    if fn == "<>":
        return np.asarray(args[0]) != args[1]
    if fn == "<":
        return np.asarray(args[0]) < args[1]
    if fn == "<=":
        return np.asarray(args[0]) <= args[1]
    if fn == ">":
        return np.asarray(args[0]) > args[1]
    if fn == ">=":
        return np.asarray(args[0]) >= args[1]
    if fn == "in":
        hay = np.asarray(args[0])
        return np.isin(hay, np.asarray(args[1:]))
    if fn == "not":
        return ~np.asarray(args[0])
    if fn == "and":
        return np.asarray(args[0]) & np.asarray(args[1])
    if fn == "or":
        return np.asarray(args[0]) | np.asarray(args[1])
    if fn == "case":
        # None branch values (CASE without ELSE) keep the table in object
        # dtype; _fold converts it to a typed table + validity mask
        has_null = any(a is None for a in args[1::2]) or args[-1] is None
        dt = object if has_null else None
        out = np.broadcast_to(np.asarray(args[-1], dtype=dt),
                              values.shape).copy()
        for i in range(len(args) - 3, -1, -2):
            cond = np.broadcast_to(np.asarray(args[i]), values.shape)
            val = np.broadcast_to(np.asarray(args[i + 1], dtype=dt),
                                  values.shape)
            out = np.where(cond, val, out)
        return out
    if fn == "cast":
        if expr.type.is_string:  # identity / char-family casts keep text
            return np.asarray(args[0], dtype=str)
        if expr.type.kind == "decimal":
            scale = _scale_of(expr.type)
            return np.array(
                [int(round(float(v) * 10 ** scale))
                 for v in np.asarray(args[0], dtype=str)], dtype=np.int64)
        if expr.type.kind == "date" and expr.args[0].type.is_string:
            epoch_d = np.datetime64("1970-01-01", "D")
            return np.array(
                [int((np.datetime64(str(v).strip(), "D") - epoch_d)
                     / np.timedelta64(1, "D"))
                 for v in np.asarray(args[0], dtype=str)], dtype=np.int32)
        if expr.type.kind in ("timestamp", "timestamptz") \
                and expr.args[0].type.is_string:
            epoch_us = np.datetime64("1970-01-01T00:00:00", "us")
            return np.array(
                [int((np.datetime64(str(v).strip().replace(" ", "T", 1),
                                    "us") - epoch_us)
                     / np.timedelta64(1, "us"))
                 for v in np.asarray(args[0], dtype=str)], dtype=np.int64)
        return np.asarray(args[0]).astype(expr.type.np_dtype)
    raise NotImplementedError(f"host string op {fn}")


@lru_cache(maxsize=512)
def _like_regex(pattern: str):
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out), re.DOTALL)


def _like(values: np.ndarray, pattern: str) -> np.ndarray:
    # fast paths for the common shapes (prefix/suffix/contains of literals)
    body = pattern.strip("%")
    n_pct = pattern.count("%")
    if "_" not in pattern and "%" not in body:
        v = values.astype(str) if values.dtype.kind != "U" else values
        if n_pct == 0:
            return v == pattern
        if pattern.startswith("%") and pattern.endswith("%") and n_pct == 2:
            return np.char.find(v, body) >= 0
        if pattern.endswith("%") and n_pct == 1:
            return np.char.startswith(v, body)
        if pattern.startswith("%") and n_pct == 1:
            return np.char.endswith(v, body)
    rx = _like_regex(pattern)
    return np.fromiter(
        (rx.fullmatch(s) is not None for s in values), dtype=bool, count=len(values)
    )
