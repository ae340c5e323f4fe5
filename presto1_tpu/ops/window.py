"""Window functions: partitioned/ordered evaluation, scatter-free.

The reference's WindowOperator materialises a PagesIndex per partition and
walks frames row-by-row (``operator/WindowOperator.java``,
``operator/window/`` — 21 function classes, frame logic in
``operator/window/FramedWindowFunction.java`` + ``WindowPartition.java``).
Here the whole batch is sorted once by (partition keys, order keys);
partitions and peer groups become segments of the sorted arrangement, so:

* row_number  = position − partition start
* rank        = peer-group start − partition start + 1
* dense_rank  = # peer boundaries since partition start
* ntile(b)    = arithmetic on position within the partition
* lag/lead    = shifted reads guarded by partition bounds
* first/last/nth_value = reads at computed frame endpoints
* framed aggregates     = prefix sums (sum/count/avg) or a doubling
  sparse table (min/max over sliding ROWS frames) queried at the frame
  endpoints — O(n log n) work, no per-row loop, no scatter anywhere.

Frame support: ROWS with any bound combination; RANGE with
UNBOUNDED PRECEDING / CURRENT ROW / UNBOUNDED FOLLOWING (offset RANGE
frames need order-value arithmetic and are rejected at plan time).
Results return to original row order by one more multi-operand sort keyed
on the permutation (no scatter anywhere).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch
from ..types import BIGINT, SqlType
from .common import INT64_MAX, iota, pack_key_words
from .sort import SortKey, _sortable

# frame spec: (unit, start_kind, start_val, end_kind, end_val)
# kinds: 'up' unbounded preceding | 'p' N preceding | 'c' current row |
#        'f' N following | 'uf' unbounded following
Frame = Tuple[str, str, Optional[int], str, Optional[int]]


@dataclass
class WindowCall:
    fn: str  # row_number|rank|dense_rank|ntile|lag|lead|first_value|
    #          last_value|nth_value|sum|min|max|count|avg
    input: Optional[Column]
    name: str
    type: SqlType = None
    frame: Optional[Frame] = None
    default: Optional[Column] = None  # lag/lead third argument
    param: Optional[int] = None  # lag/lead offset, nth_value n, ntile buckets


def _scan_max(x):
    return jax.lax.associative_scan(jnp.maximum, x)


def _sparse_table_query(vals, fs, fe, op, sentinel, n):
    """``op`` over ``vals[fs:fe]`` per row (fe > fs), via doubling table."""
    t = vals
    tabs = [t]
    w = 1
    while w < n:
        shifted = jnp.concatenate(
            [t[w:], jnp.full((w,), sentinel, t.dtype)])
        t = op(t, shifted)
        tabs.append(t)
        w <<= 1
    flat = jnp.stack(tabs).reshape(-1)  # (levels, n) flattened
    length = jnp.maximum(fe - fs, 1)
    k = jnp.clip(
        jnp.floor(jnp.log2(length.astype(jnp.float64))).astype(jnp.int64),
        0, len(tabs) - 1)
    pw = jnp.left_shift(jnp.ones((), jnp.int64), k)
    a = jnp.take(flat, k * n + fs, mode="clip")
    b = jnp.take(flat, k * n + jnp.clip(fe - pw, 0, n - 1), mode="clip")
    return op(a, b)


def window(
    batch: RecordBatch,
    partition_cols: Sequence[Column],
    partition_ranges,
    order_keys: Sequence[SortKey],
    calls: Sequence[WindowCall],
) -> RecordBatch:
    n = batch.capacity()
    if partition_cols:
        part_words = pack_key_words(partition_cols, partition_ranges,
                                    batch.num_rows)
    else:
        dead = iota(n) >= batch.num_rows
        part_words = [jnp.where(dead, INT64_MAX, 0)]
    order_words = [_sortable(k, n) for k in order_keys]

    operands = tuple(part_words) + tuple(order_words) + (iota(n),)
    out = jax.lax.sort(operands, num_keys=len(operands) - 1)
    sorted_parts = out[:len(part_words)]
    sorted_orders = out[len(part_words):-1]
    perm = out[-1]

    def boundaries(words):
        b = jnp.concatenate([jnp.ones((1,), bool), jnp.zeros((n - 1,), bool)])
        for w in words:
            prev = jnp.concatenate([jnp.full((1,), -1, jnp.int64), w[:-1]])
            b = b | (w != prev)
        return b

    part_b = boundaries(sorted_parts)
    peer_b = boundaries(list(sorted_parts) + list(sorted_orders))

    pos = iota(n)
    # start position of current partition / peer group via running max over
    # boundary positions (associative scan of maximum)
    part_start = _scan_max(jnp.where(part_b, pos, 0))
    peer_start = _scan_max(jnp.where(peer_b, pos, 0))
    # exclusive ends: next boundary position, computed by reversing
    nxt = jnp.concatenate([peer_b[1:], jnp.ones((1,), bool)])
    peer_end = n - _scan_max(jnp.where(nxt[::-1], pos, 0))[::-1]
    nxt_p = jnp.concatenate([part_b[1:], jnp.ones((1,), bool)])
    part_end = n - _scan_max(jnp.where(nxt_p[::-1], pos, 0))[::-1]

    def frame_bounds(frame: Optional[Frame]):
        """(fs, fe, anchored_start, anchored_end): clipped frame per row."""
        if frame is None:
            if order_keys:
                frame = ("range", "up", None, "c", None)
            else:
                frame = ("range", "up", None, "uf", None)
        unit, sk, sv, ek, ev = frame
        if unit == "rows":
            s = {"up": part_start, "p": pos - (sv or 0), "c": pos,
                 "f": pos + (sv or 0)}[sk]
            e = {"uf": part_end, "p": pos - (ev or 0) + 1, "c": pos + 1,
                 "f": pos + (ev or 0) + 1}[ek]
        else:  # range / groups restricted to peer-aligned bounds
            s = part_start if sk == "up" else peer_start
            e = part_end if ek == "uf" else peer_end
        fs = jnp.clip(s, part_start, part_end)
        fe = jnp.clip(e, part_start, part_end)
        return fs, fe, sk == "up", ek == "uf"

    def permuted(c: Column):
        vals = jnp.take(c.data, perm, mode="clip")
        valid = None if c.validity is None else jnp.take(
            c.validity, perm, mode="clip")
        return vals, valid

    results = []  # (value_array, validity_or_None, dictionary, out_dtype)
    for call in calls:
        dictionary = None
        out_dtype = (call.input.data.dtype
                     if call.fn in ("lag", "lead", "first_value",
                                    "last_value", "nth_value", "min", "max")
                     and call.input is not None else None)
        if call.fn == "row_number":
            v, valid = pos - part_start + 1, None
        elif call.fn == "rank":
            v, valid = peer_start - part_start + 1, None
        elif call.fn == "dense_rank":
            upto = jnp.cumsum(peer_b.astype(jnp.int64))
            at_pstart = jnp.take(upto, part_start)
            v, valid = upto - at_pstart + 1, None
        elif call.fn == "percent_rank":
            # (rank - 1) / (partition rows - 1); 0 for 1-row partitions
            # (reference: operator/window/PercentRankFunction.java)
            size = part_end - part_start
            v = ((peer_start - part_start).astype(jnp.float64)
                 / jnp.maximum(size - 1, 1))
            v, valid = jnp.where(size <= 1, 0.0, v), None
        elif call.fn == "cume_dist":
            # rows <= current peer group / partition rows
            # (reference: operator/window/CumulativeDistributionFunction)
            size = jnp.maximum(part_end - part_start, 1)
            v = (peer_end - part_start).astype(jnp.float64) / size
            valid = None
        elif call.fn == "ntile":
            b = int(call.param or 1)
            idx = pos - part_start
            size = jnp.maximum(part_end - part_start, 1)
            q, r = size // b, size % b
            thresh = r * (q + 1)
            lo = idx // jnp.maximum(q + 1, 1)
            hi = r + (idx - thresh) // jnp.maximum(q, 1)
            v, valid = jnp.where(idx < thresh, lo, hi) + 1, None
        elif call.fn in ("lag", "lead"):
            vals, cvalid = permuted(call.input)
            k = int(call.param if call.param is not None else 1)
            if call.fn == "lag":
                idx = pos - k
                ok = idx >= part_start
            else:
                idx = pos + k
                ok = idx < part_end
            taken = jnp.take(vals, jnp.clip(idx, 0, n - 1), mode="clip")
            tvalid = (jnp.ones((n,), bool) if cvalid is None
                      else jnp.take(cvalid, jnp.clip(idx, 0, n - 1),
                                    mode="clip"))
            if call.default is not None:
                dvals, dvalid = permuted(call.default)
                v = jnp.where(ok, taken, dvals.astype(taken.dtype))
                valid = jnp.where(
                    ok, tvalid,
                    jnp.ones((n,), bool) if dvalid is None else dvalid)
            else:
                v = jnp.where(ok, taken, 0)
                valid = ok & tvalid
            dictionary = call.input.dictionary
        elif call.fn in ("first_value", "last_value", "nth_value"):
            vals, cvalid = permuted(call.input)
            fs, fe, _, _ = frame_bounds(call.frame)
            empty = fe <= fs
            if call.fn == "first_value":
                idx = fs
                ok = ~empty
            elif call.fn == "last_value":
                idx = fe - 1
                ok = ~empty
            else:
                idx = fs + int(call.param or 1) - 1
                ok = (~empty) & (idx < fe)
            taken = jnp.take(vals, jnp.clip(idx, 0, n - 1), mode="clip")
            tvalid = (jnp.ones((n,), bool) if cvalid is None
                      else jnp.take(cvalid, jnp.clip(idx, 0, n - 1),
                                    mode="clip"))
            v, valid = jnp.where(ok, taken, 0), ok & tvalid
            dictionary = call.input.dictionary
        elif call.fn in ("sum", "avg", "count", "min", "max"):
            c = call.input
            fs, fe, anchored_s, anchored_e = frame_bounds(call.frame)
            empty = fe <= fs
            if c is None:  # count(*)
                vals, cvalid = jnp.ones((n,), jnp.int64), None
            else:
                vals, cvalid = permuted(c)
            # prefix count of non-null rows in frame (validity for all aggs)
            cbase = (jnp.ones((n,), jnp.int64) if cvalid is None
                     else cvalid.astype(jnp.int64))
            cps = jnp.concatenate(
                [jnp.zeros((1,), jnp.int64), jnp.cumsum(cbase)])
            cnt = jnp.take(cps, fe) - jnp.take(cps, fs)
            cnt = jnp.where(empty, 0, cnt)
            if call.fn == "count":
                v, valid = cnt, None
            elif call.fn in ("sum", "avg"):
                base = vals.astype(jnp.float64) if vals.dtype.kind == "f" \
                    else vals.astype(jnp.int64)
                if cvalid is not None:
                    base = jnp.where(cvalid, base, 0)
                ps = jnp.concatenate(
                    [jnp.zeros((1,), base.dtype), jnp.cumsum(base)])
                v = jnp.take(ps, fe) - jnp.take(ps, fs)
                v = jnp.where(empty, 0, v)
                valid = cnt > 0
                if call.fn == "avg":
                    t = c.type
                    scale = 10 ** t.scale if t.kind == "decimal" else 1  # type: ignore[attr-defined]
                    v = v.astype(jnp.float64) / (jnp.maximum(cnt, 1) * scale)
            else:  # min / max
                op = jnp.minimum if call.fn == "min" else jnp.maximum
                if vals.dtype.kind == "f":
                    sent = jnp.asarray(
                        np.inf if call.fn == "min" else -np.inf, vals.dtype)
                    work = vals
                else:
                    work = vals.astype(jnp.int64)
                    sent = jnp.asarray(
                        INT64_MAX if call.fn == "min" else -INT64_MAX,
                        jnp.int64)
                if cvalid is not None:
                    work = jnp.where(cvalid, work, sent)
                if anchored_s:
                    # frame starts at partition start: segmented forward scan
                    pid = jnp.cumsum(part_b.astype(jnp.int64))

                    def comb(a, bb):
                        (ga, ma), (gb, mb) = a, bb
                        return gb, jnp.where(ga == gb, op(ma, mb), mb)

                    _, acc = jax.lax.associative_scan(comb, (pid, work))
                    v = jnp.take(acc, jnp.clip(fe - 1, 0, n - 1))
                elif anchored_e:
                    # frame ends at partition end: segmented reverse scan
                    pid = jnp.cumsum(part_b.astype(jnp.int64))

                    def comb(a, bb):
                        (ga, ma), (gb, mb) = a, bb
                        return gb, jnp.where(ga == gb, op(ma, mb), mb)

                    _, acc_r = jax.lax.associative_scan(
                        comb, (pid[::-1], work[::-1]))
                    v = jnp.take(acc_r[::-1], jnp.clip(fs, 0, n - 1))
                else:  # sliding ROWS frame: doubling sparse table
                    v = _sparse_table_query(work, fs, fe, op, sent, n)
                valid = cnt > 0
                v = jnp.where(valid, v, 0)
                dictionary = None if c is None else c.dictionary
        else:
            raise NotImplementedError(f"window function {call.fn}")
        results.append((v, valid, dictionary, out_dtype))

    # back to original row order: one sort keyed on the permutation
    payload = []
    for v, valid, _, _ in results:
        payload.append(v)
        if valid is not None:
            payload.append(valid.astype(jnp.int8))
    back = jax.lax.sort((perm,) + tuple(payload), num_keys=1)
    cols = dict(batch.columns)
    i = 1
    for call, (v, valid, dictionary, out_dtype) in zip(calls, results):
        arr = back[i]
        i += 1
        bvalid = None
        if valid is not None:
            bvalid = back[i].astype(bool)
            i += 1
        t = call.type or BIGINT
        if out_dtype is not None:
            arr = arr.astype(out_dtype)
        elif t.kind == "double":
            arr = arr.astype(jnp.float64)
        else:
            arr = arr.astype(jnp.int64)
        cols[call.name] = Column(arr, t, validity=bvalid,
                                 dictionary=dictionary)
    return RecordBatch(cols, batch.num_rows)
