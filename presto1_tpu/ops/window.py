"""Window functions: partitioned/ordered evaluation, scatter-free.

The reference's WindowOperator materialises a PagesIndex per partition and
walks frames row-by-row (``operator/WindowOperator.java``,
``operator/window/``).  Here the whole batch is sorted once by
(partition keys, order keys); partitions and peer groups become segments
of the sorted arrangement, so:

* row_number  = position − partition start
* rank        = peer-group start − partition start + 1
* dense_rank  = # peer boundaries since partition start
* running agg = prefix sum up to the peer-group END (SQL RANGE default)
* whole-partition agg (no ORDER BY) = segment total broadcast

Results return to original row order by one more multi-operand sort keyed
on the permutation (no scatter anywhere).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..batch import Column, RecordBatch
from ..types import BIGINT, DOUBLE, SqlType
from .common import INT64_MAX, iota, pack_key_words
from .sort import SortKey, _sortable


@dataclass
class WindowCall:
    fn: str  # row_number | rank | dense_rank | sum | min | max | count | avg
    input: Optional[Column]
    name: str
    type: SqlType = None


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
    part_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(part_b, pos, 0))
    peer_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(peer_b, pos, 0))
    # peer-group END (exclusive): next peer boundary; computed by reversing
    nxt = jnp.concatenate([peer_b[1:], jnp.ones((1,), bool)])
    peer_end = n - jax.lax.associative_scan(
        jnp.maximum, jnp.where(nxt[::-1], pos, 0))[::-1]
    # partition end for whole-partition aggregates
    nxt_p = jnp.concatenate([part_b[1:], jnp.ones((1,), bool)])
    part_end = n - jax.lax.associative_scan(
        jnp.maximum, jnp.where(nxt_p[::-1], pos, 0))[::-1]

    results = []
    for call in calls:
        if call.fn == "row_number":
            v = pos - part_start + 1
        elif call.fn == "rank":
            v = peer_start - part_start + 1
        elif call.fn == "dense_rank":
            upto = jnp.cumsum(peer_b.astype(jnp.int64))
            at_pstart = jnp.take(upto, part_start)
            v = upto - at_pstart + 1
        elif call.fn in ("sum", "avg", "count", "min", "max"):
            c = call.input
            if c is None:  # count(*) over (...)
                vals = jnp.ones((n,), jnp.int64)
                valid = None
            else:
                vals = jnp.take(c.data, perm, mode="clip")
                valid = None if c.validity is None else jnp.take(
                    c.validity, perm, mode="clip")
            framed_end = peer_end if order_keys else part_end
            if call.fn in ("sum", "avg", "count"):
                base = vals.astype(jnp.int64) if vals.dtype.kind != "f" \
                    else vals
                if call.fn == "count" and c is None:
                    base = jnp.ones((n,), jnp.int64)
                elif call.fn == "count":
                    base = (jnp.ones((n,), jnp.int64) if valid is None
                            else valid.astype(jnp.int64))
                elif valid is not None:
                    base = jnp.where(valid, base, 0)
                ps = jnp.cumsum(base)
                psz = jnp.concatenate([jnp.zeros((1,), ps.dtype), ps])
                upto = jnp.take(psz, framed_end)
                before = jnp.take(psz, part_start)
                v = upto - before
                if call.fn == "avg":
                    cbase = (jnp.ones((n,), jnp.int64) if valid is None
                             else valid.astype(jnp.int64))
                    cps = jnp.concatenate(
                        [jnp.zeros((1,), jnp.int64),
                         jnp.cumsum(cbase)])
                    cnt = jnp.take(cps, framed_end) - jnp.take(cps, part_start)
                    t = c.type
                    scale = 10 ** t.scale if t.kind == "decimal" else 1  # type: ignore[attr-defined]
                    v = v.astype(jnp.float64) / (jnp.maximum(cnt, 1) * scale)
            else:  # min / max over the frame: segmented scan within part
                op = jnp.minimum if call.fn == "min" else jnp.maximum
                pid = jnp.cumsum(part_b.astype(jnp.int64))

                def comb(a, b):
                    (ga, ma), (gb, mb) = a, b
                    return gb, jnp.where(ga == gb, op(ma, mb), mb)

                _, acc = jax.lax.associative_scan(comb, (pid, vals))
                # frame end = peer_end - 1 (peers included)
                v = jnp.take(acc, jnp.clip(framed_end - 1, 0, n - 1))
        else:
            raise NotImplementedError(f"window function {call.fn}")
        results.append(v)

    # back to original row order: one sort keyed on the permutation
    back = jax.lax.sort((perm,) + tuple(
        r.astype(jnp.float64) if r.dtype.kind == "f" else r.astype(jnp.int64)
        for r in results), num_keys=1)
    cols = dict(batch.columns)
    for call, arr in zip(calls, back[1:]):
        t = call.type or BIGINT
        if t.kind == "double":
            cols[call.name] = Column(arr.astype(jnp.float64), t)
        else:
            cols[call.name] = Column(arr.astype(jnp.int64), t)
    return RecordBatch(cols, batch.num_rows)
