"""ORDER BY / TopN / LIMIT.

The reference sorts via PagesIndex + a bytecode-compiled comparator
quicksort (``operator/PagesIndexOrdering.java:37``, adapted from fastutil).
Here every sort key is transformed into a monotone word and the whole batch
is ordered by one multi-operand ``lax.sort`` (XLA's parallel sort, to be
superseded by a Pallas radix sort on the hot paths).  Comparator logic
disappears: DESC is negation, null ordering is a sentinel, row liveness is
a leading key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch
from .common import _wide_sort_rows, iota


@dataclass
class SortKey:
    column: Column  # evaluated key
    ascending: bool = True
    nulls_first: Optional[bool] = None  # None = Trino default (last if asc)


def _sortable(key: SortKey, n: int):
    c = key.column
    data = c.data
    if data.dtype.kind == "f":
        word = data.astype(jnp.float64)
        big = jnp.asarray(np.inf, word.dtype)
    else:
        word = data.astype(jnp.int64)
        big = jnp.asarray(np.iinfo(np.int64).max // 2, word.dtype)
    nulls_first = (not key.ascending) if key.nulls_first is None else key.nulls_first
    if c.validity is not None:
        null_word = -big if (nulls_first == key.ascending) else big
        word = jnp.where(c.validity, word, null_word)
    if not key.ascending:
        word = -word
    return word


def sort_batch(batch: RecordBatch, keys: List[SortKey],
               limit: Optional[int] = None) -> RecordBatch:
    n = batch.capacity()
    dead = (iota(n) >= batch.num_rows).astype(jnp.int8)
    # every column (and validity) rides the sort as a payload operand —
    # ~24x faster than post-sort gathers on TPU
    names = list(batch.columns.keys())
    payload = []
    vnames = []
    for nm in names:
        c = batch[nm]
        payload.append(c.data)
        if c.validity is not None:
            vnames.append(nm)
            payload.append(c.validity.astype(jnp.int8))
    nkeys = 1 + len(keys)
    key_ops = [dead] + [_sortable(k, n) for k in keys]
    if (len(payload) > 8 and n > _wide_sort_rows()) \
            or any(c.is_nested for c in batch.columns.values()):
        # wide LARGE outputs: a variadic sort with one operand per column
        # makes the TPU AOT compiler fall off a cliff (>45 min at 30
        # operands x 1M rows, SF1 Q2) — sort a permutation and move
        # columns with the packed gathers instead.  Small batches keep
        # the payload sort (the gather path's packed/chunked machinery
        # buys nothing there); nested [n, W] columns always gather-move.
        out = jax.lax.sort(tuple(key_ops) + (iota(n).astype(jnp.int32),),
                           num_keys=nkeys)
        perm = out[nkeys]
        res = batch.gather(perm, batch.num_rows)
        if limit is not None:
            cap = min(limit, n)
            res = RecordBatch(
                {name: c.with_data(
                    c.data[:cap],
                    c.validity[:cap] if c.validity is not None else None)
                 for name, c in res.columns.items()},
                jnp.minimum(res.num_rows, cap)
                if not isinstance(res.num_rows, int)
                else min(res.num_rows, cap))
        return res
    out = jax.lax.sort(tuple(key_ops + payload), num_keys=nkeys)
    sorted_payload = list(out[nkeys:])
    cols = {}
    i = 0
    for nm in names:
        c = batch[nm]
        data = sorted_payload[i]
        i += 1
        validity = None
        if c.validity is not None:
            validity = sorted_payload[i].astype(bool)
            i += 1
        cols[nm] = c.with_data(data, validity)
    res = RecordBatch(cols, batch.num_rows)
    if limit is not None:
        cap = min(limit, n)
        res = RecordBatch(
            {name: c.with_data(c.data[:cap],
                               c.validity[:cap] if c.validity is not None else None)
             for name, c in res.columns.items()},
            jnp.minimum(res.num_rows, limit)
            if not isinstance(res.num_rows, int) else min(res.num_rows, limit),
        )
    return res


def limit_batch(batch: RecordBatch, limit: int) -> RecordBatch:
    cap = min(limit, batch.capacity())
    cols = {
        name: c.with_data(c.data[:cap],
                          c.validity[:cap] if c.validity is not None else None)
        for name, c in batch.columns.items()
    }
    nr = batch.num_rows
    nr = min(nr, limit) if isinstance(nr, int) else jnp.minimum(nr, limit)
    return RecordBatch(cols, nr)
