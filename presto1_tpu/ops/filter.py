"""Filter / project / compaction.

The reference's ``FilterAndProjectOperator`` + ``PageProcessor``
(``core/trino-main/.../operator/project/PageProcessor.java:54``) produce a
``SelectedPositions`` list and re-materialise blocks.  On TPU the natural
split is:

* **mask-only filtering** — downstream operators take the boolean mask and
  never materialise the compacted rows (aggregations, joins); this is the
  common fused path and costs one vector op.
* **compaction** — ``jnp.nonzero(..., size=capacity)`` gives a static-shape
  stable compaction when the row set must actually shrink (e.g. before a
  wide join).  A Pallas masked-compaction kernel can replace this when
  profiling says so.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from ..batch import Column, RecordBatch
from ..expr.ir import Expr
from ..expr.eval import eval_expr, eval_predicate
from .common import iota


def filter_mask(predicate: Expr, batch: RecordBatch) -> jnp.ndarray:
    """Predicate mask with rows past num_rows excluded."""
    mask = eval_predicate(predicate, batch)
    n = batch.capacity()
    live = jnp.arange(n) < batch.num_rows
    return mask & live


def compact(batch: RecordBatch, mask: jnp.ndarray,
            capacity: Optional[int] = None) -> RecordBatch:
    """Stable-compact rows where mask is True into a padded batch.

    TPU: one stable payload sort moves every column (gathers are
    latency-bound and ~24x slower); CPU keeps nonzero+take.  A capacity
    larger than the input pads the batch first (slicing a shorter array
    would silently clamp and desynchronise column/validity lengths —
    the SF1 Q2 compiled-mode bug)."""
    from .segments import _scatter_ok, compact_indices

    cap = capacity if capacity is not None else batch.capacity()
    if cap > batch.capacity():
        pad = cap - batch.capacity()
        cols = {}
        for nm, c in batch.columns.items():
            from dataclasses import replace as _replace

            data = jnp.concatenate(
                [c.data, jnp.zeros((pad,) + c.data.shape[1:], c.data.dtype)])
            validity = None if c.validity is None else jnp.concatenate(
                [c.validity, jnp.zeros((pad,), bool)])
            extra = {}
            if c.lengths is not None:
                extra["lengths"] = jnp.concatenate(
                    [c.lengths, jnp.zeros((pad,), c.lengths.dtype)])
            if c.map_values is not None:
                extra["map_values"] = jnp.concatenate(
                    [c.map_values,
                     jnp.zeros((pad,) + c.map_values.shape[1:],
                               c.map_values.dtype)])
            cols[nm] = _replace(c, data=data, validity=validity, **extra)
        batch = RecordBatch(cols, batch.num_rows)
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    if _scatter_ok():
        idx, count = compact_indices(mask, cap)
        return batch.gather(idx, count)
    import jax

    n = batch.capacity()
    key = (~mask).astype(jnp.int8)
    names = list(batch.columns.keys())
    payload = []
    for nm in names:
        c = batch[nm]
        payload.append(c.data)
        if c.validity is not None:
            payload.append(c.validity.astype(jnp.int8))
    count = jnp.sum(mask)
    # wide batches: a variadic sort carrying EVERY column as an operand
    # makes the TPU AOT compiler fall off a cliff (SF1 Q2's 30-operand
    # sort compiled for >45 min; every narrow fragment compiles in
    # seconds).  Sort only a permutation (2 operands) and move the
    # payload with the width-class packed gathers instead.  Nested
    # (array/map) columns are [n, W] matrices — always gather-moved.
    if (len(payload) > 8 and n > 65536) \
            or any(c.is_nested for c in batch.columns.values()):
        _, perm = jax.lax.sort(
            (key, iota(n).astype(jnp.int32)), num_keys=1, is_stable=True)
        return batch.gather(perm[:cap], count)
    out = jax.lax.sort(tuple([key] + payload), num_keys=1)
    sorted_payload = list(out[1:])
    cols = {}
    i = 0
    for nm in names:
        c = batch[nm]
        data = sorted_payload[i][:cap]
        i += 1
        validity = None
        if c.validity is not None:
            validity = sorted_payload[i][:cap].astype(bool)
            i += 1
        cols[nm] = c.with_data(data, validity)
    return RecordBatch(cols, count)


def filter_batch(predicate: Expr, batch: RecordBatch,
                 capacity: Optional[int] = None) -> RecordBatch:
    return compact(batch, filter_mask(predicate, batch), capacity)


def project(batch: RecordBatch, exprs: Dict[str, Expr]) -> RecordBatch:
    """Evaluate named expressions into a new batch (XLA fuses the chain)."""
    cols: Dict[str, Column] = {}
    for name, e in exprs.items():
        cols[name] = eval_expr(e, batch)
    return RecordBatch(cols, batch.num_rows)
