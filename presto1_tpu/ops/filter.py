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
from .common import _wide_sort_rows, iota


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
    # wide batches: a variadic sort carrying EVERY column as a separate
    # operand makes the TPU AOT compiler fall off a cliff (SF1 Q2's
    # 30-operand sort compiled for >45 min).  Pair-packing 4-byte columns
    # and validity bits into int64 operands halves the operand count:
    # up to ~12 payload operands the sort compiles in minutes (cached)
    # and runs ~2x faster than the perm + width-class-gather fallback
    # (measured 6.29M rows: pair-packed sort 119 ms vs 18-entry stacked
    # gather 254 ms — experiments/gather_vs_widesort.py).  Nested
    # (array/map) columns are [n, W] matrices — always gather-moved.
    if (len(payload) > 8 and n > _wide_sort_rows()) \
            or any(c.is_nested for c in batch.columns.values()):
        packed = _sort_compact_packed(batch, key, cap, count)
        if packed is not None:
            return packed
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


_WIDE_SORT_MAX_OPERANDS = 12  # payload operands; beyond this, compile
#                               time dominates (≈ 20 s/operand on v5e AOT)


def _sort_compact_packed(batch: RecordBatch, key: jnp.ndarray, cap: int,
                         count) -> Optional[RecordBatch]:
    """Wide compaction as ONE stable variadic sort with pair-packed
    payload operands.

    8-byte columns ride raw (one operand); 4-byte columns bitcast to u32
    and pack in PAIRS into int64 operands; validity bools pack 4-per-u32
    before pairing.  f64 columns ride raw too (the u32-pack + f64
    interplay crashes the v5e AOT compiler — BASELINE.md round 3).
    Returns None when the batch is nested or still too wide (caller falls
    back to perm + packed gathers)."""
    import jax

    if any(c.is_nested for c in batch.columns.values()):
        return None
    raw_cols = []     # (name, data) 8-byte or float — ride as-is
    u32_parts = []    # (slot_key, u32 array)
    for nm, c in batch.columns.items():
        d = c.data
        if d.dtype.itemsize == 8 or d.dtype.kind == "f":
            raw_cols.append((nm, d))
        elif d.dtype.itemsize == 4:
            u32_parts.append((nm, jax.lax.bitcast_convert_type(d,
                                                               jnp.uint32)))
        else:
            u32_parts.append((nm, d.astype(jnp.uint32)))
    vnames = [nm for nm, c in batch.columns.items()
              if c.validity is not None]
    vslots = {}
    for gi in range(0, len(vnames), 4):
        grp = vnames[gi:gi + 4]
        word = jnp.zeros(key.shape, jnp.uint32)
        for b, nm in enumerate(grp):
            word = word | (batch[nm].validity.astype(jnp.uint32)
                           << jnp.uint32(8 * b))
            vslots[nm] = (f"__v{gi // 4}", b)
        u32_parts.append((f"__v{gi // 4}", word))
    # pair u32 parts into int64 operands
    pairs = []
    pair_of = {}  # slot_key -> (pair index, half)
    for i in range(0, len(u32_parts), 2):
        grp = u32_parts[i:i + 2]
        lo = grp[0][1]
        hi = grp[1][1] if len(grp) > 1 else jnp.zeros_like(lo)
        pairs.append(jax.lax.bitcast_convert_type(
            jnp.stack([lo, hi], axis=-1), jnp.int64))
        for half, (nm, _) in enumerate(grp):
            pair_of[nm] = (i // 2, half)
    n_ops = len(raw_cols) + len(pairs)
    if n_ops > _WIDE_SORT_MAX_OPERANDS:
        return None
    operands = tuple(d for _, d in raw_cols) + tuple(pairs)
    out = jax.lax.sort((key,) + operands, num_keys=1, is_stable=True)
    sorted_ops = out[1:]
    raw_sorted = {nm: sorted_ops[i] for i, (nm, _) in enumerate(raw_cols)}
    pair_sorted = [
        jax.lax.bitcast_convert_type(p, jnp.uint32)  # [n, 2]
        for p in sorted_ops[len(raw_cols):]
    ]

    def u32_of(slot_key):
        pi, half = pair_of[slot_key]
        return pair_sorted[pi][:, half]

    cols = {}
    for nm, c in batch.columns.items():
        if nm in raw_sorted:
            data = raw_sorted[nm][:cap]
        else:
            u = u32_of(nm)
            if c.data.dtype.itemsize == 4:
                data = jax.lax.bitcast_convert_type(u, c.data.dtype)[:cap]
            else:
                data = u.astype(c.data.dtype)[:cap]
        validity = None
        if c.validity is not None:
            slot, b = vslots[nm]
            validity = (((u32_of(slot) >> jnp.uint32(8 * b))
                         & jnp.uint32(1)) != 0)[:cap]
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
