"""Scatter-free segmented reductions over sorted group ids.

XLA:TPU lowers scatter (the backbone of ``jax.ops.segment_sum``) to a
mostly-serial loop, which is catastrophic at query row counts (measured:
one 8M-row segment_sum > 9 minutes).  Since the grouping engine sorts rows
by key anyway, every segmented reduction is expressed with TPU-friendly
dense primitives instead:

* segment bounds — vectorized ``searchsorted`` of the sorted gid array
* sums/counts — two-level block prefix sums: per-block partial sums, a
  tiny cumsum over blocks, and an intra-block masked row-sum gathered at
  each segment boundary.  No full-length cumsum, no scatter.
* min/max — an extra key-sort with the value as the trailing sort key:
  the segment's min sits at its start, its max at its end.

On CPU the scatter/nonzero lowerings are fast and simpler, so they are
kept behind a trace-time backend check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BLK = 128  # capacities are always multiples of 128 (batch.round_capacity)


def _scatter_ok() -> bool:
    """XLA:CPU lowers scatter/nonzero efficiently; XLA:TPU serializes them.
    Checked at trace time — picks the right lowering per backend."""
    from .common import effective_backend

    return effective_backend() == "cpu"


def segment_bounds(gid_sorted: jnp.ndarray, num_segments: int):
    """(starts, ends) of each segment in the sorted gid array."""
    seg = jnp.arange(num_segments, dtype=gid_sorted.dtype)
    from .common import searchsorted_fast

    starts = searchsorted_fast(gid_sorted, seg, side="left")
    ends = searchsorted_fast(gid_sorted, seg, side="right")
    return starts, ends


def _prefix_at(block: jnp.ndarray, bcum: jnp.ndarray, pos: jnp.ndarray):
    """Exclusive prefix sum of the flattened block matrix at positions."""
    nb = block.shape[0]
    b = pos // _BLK
    r = pos % _BLK
    base = jnp.where(b > 0, jnp.take(bcum, jnp.clip(b - 1, 0, nb - 1)), 0)
    rows = jnp.take(block, jnp.clip(b, 0, nb - 1), axis=0)  # [G, BLK]
    intra = jnp.sum(
        jnp.where(jnp.arange(_BLK)[None, :] < r[:, None], rows, 0), axis=1)
    return base + intra


def sorted_segment_sum(vals_sorted: jnp.ndarray, starts, ends) -> jnp.ndarray:
    """Sum per segment (rows sorted by segment)."""
    n = vals_sorted.shape[0]
    if _scatter_ok() or n % _BLK != 0:
        ps = jnp.cumsum(vals_sorted)
        end_v = jnp.where(ends > 0,
                          jnp.take(ps, jnp.clip(ends - 1, 0, n - 1)), 0)
        start_v = jnp.where(starts > 0,
                            jnp.take(ps, jnp.clip(starts - 1, 0, n - 1)), 0)
        return jnp.where(ends > starts, end_v - start_v,
                         jnp.zeros((), vals_sorted.dtype))
    block = vals_sorted.reshape(n // _BLK, _BLK)
    bcum = jnp.cumsum(jnp.sum(block, axis=1))
    out = _prefix_at(block, bcum, ends) - _prefix_at(block, bcum, starts)
    return out.astype(vals_sorted.dtype)


def _prefix_at_multi(block: jnp.ndarray, bcum: jnp.ndarray, pos: jnp.ndarray):
    """Exclusive prefix at positions, for [nb, BLK, k] blocks."""
    nb = block.shape[0]
    b = pos // _BLK
    r = pos % _BLK
    base = jnp.where((b > 0)[:, None],
                     jnp.take(bcum, jnp.clip(b - 1, 0, nb - 1), axis=0), 0)
    rows = jnp.take(block, jnp.clip(b, 0, nb - 1), axis=0)  # [G, BLK, k]
    sel = (jnp.arange(_BLK)[None, :, None] < r[:, None, None])
    intra = jnp.sum(jnp.where(sel, rows, 0), axis=1)
    return base + intra


def sorted_segment_sum_multi(vals_sorted: jnp.ndarray, starts,
                             ends) -> jnp.ndarray:
    """Segmented sums for k columns at once: vals_sorted [n, k] -> [G, k].

    One two-level prefix pass shared by every aggregate in the query —
    both fewer HBM passes and a much smaller XLA module than per-column
    reductions."""
    n, k = vals_sorted.shape
    if _scatter_ok() or n % _BLK != 0:
        ps = jnp.cumsum(vals_sorted, axis=0)
        zero = jnp.zeros((1, k), ps.dtype)
        psz = jnp.concatenate([zero, ps], axis=0)  # psz[i] = sum of first i
        return jnp.take(psz, ends, axis=0) - jnp.take(psz, starts, axis=0)
    block = vals_sorted.reshape(n // _BLK, _BLK, k)
    bcum = jnp.cumsum(jnp.sum(block, axis=1), axis=0)  # [nb, k]
    return (_prefix_at_multi(block, bcum, ends)
            - _prefix_at_multi(block, bcum, starts))


def minmax_by_value_sort(key_words, vals: jnp.ndarray, starts, ends,
                         is_min: bool, valid=None) -> jnp.ndarray:
    """Min/max per segment via one extra sort with the value as the last
    key: ascending within each segment, so min = value at start and
    max = value at end-1.  ``vals`` are in ORIGINAL row order (same order
    as the key words).  Invalid rows get a sentinel that sorts away from
    the answer."""
    n = vals.shape[0]
    if vals.dtype.kind == "f":
        sent = jnp.asarray(np.inf if is_min else -np.inf, vals.dtype)
    else:
        info = np.iinfo(np.dtype(vals.dtype.name))
        sent = jnp.asarray(info.max if is_min else info.min, vals.dtype)
    v = vals if valid is None else jnp.where(valid, vals, sent)
    out = jax.lax.sort(tuple(key_words) + (v,), num_keys=len(key_words) + 1)
    v_sorted = out[-1]
    if is_min:
        return jnp.take(v_sorted, jnp.clip(starts, 0, n - 1))
    return jnp.take(v_sorted, jnp.clip(ends - 1, 0, n - 1))


def sorted_segment_minmax_cpu(vals_sorted: jnp.ndarray,
                              gid_sorted: jnp.ndarray, ends,
                              is_min: bool) -> jnp.ndarray:
    num_segments = ends.shape[0]
    op = jax.ops.segment_min if is_min else jax.ops.segment_max
    return op(vals_sorted, gid_sorted, num_segments=num_segments,
              indices_are_sorted=True)


def compact_indices(mask: jnp.ndarray, capacity: int):
    """Stable indices of True rows, padded.  Sort-based on TPU (scatter-free),
    nonzero on CPU.  Returns (indices[capacity], count)."""
    count = jnp.sum(mask)
    if _scatter_ok():
        idx = jnp.nonzero(mask, size=capacity, fill_value=0)[0]
        return idx, count
    n = mask.shape[0]
    key = (~mask).astype(jnp.int8)
    iota = jnp.arange(n, dtype=jnp.int64)
    _, idx = jax.lax.sort((key, iota), num_keys=1)
    if capacity > n:  # pad, never clamp: callers size output by capacity
        idx = jnp.concatenate(
            [idx, jnp.zeros((capacity - n,), jnp.int64)])
    return idx[:capacity], count
