"""Scatter-free segmented reductions over sorted group ids.

XLA:TPU lowers scatter (the backbone of ``jax.ops.segment_sum``) to a
mostly-serial loop, which is catastrophic at query row counts.  Since the
grouping engine sorts rows by key anyway, every segmented reduction can be
expressed with the TPU-friendly trio instead:

* sums/counts — one ``cumsum`` + prefix-difference gathers at segment ends
* min/max    — one segmented ``associative_scan`` + gathers at ends
* segment bounds — vectorized ``searchsorted`` of the sorted gid array

Everything is dense vector work; no scatters anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _scatter_ok() -> bool:
    """XLA:CPU lowers scatter/nonzero efficiently; XLA:TPU serializes them.
    Checked at trace time — picks the right lowering per backend."""
    return jax.default_backend() == "cpu"


def segment_bounds(gid_sorted: jnp.ndarray, num_segments: int):
    """(starts, ends) of each segment in the sorted gid array."""
    seg = jnp.arange(num_segments, dtype=gid_sorted.dtype)
    starts = jnp.searchsorted(gid_sorted, seg, side="left")
    ends = jnp.searchsorted(gid_sorted, seg, side="right")
    return starts, ends


def sorted_segment_sum(vals_sorted: jnp.ndarray, starts, ends) -> jnp.ndarray:
    """Sum per segment via prefix-sum differences (no scatter)."""
    ps = jnp.cumsum(vals_sorted)
    n = vals_sorted.shape[0]
    end_v = jnp.where(ends > 0, jnp.take(ps, jnp.clip(ends - 1, 0, n - 1)), 0)
    start_v = jnp.where(starts > 0,
                        jnp.take(ps, jnp.clip(starts - 1, 0, n - 1)), 0)
    return jnp.where(ends > starts, end_v - start_v,
                     jnp.zeros((), vals_sorted.dtype))


def sorted_segment_minmax(vals_sorted: jnp.ndarray, gid_sorted: jnp.ndarray,
                          ends, is_min: bool) -> jnp.ndarray:
    """Min/max per segment via a segmented associative scan.

    The combiner carries (gid, acc); crossing a segment boundary resets the
    accumulator — associative, so it runs as a parallel scan.
    """
    num_segments = ends.shape[0]
    if _scatter_ok():
        op = jax.ops.segment_min if is_min else jax.ops.segment_max
        out = op(vals_sorted, gid_sorted, num_segments=num_segments,
                 indices_are_sorted=True)
        return out
    op = jnp.minimum if is_min else jnp.maximum

    def comb(a, b):
        ga, ma = a
        gb, mb = b
        return gb, jnp.where(ga == gb, op(ma, mb), mb)

    _, acc = jax.lax.associative_scan(comb, (gid_sorted, vals_sorted))
    n = vals_sorted.shape[0]
    return jnp.take(acc, jnp.clip(ends - 1, 0, n - 1))


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
    return idx[:capacity], count
