"""Equi-join: sorted build side + vectorized binary-search probe.

The reference's join (``operator/PagesHash.java:76`` linear-probe hash table,
``operator/LookupJoinOperator.java:285`` per-row probe loop with PositionLinks
chains) is replaced by a fully data-parallel design:

* **build**: sort the packed build keys once (``lax.sort``) — duplicates are
  adjacent, so Trino's PositionLinks chain becomes a contiguous range.
* **probe**: two vectorized ``searchsorted`` calls give every probe row its
  match range ``[lo, hi)`` — the "hash lookup" is a log2(n)-step dense
  binary search with no control flow.
* **expand**: the classic prefix-sum expansion turns per-row match counts
  into flat output pairs inside a static-capacity buffer.

1:N matches, LEFT padding, SEMI/ANTI and residual (non-equi) conditions all
fall out of the same three steps.  A Pallas hash-probe kernel can later
replace the searchsorted pair for O(1) probes; the surrounding contract
(static capacity + count) stays identical.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch
from ..expr.ir import Expr
from ..expr.eval import eval_predicate
from .common import (
    INT64_MAX, iota, mix_key_word, narrow_i32, pack_key_words,
    searchsorted_fast,
)
from .segments import compact_indices, sorted_segment_sum


def _key_widths(ranges) -> int:
    widths = 0
    for lo_, hi_ in ranges:
        widths += max(int(hi_ - lo_ + 2).bit_length(), 1)
    return widths


def merge_join_applicable(kind: str, ranges, residual,
                          build_unique: bool) -> bool:
    """True when the single-merge-sort join formulation applies: narrow
    (packable) keys, no residual, and either an N:1 inner join or a
    semi/anti join (any build cardinality).  The decision depends only on
    plan-static facts, so eager discovery and compiled replay always
    agree."""
    if residual is not None or _key_widths(ranges) > 63:
        return False
    return kind in ("semi", "anti") or (kind == "inner" and build_unique)


def merge_join(
    probe: RecordBatch,
    build: RecordBatch,
    probe_keys: Sequence[str],
    build_keys: Sequence[str],
    kind: str,  # 'inner' (build-unique) | 'semi' | 'anti'
    ranges: Sequence[Tuple[int, int]],
    capacity: int,
    probe_mask=None,
) -> RecordBatch:
    """Equi-join as ONE stable merge sort + ONE compaction sort.

    The classic path costs four big sorts per joined-and-filtered probe
    (upstream filter compaction, the two co-sorting searchsorted passes,
    pair compaction) and moves the probe payload twice.  Here the packed
    build and probe keys sort TOGETHER once (stable, build entries first
    within equal keys); match structure then falls out of dense scans:

    * ``cumsum(is_build)-1`` counts build entries seen — and because keys
      ascend, ``cummax`` carries the key and origin of the most recent
      build entry to every probe entry (Trino's per-row hash lookup —
      ``operator/PagesHash.java:157`` — becomes two prefix scans);
    * an upstream Filter fuses as ``probe_mask``: dead rows pack to the
      sentinel, sort to the end, and fall out of the one compaction the
      join already pays — the standalone filter-compaction sort (and its
      full payload move) disappears;
    * the second (compaction) sort keys on ~keep only, so surviving rows
      stay in KEY order: the output is sorted by the join key, which the
      executor records in the order chains (downstream aggregations on
      the same key take the clustered, sort-free path).

    Payload never rides a sort: both sorts carry two int32 bookkeeping
    operands; survivors gather once at [capacity] via the width-class
    packed gathers.
    """
    np_, nb = probe.capacity(), build.capacity()
    total = np_ + nb
    assert total < (1 << 31), "merge_join addresses rows in int32"
    widths = _key_widths(ranges)
    bcols = [build[k] for k in build_keys]
    pcols = [probe[k] for k in probe_keys]
    bk = pack_key_words(bcols, ranges, build.num_rows, null_high=True)[0]
    pk = pack_key_words(pcols, ranges, probe.num_rows, mask=probe_mask)[0]
    bk = narrow_i32(bk, widths)
    pk = narrow_i32(pk, widths)

    key = jnp.concatenate([bk, pk])
    origin = jnp.concatenate(
        [jnp.arange(nb, dtype=jnp.int32),
         jnp.arange(np_, dtype=jnp.int32) + nb])
    s_key, s_origin = jax.lax.sort((key, origin), num_keys=1,
                                   is_stable=True)
    is_build = s_origin < nb
    sentinel = jnp.asarray(
        INT64_MAX if s_key.dtype == jnp.int64 else np.iinfo(np.int32).max,
        s_key.dtype)
    kmin = jnp.asarray(
        np.iinfo(np.int64).min if s_key.dtype == jnp.int64
        else np.iinfo(np.int32).min, s_key.dtype)
    # key of the most recent build entry: cummax is exact because s_key
    # ascends, so the latest build key is also the largest so far
    last_bkey = jax.lax.cummax(jnp.where(is_build, s_key, kmin))
    # origin of the most recent build entry: pack (position, origin) into
    # one int64 — position ascends, so cummax carries the latest pair
    t64 = jnp.arange(total, dtype=jnp.int64)
    packed = jnp.where(is_build,
                       (t64 << 32) | s_origin.astype(jnp.int64),
                       jnp.asarray(-1, jnp.int64))
    m = jax.lax.cummax(packed)
    borigin = (m & 0x7FFFFFFF).astype(jnp.int32)
    is_probe = ~is_build
    real = s_key != sentinel
    matched = is_probe & real & (m >= 0) & (last_bkey == s_key)
    if kind == "anti":
        keep = is_probe & real & ~matched
    else:
        keep = matched
    count = jnp.sum(keep.astype(jnp.int64))
    srt = jax.lax.sort(((~keep).astype(jnp.int8), s_origin, borigin),
                       num_keys=1, is_stable=True)

    def fit(arr):  # [total] -> [capacity] (mesh shards size the output
        #             buffer independently of the local input sizes)
        if capacity <= total:
            return arr[:capacity]
        return jnp.concatenate(
            [arr, jnp.zeros((capacity - total,), arr.dtype)])

    pidx = jnp.clip(fit(srt[1]) - nb, 0, max(np_ - 1, 0))
    out_live = iota(capacity) < count

    from ..batch import gather_columns

    cols = gather_columns(probe.columns, pidx)
    if kind == "inner":
        bidx = jnp.clip(fit(srt[2]), 0, max(nb - 1, 0))
        cols.update(gather_columns(build.columns, bidx, valid=out_live))
    return RecordBatch(cols, count)


def _probe_ranges(probe, build, probe_keys, build_keys, ranges,
                  build_sorted: bool = False, probe_mask=None):
    """Returns (lo, counts, bperm, live, needs_verify).  Wide composite
    keys (>63 bits) fall back to a 62-bit mix whose candidate matches the
    caller verifies against the real key columns.

    The probe is ONE co-sorting left-search; match counts come from the
    build side's run lengths (cummax/cummin over run boundaries — dense
    vector ops at build size) instead of a second 'right' search, halving
    the dominant co-sort cost (reference analog: PagesHash.getAddressIndex
    + PositionLinks chain walk, ``operator/PagesHash.java:157-169``)."""
    np_, nb = probe.capacity(), build.capacity()
    bcols = [build[k] for k in build_keys]
    pcols = [probe[k] for k in probe_keys]
    widths = _key_widths(ranges)
    if widths <= 63:
        bk = pack_key_words(bcols, ranges, build.num_rows, null_high=True)[0]
        pk = pack_key_words(pcols, ranges, probe.num_rows,
                            mask=probe_mask)[0]
        bk = narrow_i32(bk, widths)
        pk = narrow_i32(pk, widths)
        needs_verify = False
    else:
        bk = mix_key_word(bcols, ranges, build.num_rows, null_high=True)
        pk = mix_key_word(pcols, ranges, probe.num_rows, mask=probe_mask)
        needs_verify = True
    if build_sorted and not needs_verify:
        # build rows already ascending in the (single) key with live rows
        # a prefix (exec/ordering.py proves it): packing is monotone and
        # dead-row sentinels trail, so the sorted view IS the input
        sorted_bk, bperm = bk, jnp.arange(nb, dtype=jnp.int32)
    else:
        sorted_bk, bperm = jax.lax.sort((bk, iota(nb).astype(jnp.int32)),
                                        num_keys=1)
    # int32 positions throughout: int64-indexed gathers are ~2x slower
    lo = searchsorted_fast(sorted_bk, pk, side="left").astype(jnp.int32)
    live = iota(np_) < probe.num_rows
    if probe_mask is not None:
        live = live & probe_mask

    # build run lengths: next_start[i] - i at each run start
    idx32 = jnp.arange(nb, dtype=jnp.int32)
    prev = jnp.concatenate([sorted_bk[:1] + 0, sorted_bk[:-1]])
    boundary = jnp.concatenate([jnp.ones((1,), bool) if nb else
                                jnp.zeros((0,), bool),
                                sorted_bk[1:] != prev[1:]])
    next_boundary = jnp.concatenate([boundary[1:],
                                     jnp.ones((min(nb, 1),), bool)])
    mark = jnp.where(next_boundary, idx32 + 1,
                     jnp.asarray(nb, jnp.int32))
    next_start = jnp.flip(jax.lax.cummin(jnp.flip(mark)))

    lo_c = jnp.clip(lo, 0, max(nb - 1, 0))
    # one stacked take for (key-at-lo, run-end-at-lo): two separate 4M-row
    # takes cost ~120 ms each on v5e
    from ..batch import _stacked_take

    if sorted_bk.dtype == jnp.int32:
        BT = jnp.stack([sorted_bk, next_start], axis=1)
        G = _stacked_take(BT, lo_c)
        key_at, end_at = G[:, 0], G[:, 1]
    else:
        key_at = jnp.take(sorted_bk, lo_c, mode="clip")
        end_at = jnp.take(next_start, lo_c, mode="clip")
    match = key_at == pk
    # build-side sentinels sort to the end (null_high): a probe sentinel
    # (dead row / null key) equals them but is masked by `live`
    sentinel = jnp.asarray(
        INT64_MAX if sorted_bk.dtype == jnp.int64
        else np.iinfo(np.int32).max, sorted_bk.dtype)
    real = pk != sentinel
    counts = jnp.where(live & match & real & (lo < nb),
                       (end_at - lo_c.astype(jnp.int32)).astype(jnp.int64),
                       0)
    return lo, counts, bperm, live, needs_verify


def _expand(probe, build, lo, counts_real, counts_emit, bperm, capacity):
    """Prefix-sum expansion of match ranges into a flat pair batch.

    The per-pair bookkeeping lookups (offsets/counts/lo at pidx) ride ONE
    stacked int32 gather — four separate 8M-row takes cost ~150 ms each
    on v5e; amortised they cost one."""
    np_ = probe.capacity()
    nb = build.capacity()
    offsets = jnp.cumsum(counts_emit)
    total = offsets[-1] if np_ > 0 else jnp.asarray(0, jnp.int64)
    out_i = iota(capacity)
    off32 = jnp.minimum(offsets, capacity).astype(jnp.int32)
    if capacity < (1 << 31):
        # int32 co-sort: offsets clipped at capacity keep every "<= j"
        # relation for j < capacity (overflow trips the capacity guard)
        pidx = searchsorted_fast(off32, out_i.astype(jnp.int32),
                                 side="right")
    else:
        pidx = searchsorted_fast(offsets, out_i, side="right")
    pidx = jnp.clip(pidx, 0, np_ - 1).astype(jnp.int32)

    from ..batch import _stacked_take, gather_columns

    B = jnp.stack([off32, counts_emit.astype(jnp.int32),
                   counts_real.astype(jnp.int32), lo.astype(jnp.int32)],
                  axis=1)
    G = _stacked_take(B, pidx)
    out_i32 = out_i.astype(jnp.int32)
    start = G[:, 0] - G[:, 1]
    k = out_i32 - start
    matched = k < G[:, 2]
    bpos = jnp.take(bperm, jnp.clip(G[:, 3] + k, 0, max(nb - 1, 0)),
                    mode="clip")
    out_live = out_i < total

    cols = gather_columns(probe.columns, pidx)
    cols.update(gather_columns(build.columns, bpos, valid=matched))
    return RecordBatch(cols, total), pidx, matched, out_live, offsets


def hash_join(
    probe: RecordBatch,
    build: RecordBatch,
    probe_keys: Sequence[str],
    build_keys: Sequence[str],
    kind: str,  # 'inner' | 'left' | 'semi' | 'anti'
    ranges: Sequence[Tuple[int, int]],
    capacity: int,
    residual: Optional[Expr] = None,
    stats: Optional[dict] = None,
    build_unique: bool = False,
    build_sorted: bool = False,
    probe_mask=None,
) -> RecordBatch:
    assert probe_mask is None or kind in ("inner", "semi", "anti"), \
        "a fused probe mask would drop LEFT/FULL null-extended rows"
    if merge_join_applicable(kind, ranges, residual, build_unique):
        return merge_join(probe, build, probe_keys, build_keys, kind,
                          ranges, capacity, probe_mask=probe_mask)

    lo, counts, bperm, live, needs_verify = _probe_ranges(
        probe, build, probe_keys, build_keys, ranges,
        build_sorted=build_sorted, probe_mask=probe_mask)

    if build_unique and residual is None and not needs_verify \
            and kind == "left":
        # N:1 LEFT fast path — a pure in-place lookup, no expansion and
        # no compaction: every probe row emits exactly one output row
        # (matched rows null-extend nothing; inner-unique goes through
        # merge_join above instead)
        from ..batch import gather_columns

        nb = build.capacity()
        matched = (counts > 0) & live
        bpos = jnp.take(bperm, jnp.clip(lo, 0, max(nb - 1, 0)), mode="clip")
        cols = dict(probe.columns)
        cols.update(gather_columns(build.columns, bpos, valid=matched))
        return RecordBatch(cols, probe.num_rows)
    np_ = probe.capacity()
    if needs_verify:
        from ..expr.ir import ColumnRef, call as ir_call

        verify = None
        for pk_name, bk_name in zip(probe_keys, build_keys):
            eq = ir_call("=", ColumnRef(pk_name, probe[pk_name].type),
                         ColumnRef(bk_name, build[bk_name].type))
            verify = eq if verify is None else ir_call("and", verify, eq)
        residual = verify if residual is None else ir_call(
            "and", verify, residual)

    if kind in ("semi", "anti") and residual is None:
        hit = counts > 0
        mask = (hit if kind == "semi" else ~hit) & live
        idx, n = compact_indices(mask, capacity)
        return probe.gather(idx, n)

    if kind in ("semi", "anti"):
        # expand all candidate pairs, apply residual, reduce per probe row.
        # pair rows are ordered by probe row, so the per-probe "any pair
        # passes" reduction is a prefix-sum difference (no scatter).
        pairs, pidx, matched, out_live, offsets = _expand(
            probe, build, lo, counts, counts, bperm, capacity)
        if stats is not None:
            stats["pairs_total"] = pairs.num_rows
        rm = eval_predicate(residual, pairs) & matched & out_live
        hits = sorted_segment_sum(
            rm.astype(jnp.int64),
            jnp.clip(offsets - counts, 0, capacity),
            jnp.clip(offsets, 0, capacity))
        hit = hits > 0
        mask = (hit if kind == "semi" else ~hit) & live
        idx, n = compact_indices(mask, np_)
        return probe.gather(idx, n)

    if kind == "inner":
        pairs, pidx, matched, out_live, _ = _expand(
            probe, build, lo, counts, counts, bperm, capacity)
        if stats is not None:
            stats["pairs_total"] = pairs.num_rows
        if residual is not None:
            rm = eval_predicate(residual, pairs) & out_live
            idx, n = compact_indices(rm, capacity)
            return pairs.gather(idx, n)
        return pairs

    if kind == "left":
        counts_emit = jnp.where(live, jnp.maximum(counts, 1), 0)
        pairs, pidx, matched, out_live, offsets = _expand(
            probe, build, lo, counts, counts_emit, bperm, capacity)
        if stats is not None:
            stats["pairs_total"] = pairs.num_rows
        if residual is None:
            return pairs
        # LEFT with residual (also: wide->63-bit keys whose candidates need
        # re-verification).  Keep pairs that pass; a probe row with no
        # passing pair keeps its FIRST pair slot, null-extended on the
        # build side.  Reference analog: LookupJoinOperator's
        # outerJoinCurrentPosition (operator/LookupJoinOperator.java) —
        # here the "emitted a row?" flag is a segmented reduction.
        rm = eval_predicate(residual, pairs) & matched & out_live
        starts = jnp.clip(offsets - counts_emit, 0, capacity)
        ends = jnp.clip(offsets, 0, capacity)
        hits = sorted_segment_sum(rm.astype(jnp.int64), starts, ends)
        hit_at = jnp.take(hits > 0, pidx, mode="clip")
        start_at = jnp.take(starts, pidx, mode="clip")
        is_first = iota(capacity) == start_at
        keep = (rm | (is_first & ~hit_at)) & out_live
        cols = {}
        for name, c in pairs.columns.items():
            if name in build.columns:
                v = rm if c.validity is None else (c.validity & rm)
                cols[name] = Column(c.data, c.type, validity=v,
                                    dictionary=c.dictionary)
            else:
                cols[name] = c
        masked = RecordBatch(cols, pairs.num_rows)
        idx, n = compact_indices(keep, capacity)
        return masked.gather(idx, n)

    raise NotImplementedError(f"join kind {kind}")


def cross_join(probe: RecordBatch, build: RecordBatch, capacity: int) -> RecordBatch:
    """Cartesian product; the planner only emits this for tiny build sides
    (scalar subqueries), where it is a broadcast."""
    nb_rows = build.num_rows
    np_ = probe.capacity()
    if isinstance(nb_rows, int) and nb_rows == 1:
        cols = dict(probe.columns)
        for name, c in build.columns.items():
            data = jnp.broadcast_to(c.data[:1], (np_,) + c.data.shape[1:])
            validity = None
            if c.validity is not None:
                validity = jnp.broadcast_to(c.validity[:1], (np_,))
            cols[name] = Column(data, c.type, validity=validity,
                                dictionary=c.dictionary)
        return RecordBatch(cols, probe.num_rows)
    from ..batch import gather_columns

    nb = build.capacity()
    out_i = iota(capacity)
    pidx = jnp.clip(out_i // nb_rows, 0, np_ - 1)
    bpos = out_i % jnp.maximum(nb_rows, 1)
    total = probe.num_rows * nb_rows
    cols = gather_columns(probe.columns, pidx)
    cols.update(gather_columns(build.columns, jnp.clip(bpos, 0, nb - 1)))
    return RecordBatch(cols, total)
