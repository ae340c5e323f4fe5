"""Group-by aggregation: sort + segmented reduction.

The reference's ``HashAggregationOperator`` / ``GroupByHash``
(``core/trino-main/.../operator/BigintGroupByHash.java:168`` — murmur hash +
linear-probe insert per row) is a scalar-at-a-time design.  The TPU-native
equivalent groups by *sorting* the packed key word and reducing segments:

    pack keys -> lax.sort -> boundaries -> segment_{sum,min,max}

Every step is a dense vector op XLA schedules onto the VPU; there is no
per-row control flow, no hash table, no rehash.  (The empirical literature
on sort- vs hash-based grouping on wide-SIMD hardware backs this choice;
a Pallas radix-sort kernel slots in under lax.sort for further speed.)

Decimal sums are exact: 64-bit inputs are split into 32-bit limbs that are
summed separately and recombined, so no intermediate overflows even at
SF100k row counts (the reference sums DOUBLEs and accepts fp error; we
document exactness as a policy win, SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch
from ..types import BIGINT, DOUBLE, REAL, DecimalType, SqlType
from .common import INT64_MAX, iota, pack_key_words
from .segments import (
    _scatter_ok, compact_indices, minmax_by_value_sort,
    sorted_segment_minmax_cpu, sorted_segment_sum, sorted_segment_sum_multi,
)


PERCENTILE_FNS = ("approx_percentile", "median")


@dataclass
class AggSpec:
    fn: str  # 'sum'|'count'|'count_star'|'min'|'max'|'avg'|percentile fns
    input: Optional[Column]  # evaluated argument (None for count_star)
    name: str
    param: Optional[float] = None  # percentile fraction

    def output_type(self) -> SqlType:
        if self.fn in ("count", "count_star"):
            return BIGINT
        t = self.input.type
        if self.fn == "avg":
            return DOUBLE
        if self.fn == "sum":
            if t.kind == "decimal":
                # exact at every scale (reference: Decimals.java sums at
                # decimal(38,s)); the device repr is an 18-digit int64, so
                # sums that cannot be PROVEN in-range carry a traced
                # overflow guard instead of degrading to DOUBLE
                return DecimalType(38, t.scale)  # type: ignore[attr-defined]
            if t.kind in ("integer", "smallint", "tinyint"):
                return BIGINT
            if t.kind == "real":
                return REAL
            return t
        return t  # min/max


def _sum_provably_safe(t, n_rows: int) -> bool:
    """True when an int64 accumulator cannot overflow: worst-case unscaled
    magnitude (10^precision, capped at the 18-digit device repr) times the
    row capacity stays inside int64 with a 5% margin.  SF1 lineitem
    (8.4M rows of decimal(12,2)) is provably safe — the single-reduction
    path; SF10 is not — the guarded limb path."""
    p = getattr(t, "precision", 18)
    return (10 ** min(p, 18)) * max(n_rows, 1) < int(0.95 * 2 ** 63)


def _guard_limb_total(slo, shi, checks):
    """Exact int64 total from 32-bit limb sums; appends a traced guard
    that the mathematical total fits the device decimal (the executor's
    overflow_checks mechanism raises host-side)."""
    if checks is not None:
        approx = (shi.astype(jnp.float64) * 4294967296.0
                  + slo.astype(jnp.float64))
        checks.append(jnp.all(jnp.abs(approx) < 9.0e18))
    return shi * _LIMB + slo


def _group_structure(key_words, max_groups: int, payload=(),
                     clustered: bool = False):
    """Sort the packed key word(s); derive segment bounds — no scatters.
    ``payload`` arrays ride the sort as extra operands (TPU gathers are
    ~24x slower than sort-carried payloads).

    ``clustered=True`` asserts equal keys are ALREADY adjacent (input
    physically sorted/clustered on the group keys — exec/ordering.py
    proves it from connector sort metadata): the dominant multi-operand
    sort disappears entirely; only the boundary scan and the 2-operand
    boundary-position sort remain (StreamingAggregationOperator analog)."""
    n = key_words[0].shape[0]
    nw = len(key_words)
    if clustered:
        sorted_words, order = key_words, iota(n)
        sorted_payload = tuple(payload)
    else:
        out = jax.lax.sort(tuple(key_words) + (iota(n),) + tuple(payload),
                           num_keys=len(key_words))
        sorted_words, order = out[:nw], out[nw]
        sorted_payload = out[nw + 1:]
    boundary = jnp.concatenate([
        jnp.ones((1,), dtype=bool),
        jnp.zeros((n - 1,), dtype=bool)]) if n else jnp.zeros((0,), bool)
    for w in sorted_words:
        prev = jnp.concatenate([jnp.full((1,), -1, dtype=jnp.int64), w[:-1]])
        boundary = boundary | (w != prev)
    real = sorted_words[0] != INT64_MAX
    gid_raw = jnp.cumsum(boundary) - 1
    num_groups = jnp.sum(boundary & real)
    gid_sorted = jnp.where(real, gid_raw, max_groups)
    # segment bounds WITHOUT searchsorted: gids are CONSECUTIVE integers
    # (cumsum of boundary), so group g starts at the position of the g-th
    # boundary — one 2-operand sort of n instead of two (n + max_groups)
    # cosort searchsorteds (xplane: the pair cost ~80 ms + copies at Q18's
    # 6M rows x 6.3M slots, ~20% of the fragment)
    n_real = jnp.sum(real.astype(jnp.int64))
    bkey = (~(boundary & real)).astype(jnp.int8)
    _, bpos = jax.lax.sort((bkey, iota(n).astype(jnp.int32)), num_keys=1)
    gslots = iota(max_groups)
    live = gslots < num_groups
    if max_groups <= n:
        bsel = bpos[:max_groups].astype(jnp.int64)
    else:
        bsel = jnp.concatenate(
            [bpos.astype(jnp.int64),
             jnp.zeros((max_groups - n,), jnp.int64)])
    starts = jnp.where(live, bsel, n_real)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int64)])
    ends = jnp.where(live, jnp.minimum(ends, n_real), n_real)
    if clustered:  # order is the identity — no gather needed
        repr_idx = jnp.clip(starts, 0, n - 1)
    else:
        repr_idx = jnp.take(order, jnp.clip(starts, 0, n - 1))
    return order, gid_sorted, num_groups, starts, ends, repr_idx, sorted_payload


_LIMB = jnp.int64(1 << 32)
_LIMB_MASK = jnp.int64((1 << 32) - 1)


def _exact_sum_f64(vals_i64, starts, ends):
    """Overflow-proof int64 segmented sum, recombined in float64."""
    slo = sorted_segment_sum(vals_i64 & _LIMB_MASK, starts, ends)
    shi = sorted_segment_sum(vals_i64 >> 32, starts, ends)
    return shi.astype(jnp.float64) * 4294967296.0 + slo.astype(jnp.float64)


def _collect_plans(aggs):
    """Plan all aggregates as columns of shared reduction matrices.

    Every sum-like reduction (sums, counts, avg numerators/denominators,
    32-bit limbs of overflow-proof sums) becomes a column of an [n, k]
    int64 or float64 matrix; the matrices ride the grouping sort as
    payload operands and reduce with one sorted_segment_sum_multi pass.
    """
    int_cols = []    # int64 sum requests (exact)
    float_cols = []  # float64 sum requests
    plans = []       # per agg: (spec, kind, payload)

    def req(col):
        int_cols.append(col.astype(jnp.int64))
        return len(int_cols) - 1

    def freq(col):
        float_cols.append(col.astype(jnp.float64))
        return len(float_cols) - 1

    for spec in aggs:
        fn = spec.fn
        if fn == "count_star":
            plans.append((spec, "count_star", None))
            continue
        c = spec.input
        valid = c.validity
        cnt_ix = None
        if valid is not None:
            cnt_ix = req(valid.astype(jnp.int64))
        if fn == "count":
            plans.append((spec, "count", cnt_ix))
            continue
        if fn in ("min", "max"):
            plans.append((spec, fn, None))
            continue
        # sum / avg
        t = c.type
        vals = c.data
        if valid is not None:
            vals = jnp.where(valid, vals, jnp.zeros((), vals.dtype))
        if t.kind == "double":
            ix = freq(vals)
            plans.append((spec, "fsum", (ix, cnt_ix)))
            continue
        vals64 = vals.astype(jnp.int64)
        out_t = spec.output_type()
        if fn == "avg" or out_t.kind == "double":
            lo_ix = req(vals64 & _LIMB_MASK)
            hi_ix = req(vals64 >> 32)
            plans.append((spec, "limb", (lo_ix, hi_ix, cnt_ix)))
        elif (out_t.kind == "decimal"
              and not _sum_provably_safe(t, vals64.shape[0])):
            # exact wide-decimal sum: limb accumulation + overflow guard
            lo_ix = req(vals64 & _LIMB_MASK)
            hi_ix = req(vals64 >> 32)
            plans.append((spec, "limb_exact", (lo_ix, hi_ix, cnt_ix)))
        else:
            ix = req(vals64)
            plans.append((spec, "isum", (ix, cnt_ix)))

    return int_cols, float_cols, plans


def _finalize_aggs(plans, sums, fsums, starts, ends, order, key_words,
                   max_groups, checks=None):
    base_cnt = (ends - starts).astype(jnp.int64)

    def cnt_of(cnt_ix):
        if cnt_ix is None:
            return base_cnt
        return sums[:, cnt_ix].astype(jnp.int64)

    out = {}
    for spec, kind, payload in plans:
        if kind == "count_star":
            out[spec.name] = Column(base_cnt, BIGINT)
            continue
        if kind == "count":
            out[spec.name] = Column(cnt_of(payload), BIGINT)
            continue
        if kind in ("min", "max"):
            c = spec.input
            cnt = base_cnt if c.validity is None else None
            if cnt is None:
                # need the count column: recompute via value-sort validity
                cnt = sorted_segment_sum(
                    jnp.take(c.validity.astype(jnp.int64), order,
                             mode="clip"), starts, ends)
            nonempty = cnt > 0
            v = minmax_by_value_sort(key_words, c.data, starts, ends,
                                     kind == "min", valid=c.validity)
            v = jnp.where(nonempty, v, jnp.zeros((), v.dtype))
            out[spec.name] = Column(v, c.type, validity=nonempty,
                                    dictionary=c.dictionary)
            continue
        t = spec.input.type
        out_t = spec.output_type()
        if kind == "fsum":
            ix, cnt_ix = payload
            cnt = cnt_of(cnt_ix)
            nonempty = cnt > 0
            s = fsums[:, ix]
            if spec.fn == "avg":
                s = s / jnp.maximum(cnt, 1)
            out[spec.name] = Column(s, DOUBLE, validity=nonempty)
            continue
        if kind == "limb":
            lo_ix, hi_ix, cnt_ix = payload
            cnt = cnt_of(cnt_ix)
            nonempty = cnt > 0
            total = (sums[:, hi_ix].astype(jnp.float64) * 4294967296.0
                     + sums[:, lo_ix].astype(jnp.float64))
            scale = 10 ** t.scale if t.kind == "decimal" else 1  # type: ignore[attr-defined]
            if spec.fn == "avg":
                v = total / (jnp.maximum(cnt, 1) * scale)
            else:
                v = total / scale
            out[spec.name] = Column(v, DOUBLE, validity=nonempty)
            continue
        if kind == "limb_exact":
            lo_ix, hi_ix, cnt_ix = payload
            cnt = cnt_of(cnt_ix)
            nonempty = cnt > 0
            total = _guard_limb_total(sums[:, lo_ix], sums[:, hi_ix],
                                      checks)
            out[spec.name] = Column(total, out_t, validity=nonempty)
            continue
        # isum
        ix, cnt_ix = payload
        cnt = cnt_of(cnt_ix)
        nonempty = cnt > 0
        out[spec.name] = Column(sums[:, ix].astype(jnp.int64), out_t,
                                validity=nonempty)
    return out


def group_aggregate(
    keys: Sequence[Tuple[str, Column]],
    aggs: Sequence[AggSpec],
    num_rows,
    ranges: Sequence[Tuple[int, int]],
    max_groups: int,
    mask: Optional[jnp.ndarray] = None,
    carry: Sequence[Tuple[str, Column]] = (),
    checks: Optional[list] = None,
    clustered: bool = False,
) -> RecordBatch:
    """Grouped aggregation.  ``mask`` fuses an upstream filter for free.

    ``clustered=True``: equal key tuples are already adjacent in row order
    (and live rows form a prefix), so the grouping sort is skipped — see
    ``_group_structure``.  Caller must guarantee the property (the
    executor proves it from connector sort metadata) and must NOT pass a
    ``mask`` (masked-out rows inside a cluster would surface as groups).

    ``checks`` (the executor's overflow_checks list) receives traced
    guards for wide-decimal sums that cannot be statically proven to fit
    the int64 device decimal.

    ``carry`` columns are functionally dependent on the keys (the optimizer
    proves this via PK/FK analysis): they are not packed or compared, just
    materialised from each group's representative row — the reason Q10-style
    "group by pk, name, address, …" queries cost no more than "group by pk".
    """
    key_cols = [c for _, c in keys]
    # dense fast path: tiny key domains (Q1's 3x2 flags) need no sort at
    # all — G masked reduction passes beat a full sort + gathers by >10x.
    # The loop domain is MIXED-RADIX (product of exact key spans), not the
    # bit-packed power-of-2 domain: Q1 runs 12 passes instead of 32.
    pctl_specs = [s for s in aggs if s.fn in PERCENTILE_FNS]
    aggs = [s for s in aggs if s.fn not in PERCENTILE_FNS]
    dense_domain = 1
    for lo, hi in ranges:
        dense_domain *= int(hi - lo + 2)  # +1 null slot, +1 exclusive top
        if dense_domain > DENSE_MAX_GROUPS:
            break
    if (not pctl_specs and dense_domain <= DENSE_MAX_GROUPS
            and dense_domain <= max_groups):
        return _dense_group_aggregate(keys, aggs, num_rows, ranges,
                                      max_groups, dense_domain, mask, carry,
                                      checks)
    if clustered and mask is not None:
        clustered = False
    words = pack_key_words(key_cols, ranges, num_rows, mask=mask)
    int_cols, float_cols, plans = _collect_plans(aggs)
    payload = tuple(int_cols) + tuple(float_cols)
    (order, gid_sorted, num_groups, starts, ends, repr_idx,
     sorted_payload) = _group_structure(words, max_groups, payload,
                                        clustered=clustered)
    # value sorts (min/max, percentiles) need a key that is ascending in
    # the SEGMENT order: the packed words after the grouping sort, or the
    # (already nondecreasing) gid stream on the clustered path
    vkeys = (gid_sorted,) if clustered else words
    ni = len(int_cols)
    sums = fsums = None
    if ni:
        sums = sorted_segment_sum_multi(
            jnp.stack(sorted_payload[:ni], axis=1), starts, ends)
    if float_cols:
        fsums = sorted_segment_sum_multi(
            jnp.stack(sorted_payload[ni:], axis=1), starts, ends)

    out = {}
    group_live = iota(max_groups) < num_groups
    from ..batch import gather_columns

    rep_cols = gather_columns(
        {name: c for name, c in list(keys) + list(carry)}, repr_idx)
    out.update(rep_cols)
    # key columns of dead slots are garbage but num_rows masks them
    agg_out = _finalize_aggs(plans, sums, fsums, starts, ends, order,
                             vkeys, max_groups, checks)
    for name, col in agg_out.items():
        if col.validity is not None:
            col = col.with_data(col.data, col.validity & group_live)
        out[name] = col
    for spec in pctl_specs:
        out[spec.name] = _segment_percentile(spec, vkeys, starts, ends,
                                             group_live)
    return RecordBatch(out, num_groups)


def _segment_percentile(spec: AggSpec, words, starts, ends, group_live):
    """Order statistic per group: one extra (word, value) sort, then a
    nearest-rank read at start + round(p * (n_valid - 1)).

    The reference approximates with a qdigest sketch
    (``operator/aggregation/ApproximateLongPercentileAggregations``); the
    sorted-aggregation design makes the exact statistic one sort away, so
    approx_percentile here is exact (documented policy win).  NULLs sort
    to the segment tail via a sentinel and are excluded by the valid
    count.
    """
    c = spec.input
    n = words[0].shape[0]
    xv = c.data
    if xv.dtype.kind == "f":
        sent = jnp.asarray(np.inf, xv.dtype)
    else:
        xv = xv.astype(jnp.int64)
        sent = jnp.asarray(INT64_MAX, jnp.int64)
    valid = c.validity
    xs = xv if valid is None else jnp.where(valid, xv, sent)
    vi = (jnp.ones((n,), jnp.int32) if valid is None
          else valid.astype(jnp.int32))
    out = jax.lax.sort(tuple(words) + (xs, vi), num_keys=len(words) + 1)
    sx, sv = out[-2], out[-1]
    cps = jnp.concatenate(
        [jnp.zeros((1,), jnp.int64), jnp.cumsum(sv.astype(jnp.int64))])
    cnt = jnp.take(cps, ends) - jnp.take(cps, starts)
    p = 0.5 if spec.fn == "median" else float(spec.param)
    pos = jnp.clip(jnp.round(p * (cnt - 1)).astype(jnp.int64),
                   0, jnp.maximum(cnt - 1, 0))
    idx = jnp.clip(starts + pos, 0, n - 1)
    val = jnp.take(sx, idx)
    validity = (cnt > 0) & group_live
    return Column(val.astype(c.data.dtype if c.data.dtype.kind == "f"
                             else jnp.int64),
                  spec.output_type(), validity=validity,
                  dictionary=c.dictionary)


def global_aggregate(
    aggs: Sequence[AggSpec],
    num_rows,
    capacity: int,
    mask: Optional[jnp.ndarray] = None,
    checks: Optional[list] = None,
) -> RecordBatch:
    """Aggregation without GROUP BY — always exactly one output row."""
    live = jnp.arange(capacity) < num_rows
    if mask is not None:
        live = live & mask

    out = {}
    for spec in aggs:
        if spec.fn == "count_star":
            v = jnp.sum(live).astype(jnp.int64)
            out[spec.name] = Column(v[None], BIGINT)
            continue
        c = spec.input
        valid = live if c.validity is None else (live & c.validity)
        cnt = jnp.sum(valid).astype(jnp.int64)
        nonempty = (cnt > 0)[None]
        t = c.type
        if spec.fn == "count":
            out[spec.name] = Column(cnt[None], BIGINT)
        elif spec.fn in ("sum", "avg"):
            out_t = spec.output_type()
            if t.kind == "double":
                s = jnp.sum(jnp.where(valid, c.data, 0.0))
                v = s / jnp.maximum(cnt, 1) if spec.fn == "avg" else s
                out[spec.name] = Column(v[None], DOUBLE, validity=nonempty)
            else:
                vals = jnp.where(valid, c.data.astype(jnp.int64), 0)
                slo = jnp.sum(vals & _LIMB_MASK)
                shi = jnp.sum(vals >> 32)
                scale = 10 ** t.scale if t.kind == "decimal" else 1  # type: ignore[attr-defined]
                if spec.fn == "avg":
                    tot = shi.astype(jnp.float64) * 4294967296.0 + slo.astype(jnp.float64)
                    v = tot / (jnp.maximum(cnt, 1) * scale)
                    out[spec.name] = Column(v[None], DOUBLE, validity=nonempty)
                elif out_t.kind == "double":
                    tot = shi.astype(jnp.float64) * 4294967296.0 + slo.astype(jnp.float64)
                    out[spec.name] = Column((tot / scale)[None], DOUBLE, validity=nonempty)
                else:
                    guards = (None if _sum_provably_safe(t, capacity)
                              else checks)
                    s = _guard_limb_total(slo, shi, guards)
                    out[spec.name] = Column(s[None], out_t, validity=nonempty)
        elif spec.fn in ("min", "max"):
            if t.np_dtype.kind == "f":
                sent = jnp.inf if spec.fn == "min" else -jnp.inf
            else:
                info = np.iinfo(t.np_dtype)
                sent = info.max if spec.fn == "min" else info.min
            vals = jnp.where(valid, c.data, jnp.asarray(sent, c.data.dtype))
            v = jnp.min(vals) if spec.fn == "min" else jnp.max(vals)
            v = jnp.where(cnt > 0, v, jnp.zeros((), v.dtype))
            out[spec.name] = Column(v[None], t, validity=nonempty,
                                    dictionary=c.dictionary)
        elif spec.fn in PERCENTILE_FNS:
            xv = c.data
            if xv.dtype.kind == "f":
                sent_v = jnp.asarray(np.inf, xv.dtype)
            else:
                xv = xv.astype(jnp.int64)
                sent_v = jnp.asarray(INT64_MAX, jnp.int64)
            xs = jnp.where(valid, xv, sent_v)
            sx = jnp.sort(xs)
            p = 0.5 if spec.fn == "median" else float(spec.param)
            pos = jnp.clip(jnp.round(p * (cnt - 1)).astype(jnp.int64),
                           0, jnp.maximum(cnt - 1, 0))
            v = jnp.take(sx, pos)
            out[spec.name] = Column(
                v[None].astype(c.data.dtype if c.data.dtype.kind == "f"
                               else jnp.int64),
                spec.output_type(), validity=nonempty,
                dictionary=c.dictionary)
        else:
            raise NotImplementedError(spec.fn)
    return RecordBatch(out, 1)


DENSE_MAX_GROUPS = 32


def pack_dense_word(key_cols, ranges, num_rows, mask):
    """Mixed-radix group word, FIRST key most significant (word order =
    lexicographic key order, matching ``pack_key_words``).

    Unlike the bit-packed sort keys, the dense path iterates every
    candidate word, so the domain must be tight: the product of exact
    per-key spans, not the next power of two.  Dead or masked-out rows
    get the out-of-domain sentinel (= domain size)."""
    n = len(key_cols[0])
    spans = [int(hi - lo + 2) for lo, hi in ranges]  # 0 reserved for NULL
    word = jnp.zeros((n,), dtype=jnp.int64)
    stride = 1
    for c, (lo, hi), span in zip(reversed(key_cols), reversed(ranges),
                                 reversed(spans)):
        v = c.data.astype(jnp.int64) - lo + 1
        v = jnp.clip(v, 0, span - 1)
        if c.validity is not None:
            v = jnp.where(c.validity, v, 0)
        word = word + v * stride
        stride *= span
    dead = iota(n) >= num_rows
    if mask is not None:
        dead = dead | ~mask
    return jnp.where(dead, jnp.asarray(stride, jnp.int64), word)


def _dense_group_aggregate(keys, aggs, num_rows, ranges, max_groups,
                           span, mask, carry, checks=None):
    """Sort-free aggregation over a dense key domain.

    The mixed-radix key word IS the group id; each of the <=32 candidate
    groups is reduced with one masked vector pass (bandwidth G*n*k, all
    VPU, no sort, no gather).  Output groups are compacted to the
    nonempty ones.
    """
    key_cols = [c for _, c in keys]
    word = pack_dense_word(key_cols, ranges, num_rows, mask)
    n = word.shape[0]
    io = iota(n)

    # collect reduction requests (same recipe structure as _assemble_aggs)
    int_cols, float_cols, minmax = [], [], []
    plans = []

    def req(col):
        int_cols.append(col.astype(jnp.int64))
        return len(int_cols) - 1

    def freq(col):
        float_cols.append(col.astype(jnp.float64))
        return len(float_cols) - 1

    for spec in aggs:
        fn = spec.fn
        if fn == "count_star":
            plans.append((spec, "count_star", None))
            continue
        c = spec.input
        valid = c.validity
        cnt_ix = req(valid.astype(jnp.int64)) if valid is not None else None
        if fn == "count":
            plans.append((spec, "count", cnt_ix))
            continue
        if fn in ("min", "max"):
            plans.append((spec, fn, len(minmax)))
            minmax.append((c, fn == "min"))
            continue
        t = c.type
        vals = c.data
        if valid is not None:
            vals = jnp.where(valid, vals, jnp.zeros((), vals.dtype))
        if t.kind == "double":
            plans.append((spec, "fsum", (freq(vals), cnt_ix)))
            continue
        vals64 = vals.astype(jnp.int64)
        out_t = spec.output_type()
        if fn == "avg" or out_t.kind == "double":
            plans.append((spec, "limb",
                          (req(vals64 & _LIMB_MASK), req(vals64 >> 32),
                           cnt_ix)))
        elif (out_t.kind == "decimal"
              and not _sum_provably_safe(t, vals64.shape[0])):
            plans.append((spec, "limb_exact",
                          (req(vals64 & _LIMB_MASK), req(vals64 >> 32),
                           cnt_ix)))
        else:
            plans.append((spec, "isum", (req(vals64), cnt_ix)))

    # columns reduce SEPARATELY (1-D arrays tile across all 128 lanes;
    # stacking to [n, k] pads the k-minor axis to 128 lanes on TPU and
    # wastes ~128/k of the bandwidth — measured 3.4x on SF1 Q1)
    g_counts, g_isums, g_fsums, g_minmax, g_repr = [], [], [], [], []
    for g in range(span):
        sel = word == g
        g_counts.append(jnp.sum(sel.astype(jnp.int64)))
        g_repr.append(jnp.min(jnp.where(sel, io, n)))
        if int_cols:
            g_isums.append(jnp.stack(
                [jnp.sum(jnp.where(sel, c, 0)) for c in int_cols]))
        if float_cols:
            g_fsums.append(jnp.stack(
                [jnp.sum(jnp.where(sel, c, 0.0)) for c in float_cols]))
        row_mm = []
        for c, is_min in minmax:
            v = c.data
            if v.dtype.kind == "f":
                sent = jnp.asarray(np.inf if is_min else -np.inf, v.dtype)
            else:
                info = np.iinfo(np.dtype(v.dtype.name))
                sent = jnp.asarray(info.max if is_min else info.min, v.dtype)
            m = sel if c.validity is None else (sel & c.validity)
            vv = jnp.where(m, v, sent)
            row_mm.append(jnp.min(vv) if is_min else jnp.max(vv))
        g_minmax.append(row_mm)

    counts = jnp.stack(g_counts)                      # [span]
    reprs = jnp.stack(g_repr)
    isums = jnp.stack(g_isums) if int_cols else None   # [span, ki]
    fsums = jnp.stack(g_fsums) if float_cols else None

    # compact nonempty groups to the front (span is tiny)
    live = counts > 0
    idx, num_groups = compact_indices(live, span)
    pad = max_groups - span

    def fix(a, fill=0):
        a = jnp.take(a, idx, axis=0, mode="clip")
        if pad > 0:
            widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, widths, constant_values=fill)
        return a

    counts_c = fix(counts)
    reprs_c = jnp.clip(fix(reprs), 0, n - 1)
    isums_c = fix(isums) if isums is not None else None
    fsums_c = fix(fsums) if fsums is not None else None

    out = {}
    group_live = iota(max_groups) < num_groups
    for name, c in list(keys) + list(carry):
        out[name] = c.gather(reprs_c, valid=None)

    def cnt_of(cnt_ix):
        if cnt_ix is None:
            return counts_c
        return isums_c[:, cnt_ix]

    for spec, kind, payload in plans:
        if kind == "count_star":
            out[spec.name] = Column(counts_c, BIGINT)
            continue
        if kind == "count":
            out[spec.name] = Column(cnt_of(payload), BIGINT)
            continue
        if kind in ("min", "max"):
            mmvals = jnp.stack([row[payload] for row in g_minmax])
            v = fix(mmvals)
            c = next(s.input for s, k, p in plans
                     if k == kind and p == payload)
            cnt = cnt_of(None)
            nonempty = (cnt > 0) & group_live
            v = jnp.where(nonempty, v, jnp.zeros((), v.dtype))
            out[spec.name] = Column(v, spec.input.type, validity=nonempty,
                                    dictionary=spec.input.dictionary)
            continue
        t = spec.input.type
        if kind == "fsum":
            ix, cnt_ix = payload
            cnt = cnt_of(cnt_ix)
            nonempty = (cnt > 0) & group_live
            s = fsums_c[:, ix]
            if spec.fn == "avg":
                s = s / jnp.maximum(cnt, 1)
            out[spec.name] = Column(s, DOUBLE, validity=nonempty)
            continue
        if kind == "limb":
            lo_ix, hi_ix, cnt_ix = payload
            cnt = cnt_of(cnt_ix)
            nonempty = (cnt > 0) & group_live
            total = (isums_c[:, hi_ix].astype(jnp.float64) * 4294967296.0
                     + isums_c[:, lo_ix].astype(jnp.float64))
            scale = 10 ** t.scale if t.kind == "decimal" else 1  # type: ignore[attr-defined]
            if spec.fn == "avg":
                v = total / (jnp.maximum(cnt, 1) * scale)
            else:
                v = total / scale
            out[spec.name] = Column(v, DOUBLE, validity=nonempty)
            continue
        if kind == "limb_exact":
            lo_ix, hi_ix, cnt_ix = payload
            cnt = cnt_of(cnt_ix)
            nonempty = (cnt > 0) & group_live
            total = _guard_limb_total(isums_c[:, lo_ix], isums_c[:, hi_ix],
                                      checks)
            out[spec.name] = Column(total, spec.output_type(),
                                    validity=nonempty)
            continue
        ix, cnt_ix = payload
        cnt = cnt_of(cnt_ix)
        nonempty = (cnt > 0) & group_live
        out[spec.name] = Column(isums_c[:, ix], spec.output_type(),
                                validity=nonempty)
    return RecordBatch(out, num_groups)
