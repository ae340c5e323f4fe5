"""Logical plan execution over device batches — eager and compiled modes.

The stand-in for the reference's whole worker data plane
(LocalExecutionPlanner → Driver/operator chain,
``sql/planner/LocalExecutionPlanner.java:390``,
``operator/Driver.java:262``): each logical node maps to one vectorized
operator call; XLA fuses the expression work into the operator kernels.

Two modes share the same operator code:

* **eager (discovery)** — operator-at-a-time with host row-count syncs, so
  buffer capacities stay tight.  Every data-dependent decision (key ranges,
  join capacities, group counts) is recorded per plan-node path.
* **compiled** — the recorded capacities make every shape static, so the
  whole pipeline traces into ONE jitted XLA program (the "plan fragment =
  one SPMD program" design from SURVEY.md §7).  Warm runs execute with a
  single device dispatch — the Driver loop, quanta scheduling, and page
  passing of the reference collapse into XLA's schedule.

Filter→Aggregate is fused the way the reference fuses ScanFilterAndProject
(``operator/ScanFilterAndProjectOperator.java:64``): the filter never
materialises, it becomes the aggregation mask.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch, round_capacity
from ..expr import ir
from ..expr.eval import bind_string_ops, eval_expr
from ..ops import (
    AggSpec, SortKey, filter_batch, global_aggregate, group_aggregate,
    hash_join, limit_batch, sort_batch,
)
from ..ops.filter import filter_mask
from ..ops.join import cross_join
from ..ops.common import key_ranges
from ..sql.logical import (
    Aggregate, Filter, Join, Limit, LogicalNode, Output, Project, Scan,
    SingleRow, Sort, Union, Unnest, WindowNode,
)

Path = Tuple[int, ...]


def _has_cpu() -> bool:
    try:
        return len(jax.devices("cpu")) > 0
    except RuntimeError:
        return False


class ExecError(Exception):
    pass


class Executor:
    def __init__(self, catalog, compiled: bool = False,
                 record: Optional[Dict[Path, dict]] = None,
                 scan_arrays: Optional[Dict[str, jnp.ndarray]] = None,
                 stats=None, stubs: Optional[Dict[Path, RecordBatch]] = None,
                 memory=None, dynamic_filtering: bool = True,
                 spill_threshold: int = 0, guard_ranges: bool = False):
        self.catalog = catalog
        self.compiled = compiled
        # compiled fragments re-run against DIFFERENT external stub data
        # (worker program cache) must guard every data-derived recorded
        # value: key ranges clip out-of-range keys silently (distinct
        # groups would collide), so emit traced in-range checks that trip
        # the overflow fallback instead
        self.guard_ranges = guard_ranges
        self.record: Dict[Path, dict] = record if record is not None else {}
        self.scan_arrays = scan_arrays
        self.stats = stats
        self.stubs = stubs or {}
        self.memory = memory  # QueryMemoryContext (eager mode accounting)
        self.dynamic_filtering = dynamic_filtering
        # spill: inputs above this byte count run partitioned through host
        # RAM (eager mode only; 0 = disabled)
        self.spill_threshold = spill_threshold
        self.capture_paths: set = set()
        self.captured: Dict[Path, RecordBatch] = {}
        self.overflow_checks: List[jnp.ndarray] = []
        # physical sort-order chains per executed path (exec/ordering.py);
        # derived in eager mode, where they drive the clustered-aggregation
        # and sorted-build decisions recorded for compiled replay
        self.chains: Dict[Path, Optional[list]] = {}

    def _check_capacity(self, total, capacity: int):
        """Compiled mode: record a traced guard that the data still fits
        the discovery-time capacity (silent truncation otherwise)."""
        if self.compiled and not isinstance(total, int):
            self.overflow_checks.append(total <= capacity)

    # ---- helpers

    def _rec(self, path: Path) -> dict:
        return self.record.setdefault(path, {})

    def _dicts(self, batch: RecordBatch) -> Dict[str, np.ndarray]:
        return {
            n: c.dictionary for n, c in batch.columns.items()
            if c.dictionary is not None
        }

    def _bind(self, e: ir.Expr, batch: RecordBatch) -> ir.Expr:
        return bind_string_ops(e, self._dicts(batch))

    def _shrink(self, batch: RecordBatch) -> RecordBatch:
        """Sync the row count to host and re-bucket capacity (eager only)."""
        if self.compiled:
            return batch
        n = int(batch.num_rows) if not isinstance(batch.num_rows, int) else batch.num_rows
        cap = round_capacity(n)
        if cap < batch.capacity():
            cols = {
                name: c.with_data(
                    c.data[:cap],
                    c.validity[:cap] if c.validity is not None else None)
                for name, c in batch.columns.items()
            }
            return RecordBatch(cols, n)
        return RecordBatch(batch.columns, n)

    def _ranges(self, path: Path, key: str, cols, num_rows):
        """Key ranges: computed+recorded in eager mode, replayed compiled."""
        rec = self._rec(path)
        if self.compiled:
            r = rec[key]
            if self.guard_ranges:
                self._guard_range_cols(cols, num_rows, r)
            return r
        r = key_ranges(cols, num_rows)
        if key in rec:  # widen across runs
            r = [(min(a[0], b[0]), max(a[1], b[1]))
                 for a, b in zip(r, rec[key])]
        rec[key] = r
        return r

    def _guard_range_cols(self, cols, num_rows, ranges):
        """Traced checks that live key values fall inside recorded ranges
        (out-of-range keys would CLIP in pack_key_words and collide)."""
        for c, (lo, hi) in zip(cols, ranges):
            n = len(c)
            live = jnp.arange(n) < num_rows
            if c.validity is not None:
                live = live & c.validity
            d = c.data.astype(jnp.int64)
            big = jnp.asarray(np.iinfo(np.int64).max, jnp.int64)
            amin = jnp.min(jnp.where(live, d, big))
            amax = jnp.max(jnp.where(live, d, -big))
            any_live = jnp.any(live)
            self.overflow_checks.append(
                ~any_live | ((amin >= lo) & (amax <= hi)))

    # ---- dispatch

    def execute(self, node: LogicalNode, path: Path = ()) -> RecordBatch:
        if path in self.stubs:  # fragment input boundary
            return self.stubs[path]
        m = getattr(self, f"_x_{type(node).__name__}")
        if self.stats is None or self.compiled:
            out = m(node, path)
            if self.memory is not None and not self.compiled:
                from .memory import batch_bytes

                self.memory.set_bytes(path, batch_bytes(out))
        else:
            import time as _time

            t0 = _time.time()
            out = m(node, path)
            if self.memory is not None:
                from .memory import batch_bytes

                self.memory.set_bytes(path, batch_bytes(out))
            rows = out.num_rows if isinstance(out.num_rows, int) else int(out.num_rows)
            # cumulative wall time (includes children) — rendered as such
            self.stats.record(path, type(node).__name__, "",
                              _time.time() - t0, rows, out.capacity())
        if not self.compiled:
            self.chains[path] = self._derive_chain(node, path)
        if path in self.capture_paths:
            self.captured[path] = out
        return out

    def _derive_chain(self, node: LogicalNode, path: Path):
        """Physical sort order of this node's output (None = unknown).
        Children's chains are already derived (post-order)."""
        from . import ordering as O

        rec = self.record.get(path) or {}
        if rec.get("spilled"):
            return None  # spill partitioning destroyed the input order

        def ch(i: int):
            return self.chains.get(path + (i,))

        if isinstance(node, Scan):
            return O.chain_from_table(self._scan_table(node), node.symbols)
        if isinstance(node, (Filter, Limit)):
            return ch(0)  # stable compaction / prefix keep
        from ..sql.logical import MarkDistinct

        if isinstance(node, MarkDistinct):
            return ch(0)  # markers route back to input order
        if isinstance(node, Unnest):
            return O.restrict_chain(ch(0), node.schema)
        if isinstance(node, Project):
            return O.project_chain(ch(0), node.outputs)
        if isinstance(node, Join):
            # hash-join output is ordered by probe row (prefix-sum
            # expansion / stable compaction); FULL appends the anti part
            if node.kind == "full":
                return None
            c = ch(0)
            if c is None and isinstance(node.left, Filter):
                # probe Filter fused into the join mask: the Filter node
                # never executed, but order flows through unchanged
                c = self.chains.get(path + (0, 0))
            if rec.get("merge_join"):
                # the merge-sort join emits rows in JOIN-KEY order
                # (lexicographic over the packed key columns), with probe
                # order within equal-key runs — a downstream aggregation
                # on the key takes the clustered, sort-free path
                front = []
                for a, b in node.equis:
                    pos = set()
                    if isinstance(a, ir.ColumnRef):
                        pos.add(a.name)
                    if node.kind == "inner" and isinstance(b, ir.ColumnRef):
                        pos.add(b.name)
                    if not pos:
                        front = None
                        break
                    front.append(pos)
                c = None if front is None else front + (c or [])
                return O.restrict_chain(c, node.schema)
            if node.kind == "inner" and node.equis:
                c = O.add_equivalences(c, node.equis)
            return O.restrict_chain(c, node.schema)
        if isinstance(node, Aggregate):
            primary = node.primary or node.group
            if not primary:
                return []
            if rec.get("clustered"):
                base = self.chains.get(path + (0,))
                if base is None:
                    base = self.chains.get(path + (0, 0))
                k = O.covers_prefix_k(base, primary)
                return O.restrict_chain(
                    None if not k else base[:k], node.schema)
            # sorted/dense grouping emits groups in lexicographic primary
            # order (pack_key_words packs the first key most significant)
            return [{s} for s in primary]
        if isinstance(node, Sort):
            out = []
            for e, asc, _nf in node.keys:
                if not (isinstance(e, ir.ColumnRef) and asc):
                    break
                out.append({e.name})
            return out
        if isinstance(node, SingleRow):
            return []
        return None  # Window / Union / DML / unknown

    def _x_Output(self, node: Output, path: Path) -> RecordBatch:
        b = self.execute(node.child, path + (0,))
        cols = {}
        for name, sym in node.names:
            c = b[sym]
            key = name
            i = 1
            while key in cols:
                key = f"{name}_{i}"
                i += 1
            cols[key] = c
        return RecordBatch(cols, b.num_rows)

    def _x_SingleRow(self, node: SingleRow, path: Path) -> RecordBatch:
        from ..types import BIGINT

        return RecordBatch(
            {"__row__": Column(jnp.zeros((128,), jnp.int64), BIGINT)}, 1)

    def _scan_table(self, node: Scan):
        """Resolve the (possibly domain-pruned) table for a scan.  Both
        eager discovery and compiled input collection go through here so
        recorded capacities always match the pruned shapes."""
        table = self.catalog.table(node.table)
        dom = getattr(node, "domain", None)
        if dom is not None and not dom.is_all():
            view = table.pruned(dom)
            if view is not None:
                return view
        return table

    def _x_Scan(self, node: Scan, path: Path) -> RecordBatch:
        table = self._scan_table(node)
        if self.compiled:
            cols = {}
            for c, sym in node.symbols.items():
                src = table.column(c)
                cols[sym] = Column(self.scan_arrays[sym], src.type,
                                   dictionary=src.dictionary)
            return RecordBatch(cols, table.num_rows)
        b = table.batch(list(node.symbols.keys()))
        cols = {node.symbols[c]: col for c, col in b.columns.items()}
        return RecordBatch(cols, b.num_rows)

    def scan_inputs(self, node: LogicalNode) -> Dict[str, jnp.ndarray]:
        """Collect {symbol: device array} for every scan column in the plan
        (the compiled program's inputs)."""
        out: Dict[str, jnp.ndarray] = {}
        if isinstance(node, Scan):
            table = self._scan_table(node)
            for c, sym in node.symbols.items():
                out[sym] = table.column(c).data
        for child in node.children:
            out.update(self.scan_inputs(child))
        return out

    def _x_Filter(self, node: Filter, path: Path) -> RecordBatch:
        child = self.execute(node.child, path + (0,))
        pred = self._bind(node.predicate, child)
        rec = self._rec(path)
        if self.compiled:
            cap = rec["capacity"]
        else:
            cap = child.capacity()
        out = filter_batch(pred, child, capacity=cap)
        self._check_capacity(out.num_rows, cap)
        out = self._shrink(out)
        if not self.compiled:
            rec["capacity"] = max(out.capacity(), rec.get("capacity", 0))
        return out

    def _x_Unnest(self, node: Unnest, path: Path) -> RecordBatch:
        """Array/map expansion (reference ``operator/unnest/``): each
        input row emits one output row per element.  Scatter-free: the
        [n, W] element matrix flattens, parent rows repeat W times, and
        live lanes (lane < length AND parent row live) compact."""
        from ..ops.filter import compact

        child = self.execute(node.child, path + (0,))
        arr = eval_expr(self._bind(node.array, child), child)
        n = child.capacity()
        if int(arr.data.shape[1]) == 0:
            # zero-width element matrix (``array[]`` literal): pad to one
            # lane so the flatten below is well-formed; lengths are all 0,
            # so no lane is live and the unnest emits zero rows
            from dataclasses import replace as _rp

            pad = jnp.zeros((n, 1), arr.data.dtype)
            mv = (jnp.zeros((n, 1), arr.map_values.dtype)
                  if arr.map_values is not None else None)
            arr = _rp(arr, data=pad, map_values=mv)
        w = max(int(arr.data.shape[1]), 1)
        lanes = (jnp.arange(w, dtype=jnp.int32)[None, :]
                 < arr.lengths[:, None])
        row_live = jnp.arange(n, dtype=jnp.int64)[:, None] < child.num_rows
        if arr.validity is not None:
            row_live = row_live & arr.validity[:, None]
        mask2 = (lanes & row_live).reshape(n * w)
        t = node.array.type
        cols = {}
        for name, c in child.columns.items():
            cols[name] = Column(
                jnp.repeat(c.data, w, axis=0), c.type,
                validity=None if c.validity is None
                else jnp.repeat(c.validity, w),
                dictionary=c.dictionary)
        et = t.key if t.kind == "map" else t.element
        cols[node.symbol] = Column(arr.data.reshape(n * w), et,
                                   dictionary=arr.dictionary)
        if t.kind == "map" and node.value_symbol:
            cols[node.value_symbol] = Column(
                arr.map_values.reshape(n * w), t.value,
                dictionary=arr.dictionary)
        flat = RecordBatch(cols, jnp.sum(mask2.astype(jnp.int64)))
        rec = self._rec(path)
        if self.compiled:
            cap = rec["capacity"]
        else:
            cap = n * w
        out = compact(flat, mask2, capacity=cap)
        self._check_capacity(out.num_rows, cap)
        out = self._shrink(out)
        if not self.compiled:
            rec["capacity"] = max(out.capacity(), rec.get("capacity", 0))
        return out

    def _x_MarkDistinct(self, node, path: Path) -> RecordBatch:
        """First-occurrence markers per (group keys, marker keys) combo
        (reference ``operator/MarkDistinctOperator.java``), scatter-free:
        pack the combo into int64 words, sort (words, row index), flag
        word boundaries, and route the flags back through the inverse
        permutation with a second sort keyed on the row index.  Dead rows
        pack to the INT64_MAX sentinel, so they sort past every live row
        and can never steal a first-occurrence from one."""
        from ..ops.common import iota, pack_key_words

        child = self.execute(node.child, path + (0,))
        n = child.capacity()
        cols = dict(child.columns)
        gcols = [child[s] for s in node.group]
        for mi, (msym, keys) in enumerate(node.markers):
            kcols = gcols + [
                eval_expr(self._bind(e, child), child) for e in keys]
            ranges = self._ranges(path, f"ranges{mi}", kcols,
                                  child.num_rows)
            words = pack_key_words(kcols, ranges, child.num_rows)
            srt = jax.lax.sort(
                tuple(words) + (iota(n).astype(jnp.int32),),
                num_keys=len(words))
            perm = srt[len(words)]
            first = None
            for w in srt[:len(words)]:
                d = w != jnp.roll(w, 1)
                first = d if first is None else (first | d)
            first = jnp.where(iota(n) == 0, True, first)
            back = jax.lax.sort((perm, first.astype(jnp.int8)), num_keys=1)
            from ..types import BOOLEAN

            cols[msym] = Column(back[1].astype(bool), BOOLEAN)
        return RecordBatch(cols, child.num_rows)

    def _x_Project(self, node: Project, path: Path) -> RecordBatch:
        child = self.execute(node.child, path + (0,))
        cols: Dict[str, Column] = {}
        for sym, e in node.outputs:
            if isinstance(e, ir.ColumnRef):
                cols[sym] = child[e.name]
            else:
                cols[sym] = eval_expr(self._bind(e, child), child)
        return RecordBatch(cols, child.num_rows)

    def _x_Aggregate(self, node: Aggregate, path: Path) -> RecordBatch:
        # fuse an immediate child Filter into the aggregation mask
        # (but never through a fragment-input stub: the stubbed batch is the
        # filter's OUTPUT, its predicate already applied remotely)
        mask = None
        child_node = node.child
        if isinstance(child_node, Filter) and path + (0,) not in self.stubs:
            below = self.execute(child_node.child, path + (0, 0))
            pred = self._bind(child_node.predicate, below)
            mask = filter_mask(pred, below)
            child = below
        else:
            child = self.execute(child_node, path + (0,))

        if not self.compiled and self.spill_threshold and node.group:
            from .memory import batch_bytes

            if batch_bytes(child) > self.spill_threshold:
                return self._spilled_aggregate(node, path, child, mask)

        aggs = [
            AggSpec(
                a.fn,
                None if a.arg is None
                else eval_expr(self._bind(a.arg, child), child),
                a.symbol, param=a.param,
            )
            for a in node.aggs
        ]
        if not node.group:
            return global_aggregate(aggs, child.num_rows, child.capacity(),
                                    checks=self.overflow_checks,
                                    mask=mask)
        primary = node.primary or node.group
        keys = [(s, child[s]) for s in primary]
        carry = [(s, child[s]) for s in node.group if s not in primary]
        ranges = self._ranges(path, "ranges", [c for _, c in keys],
                              child.num_rows)
        rec = self._rec(path)
        if not self.compiled:
            # clustered grouping: equal keys already adjacent in the input
            # (proved from connector sort metadata via the order chains) —
            # the grouping sort is elided (StreamingAggregation analog).
            # Sticky-false across eager reruns so compiled replay matches.
            from . import ordering as O

            base = self.chains.get(path + (0,))
            if base is None:
                base = self.chains.get(path + (0, 0))
            cl = (mask is None and O.covers_prefix(base, primary))
            rec["clustered"] = rec.get("clustered", True) and cl
        if self.compiled:
            max_groups = rec["max_groups"]
        else:
            # group count can never exceed the product of key-range spans
            # (tight for enum keys: Q1's 3x2 flags -> 128 slots, not 8M)
            span_product = 1
            for lo, hi in ranges:
                span_product *= (hi - lo + 2)
                if span_product > child.num_rows:
                    break
            max_groups = round_capacity(min(child.num_rows, span_product))
        out = group_aggregate(keys, aggs, child.num_rows, ranges, max_groups,
                              mask=mask, carry=carry,
                              checks=self.overflow_checks,
                              clustered=rec.get("clustered", False))
        if self.compiled:
            # compiled replays size every [max_groups] buffer by the
            # DISCOVERED group count, far below the span bound for sparse
            # keys (q18: 1.5M actual vs 6.3M span — every per-group
            # gather/sort was 4x oversized); guard against growth
            self._check_capacity(out.num_rows, max_groups)
        else:
            rec["max_groups"] = max(round_capacity(int(out.num_rows)),
                                    rec.get("max_groups", 0))
        return self._shrink(out)

    def _dynamic_filter(self, lb: RecordBatch, rb: RecordBatch,
                        lkeys, rkeys, probe_mask):
        """Build-side [min, max] key-domain mask over the probe, ANDed
        into the join's probe mask (``server/DynamicFilterService.java:95``
        min/max push-down analog).  Always a MASK, never a standalone
        compaction: masked rows pack to the key sentinel and fall out of
        the compaction the join already pays, so applying the domain
        costs two reductions and a compare — cheaper than any pays-off
        heuristic it previously gated on."""
        eligible = [(lk, rk) for lk, rk in zip(lkeys, rkeys)
                    if not lb[lk].type.is_string]
        if not eligible or not self.dynamic_filtering:
            return probe_mask
        n = lb.capacity()
        mask = jnp.arange(n) < lb.num_rows
        blive_base = jnp.arange(rb.capacity()) < rb.num_rows
        for lk, rk in eligible:
            pc, bc = lb[lk], rb[rk]
            blive = blive_base
            if bc.validity is not None:
                blive = blive & bc.validity
            d = bc.data
            if d.dtype.kind == "f":
                big = jnp.asarray(np.inf, d.dtype)
                p = lb[lk].data
            else:
                d = d.astype(jnp.int64)
                big = jnp.asarray(np.iinfo(np.int64).max, jnp.int64)
                p = pc.data.astype(jnp.int64)
            lo = jnp.min(jnp.where(blive, d, big))
            hi = jnp.max(jnp.where(blive, d, -big))
            pm = (p >= lo) & (p <= hi)
            if pc.validity is not None:
                pm = pm & pc.validity
            mask = mask & pm
        return mask if probe_mask is None else (probe_mask & mask)

    def _x_Join(self, node: Join, path: Path) -> RecordBatch:
        # fuse an immediate probe-side Filter into a join mask (same
        # pattern as Aggregate): the mask packs dead rows to the key
        # sentinel, so the standalone filter-compaction sort and its full
        # payload move disappear — the join's own compaction drops them.
        # inner/semi/anti only (LEFT/FULL emit non-matching probe rows, so
        # rows a below-join filter removed would wrongly resurface).
        probe_mask = None
        if (isinstance(node.left, Filter) and path + (0,) not in self.stubs
                and node.kind in ("inner", "semi", "anti") and node.equis):
            below = self.execute(node.left.child, path + (0, 0))
            probe_mask = filter_mask(
                self._bind(node.left.predicate, below), below)
            left = below
        else:
            left = self.execute(node.left, path + (0,))
        right = self.execute(node.right, path + (1,))
        rec = self._rec(path)

        if (not self.compiled and self.spill_threshold
                and node.kind != "cross" and node.equis):
            from .memory import batch_bytes

            if batch_bytes(left) + batch_bytes(right) > self.spill_threshold:
                if probe_mask is not None:
                    from ..ops.filter import compact

                    left = self._shrink(compact(left, probe_mask))
                    probe_mask = None
                return self._grace_join(node, path, left, right)

        if node.kind == "cross":
            if not self.compiled:
                rec["scalar_build"] = (isinstance(right.num_rows, int)
                                       and right.num_rows == 1) or \
                    int(right.num_rows) == 1
            if rec.get("scalar_build"):
                rn = right.num_rows
                if self.compiled and self.guard_ranges \
                        and not isinstance(rn, int):
                    self.overflow_checks.append(rn == 1)
                right1 = RecordBatch(
                    {n: c.with_data(
                        c.data[:1],
                        c.validity[:1] if c.validity is not None else None)
                     for n, c in right.columns.items()}, 1)
                return cross_join(left, right1, left.capacity())
            if self.compiled:
                cap = rec["capacity"]
            else:
                cap = round_capacity(
                    max(int(left.num_rows) * int(right.num_rows), 1))
                rec["capacity"] = max(cap, rec.get("capacity", 0))
            return self._shrink(cross_join(left, right, cap))

        # materialise key expressions as temp columns
        lkeys, rkeys = [], []
        lb, rb = left, right
        for i, (a, b) in enumerate(node.equis):
            ln, rn = f"__lk{i}", f"__rk{i}"
            lb = RecordBatch({**lb.columns, ln: eval_expr(self._bind(a, left), left)},
                             lb.num_rows)
            rb = RecordBatch({**rb.columns, rn: eval_expr(self._bind(b, right), right)},
                             rb.num_rows)
            lkeys.append(ln)
            rkeys.append(rn)
        if not lkeys:
            raise ExecError(f"join without equi keys: {node.kind}")

        # dynamic filtering (inner/semi only — left/anti keep non-matching
        # probe rows): the build side's key bounds mask the probe before the
        # join ops see it.  Analog of the reference's DynamicFilterService
        # (``server/DynamicFilterService.java:95``, min/max domain push-down)
        # with bounds as traced device values, so compiled replays keep the
        # exact same program shape.
        if node.kind in ("inner", "semi"):
            probe_mask = self._dynamic_filter(lb, rb, lkeys, rkeys,
                                              probe_mask)

        if self.compiled:
            ranges = rec["ranges"]
            if self.guard_ranges:
                self._guard_range_cols([lb[k] for k in lkeys], lb.num_rows,
                                       ranges)
                self._guard_range_cols([rb[k] for k in rkeys], rb.num_rows,
                                       ranges)
        else:
            lr = key_ranges([lb[k] for k in lkeys], lb.num_rows)
            rr = key_ranges([rb[k] for k in rkeys], rb.num_rows)
            ranges = [(min(a[0], b[0]), max(a[1], b[1]))
                      for a, b in zip(lr, rr)]
            if "ranges" in rec:
                ranges = [(min(a[0], b[0]), max(a[1], b[1]))
                          for a, b in zip(ranges, rec["ranges"])]
            rec["ranges"] = ranges

        if not self.compiled:
            # build side already sorted by the join key columns in key
            # order (order chains): the build sort in _probe_ranges is an
            # identity — skip it.  NULLs would break it (null_high packs
            # them to the top), so every build key must be non-nullable.
            from . import ordering as O

            rchain = self.chains.get(path + (1,))
            bs = rchain is not None and len(rchain) >= len(node.equis)
            for i, (_, b) in enumerate(node.equis):
                bs = bs and isinstance(b, ir.ColumnRef) \
                    and rb[rkeys[i]].validity is None \
                    and bool(rchain) and i < len(rchain) \
                    and b.name in rchain[i]
            rec["build_sorted"] = rec.get("build_sorted", True) and bs
        build_sorted = rec.get("build_sorted", False)

        residual = None
        if node.residual is not None:
            merged = RecordBatch({**lb.columns, **rb.columns}, 0)
            residual = self._bind(node.residual, merged)

        from ..ops.join import merge_join_applicable

        if not self.compiled:
            rec["merge_join"] = merge_join_applicable(
                node.kind, ranges, residual,
                node.build_unique if node.kind == "inner" else False)
            # eager capacity guesses start from the FUSED-mask row count:
            # the probe batch itself is unfiltered when a Filter fused in
            rec["probe_rows"] = int(jnp.sum(probe_mask)) \
                if probe_mask is not None else int(lb.num_rows)
        probe_rows = rec.get("probe_rows", 0)

        if node.kind in ("semi", "anti"):
            cap = round_capacity(max(probe_rows, 1)) \
                if not self.compiled else rec["capacity"]
            if residual is not None:
                if self.compiled:
                    out = hash_join(lb, rb, lkeys, rkeys, node.kind, ranges,
                                    rec["pairs_capacity"], residual=residual,
                                    build_sorted=build_sorted,
                                    probe_mask=probe_mask)
                else:
                    cap_pairs = round_capacity(max(probe_rows * 4, 128))
                    while True:
                        stats: Dict[str, object] = {}
                        out = hash_join(lb, rb, lkeys, rkeys, node.kind,
                                        ranges, cap_pairs, residual=residual,
                                        stats=stats,
                                        build_sorted=build_sorted,
                                        probe_mask=probe_mask)
                        pairs_total = int(stats["pairs_total"])  # type: ignore[arg-type]
                        if pairs_total <= cap_pairs:
                            break
                        cap_pairs = round_capacity(pairs_total)
                    rec["pairs_capacity"] = max(
                        cap_pairs, rec.get("pairs_capacity", 0))
            else:
                out = hash_join(lb, rb, lkeys, rkeys, node.kind, ranges, cap,
                                build_sorted=build_sorted,
                                probe_mask=probe_mask)
            if not self.compiled:
                # the merge path's payload moves by GATHER at [capacity]
                # (latency-bound: capacity directly scales the join cost)
                # — record the TIGHT discovered output count, not the
                # probe-sized upper bound; growth trips the traced guard
                tight = round_capacity(max(int(out.num_rows), 1)) \
                    if rec.get("merge_join") else cap
                rec["capacity"] = max(tight, rec.get("capacity", 0))
            self._check_capacity(out.num_rows, cap)
            out = self._drop_temp(out)
            return self._shrink(out)

        if node.kind == "full":
            return self._full_join(node, lb, rb, lkeys, rkeys, ranges,
                                   residual, rec)

        # inner / left
        if self.compiled:
            cap = rec["capacity"]
            stats: Dict[str, object] = {}
            out = hash_join(lb, rb, lkeys, rkeys, node.kind, ranges, cap,
                            residual=residual, stats=stats,
                            build_unique=node.build_unique,
                            build_sorted=build_sorted,
                            probe_mask=probe_mask)
            self._check_capacity(out.num_rows, cap)
            if residual is not None and "pairs_total" in stats:
                # a residual join compacts AFTER expansion: the pair buffer
                # itself must not have overflowed or rows were dropped
                self._check_capacity(stats["pairs_total"], cap)
        else:
            if node.build_unique:
                cap = round_capacity(max(probe_rows, 1))
            else:
                cap = round_capacity(max(probe_rows * 2, 128))
            while True:
                stats = {}
                out = hash_join(lb, rb, lkeys, rkeys, node.kind, ranges, cap,
                                residual=residual, stats=stats,
                                build_unique=node.build_unique,
                                build_sorted=build_sorted,
                                probe_mask=probe_mask)
                total = int(out.num_rows)
                if "pairs_total" in stats:
                    total = max(total, int(stats["pairs_total"]))  # type: ignore[arg-type]
                if total <= cap:
                    break
                cap = round_capacity(total)
            # merge-path inner joins gather payload at [capacity]: record
            # the tight output count (see the semi/anti note above); the
            # classic paths keep the pair-buffer-sized capacity
            tight = round_capacity(max(int(out.num_rows), 1)) \
                if rec.get("merge_join") else cap
            rec["capacity"] = max(tight, rec.get("capacity", 0))
        out = self._drop_temp(out)
        return self._shrink(out)

    def _full_join(self, node, lb, rb, lkeys, rkeys, ranges, residual, rec):
        """FULL OUTER = left-join pairs ++ right rows with no match
        (null-extended on the left side)."""
        from ..batch import concat_batches
        from ..sql.optimizer import _refs, _split_ir_conjuncts

        cross_residual = None
        if residual is not None:
            # single-side ON conjuncts fold into key validity: ineligible
            # rows never match but still emit null-extended (FULL semantics).
            # cross-side conjuncts stay a residual on both directed passes.
            l_schema, r_schema = set(lb.columns), set(rb.columns)
            lo_parts, ro_parts, x_parts = [], [], []
            for c in _split_ir_conjuncts(residual):
                refs = _refs(c)
                if refs <= l_schema and not (refs & {k for k in r_schema}):
                    lo_parts.append(c)
                elif refs <= r_schema:
                    ro_parts.append(c)
                else:
                    x_parts.append(c)
            if x_parts:
                from ..sql.planner import ir_conjoin as _conj
                cross_residual = _conj(x_parts)

            def mask_keys(batch, parts, key_names):
                if not parts:
                    return batch
                from ..sql.planner import ir_conjoin as _conj
                from ..ops.filter import filter_mask

                m = filter_mask(self._bind(_conj(parts), batch), batch)
                cols = dict(batch.columns)
                for kname in key_names:
                    c = cols[kname]
                    v = m if c.validity is None else (c.validity & m)
                    cols[kname] = Column(c.data, c.type, validity=v,
                                         dictionary=c.dictionary)
                return RecordBatch(cols, batch.num_rows)

            lb = mask_keys(lb, lo_parts, lkeys)
            rb = mask_keys(rb, ro_parts, rkeys)
        if self.compiled:
            cap_l = rec["capacity"]
            cap_a = rec["anti_capacity"]
            cap_f = rec["full_capacity"]
        else:
            cap_l = round_capacity(max(int(lb.num_rows) * 2, 128))
            cap_a = round_capacity(max(int(rb.num_rows), 1))
        while True:
            stats: Dict[str, object] = {}
            pairs = hash_join(lb, rb, lkeys, rkeys, "left", ranges, cap_l,
                              residual=cross_residual, stats=stats)
            if self.compiled:
                self._check_capacity(stats["pairs_total"], cap_l)
                break
            total = max(int(pairs.num_rows), int(stats["pairs_total"]))  # type: ignore[arg-type]
            if total <= cap_l:
                break
            cap_l = round_capacity(total)
        if cross_residual is None:
            anti = hash_join(rb, lb, rkeys, lkeys, "anti", ranges, cap_a)
        else:
            # anti with residual expands candidate pairs internally: its
            # buffer must hold the expansion, not just rb's rows
            if self.compiled:
                cap_ap = rec["anti_pairs_capacity"]
                astats: Dict[str, object] = {}
                anti = hash_join(rb, lb, rkeys, lkeys, "anti", ranges,
                                 cap_ap, residual=cross_residual,
                                 stats=astats)
                self._check_capacity(astats["pairs_total"], cap_ap)
            else:
                cap_ap = round_capacity(max(int(rb.num_rows) * 2, 128))
                while True:
                    astats = {}
                    anti = hash_join(rb, lb, rkeys, lkeys, "anti", ranges,
                                     cap_ap, residual=cross_residual,
                                     stats=astats)
                    if int(astats["pairs_total"]) <= cap_ap:  # type: ignore[arg-type]
                        break
                    cap_ap = round_capacity(int(astats["pairs_total"]))  # type: ignore[arg-type]
                rec["anti_pairs_capacity"] = max(
                    cap_ap, rec.get("anti_pairs_capacity", 0))
        # null-extend the left-side columns on the anti part
        ext = dict(anti.columns)
        n_a = anti.capacity()
        for name, c in lb.columns.items():
            if name not in ext:
                ext[name] = Column(
                    jnp.zeros((n_a,) + c.data.shape[1:], c.data.dtype),
                    c.type, validity=jnp.zeros((n_a,), bool),
                    dictionary=c.dictionary)
        anti_full = RecordBatch({k: ext[k] for k in pairs.columns}, anti.num_rows)
        if not self.compiled:
            cap_f = round_capacity(
                max(int(pairs.num_rows) + int(anti.num_rows), 1))
            rec["capacity"] = max(cap_l, rec.get("capacity", 0))
            rec["anti_capacity"] = max(cap_a, rec.get("anti_capacity", 0))
            rec["full_capacity"] = max(cap_f, rec.get("full_capacity", 0))
        out = concat_batches(pairs, anti_full, cap_f)
        return self._shrink(self._drop_temp(out))

    def _grace_join(self, node: Join, path: Path, left: RecordBatch,
                    right: RecordBatch) -> RecordBatch:
        """Grace hash join through host RAM (the HashBuilderOperator
        SPILLING_INPUT path, ``operator/HashBuilderOperator.java:155``,
        re-designed for TPU: spill medium = host RAM over PCIe).

        Both sides hash-partition on the join keys; each partition pair
        joins independently on device with inputs/results parked in host
        RAM, bounding peak HBM to ~1/P of the working set.  Eager
        (discovery) mode only — the compiled path assumes resident inputs.
        """
        from .memory import batch_bytes
        from .spill import (choose_partitions, concat_spilled, spill,
                            spill_partitions, unspill)

        rec = self._rec(path)
        rec["spilled"] = True
        lb, rb = left, right
        lkeys, rkeys = [], []
        for i, (a, b) in enumerate(node.equis):
            ln, rn = f"__lk{i}", f"__rk{i}"
            lb = RecordBatch(
                {**lb.columns, ln: eval_expr(self._bind(a, left), left)},
                lb.num_rows)
            rb = RecordBatch(
                {**rb.columns, rn: eval_expr(self._bind(b, right), right)},
                rb.num_rows)
            lkeys.append(ln)
            rkeys.append(rn)
        if node.kind in ("inner", "semi"):
            # spill mode: apply the domain as a compaction (memory is the
            # constraint here, and compaction shrinks the partitions)
            m = self._dynamic_filter(lb, rb, lkeys, rkeys, None)
            if m is not None and int(jnp.sum(m)) < 0.75 * max(
                    int(lb.num_rows), 1):
                from ..ops.filter import compact

                lb = self._shrink(compact(lb, m))
        lr = key_ranges([lb[k] for k in lkeys], lb.num_rows)
        rr = key_ranges([rb[k] for k in rkeys], rb.num_rows)
        ranges = [(min(a[0], b[0]), max(a[1], b[1]))
                  for a, b in zip(lr, rr)]
        residual = None
        if node.residual is not None:
            merged = RecordBatch({**lb.columns, **rb.columns}, 0)
            residual = self._bind(node.residual, merged)
        total = batch_bytes(lb) + batch_bytes(rb)
        n_parts = choose_partitions(total, self.spill_threshold)
        rec["spill_partitions"] = n_parts
        lparts = spill_partitions(lb, lkeys, ranges, n_parts)
        rparts = spill_partitions(rb, rkeys, ranges, n_parts)
        del lb, rb, left, right  # free device inputs before the loop
        outs = []
        for p, (lp, rp) in enumerate(zip(lparts, rparts)):
            if p > 0:  # partition 0 always runs so the schema exists
                if node.kind == "full":
                    if lp.num_rows == 0 and rp.num_rows == 0:
                        continue
                elif lp.num_rows == 0:
                    continue
                elif rp.num_rows == 0 and node.kind in ("inner", "semi"):
                    continue
            ld, rd = unspill(lp), unspill(rp)
            if node.kind == "full":
                out = self._full_join(node, ld, rd, lkeys, rkeys, ranges,
                                      residual, {})
            elif node.kind in ("semi", "anti"):
                cap = round_capacity(max(int(ld.num_rows), 1))
                if residual is not None:
                    cap_pairs = round_capacity(max(int(ld.num_rows) * 4, 128))
                    while True:
                        st: Dict[str, object] = {}
                        out = hash_join(ld, rd, lkeys, rkeys, node.kind,
                                        ranges, cap_pairs, residual=residual,
                                        stats=st)
                        if int(st["pairs_total"]) <= cap_pairs:  # type: ignore[arg-type]
                            break
                        cap_pairs = round_capacity(int(st["pairs_total"]))  # type: ignore[arg-type]
                else:
                    out = hash_join(ld, rd, lkeys, rkeys, node.kind, ranges,
                                    cap)
                out = self._drop_temp(out)
            else:  # inner / left
                factor = 1 if node.build_unique else 2
                cap = round_capacity(max(int(ld.num_rows) * factor, 128))
                while True:
                    out = hash_join(ld, rd, lkeys, rkeys, node.kind, ranges,
                                    cap, residual=residual,
                                    build_unique=node.build_unique)
                    if int(out.num_rows) <= cap:
                        break
                    cap = round_capacity(int(out.num_rows))
                out = self._drop_temp(out)
            outs.append(spill(self._shrink(out)))
        return self._shrink(unspill(concat_spilled(outs)))

    def _spilled_aggregate(self, node: Aggregate, path: Path,
                           child: RecordBatch, mask) -> RecordBatch:
        """Partitioned aggregation through host RAM (the
        SpillableHashAggregationBuilder analog; partitions double as the
        grouped-execution Lifespan loop — each group-key partition is
        aggregated end-to-end independently, outputs are disjoint)."""
        from .memory import batch_bytes
        from .spill import (choose_partitions, concat_spilled, spill,
                            spill_partitions, unspill)
        from ..ops.filter import compact

        rec = self._rec(path)
        rec["spilled"] = True
        if mask is not None:  # materialise the fused filter before split
            child = self._shrink(compact(child, mask))
        primary = node.primary or node.group
        ranges = key_ranges([child[s] for s in primary], child.num_rows)
        n_parts = choose_partitions(batch_bytes(child), self.spill_threshold)
        rec["spill_partitions"] = n_parts
        parts = spill_partitions(child, primary, ranges, n_parts)
        del child
        outs = []
        for p, part in enumerate(parts):
            if p > 0 and part.num_rows == 0:
                continue
            d = unspill(part)
            aggs = [
                AggSpec(a.fn,
                        None if a.arg is None
                        else eval_expr(self._bind(a.arg, d), d),
                        a.symbol, param=a.param)
                for a in node.aggs
            ]
            keys = [(s, d[s]) for s in primary]
            carry = [(s, d[s]) for s in node.group if s not in primary]
            pr = key_ranges([c for _, c in keys], d.num_rows)
            span = 1
            for lo, hi in pr:
                span *= (hi - lo + 2)
                if span > d.num_rows:
                    break
            mg = round_capacity(max(min(int(d.num_rows), span), 1))
            out = group_aggregate(keys, aggs, d.num_rows, pr, mg, carry=carry,
                                  checks=self.overflow_checks)
            outs.append(spill(self._shrink(out)))
        return self._shrink(unspill(concat_spilled(outs)))

    def _drop_temp(self, b: RecordBatch) -> RecordBatch:
        cols = {n: c for n, c in b.columns.items() if not n.startswith("__")}
        return RecordBatch(cols, b.num_rows)

    def _x_Sort(self, node: Sort, path: Path) -> RecordBatch:
        child = self.execute(node.child, path + (0,))
        keys = [
            SortKey(eval_expr(self._bind(e, child), child), asc, nf)
            for e, asc, nf in node.keys
        ]
        lim = None if node.limit is None else node.limit + node.offset
        out = sort_batch(child, keys, limit=lim)
        if node.offset:
            out = _skip_rows(out, node.offset)
        return self._shrink(out)

    def _x_MergeSorted(self, node, path: Path) -> RecordBatch:
        """Input already globally ordered (the exchange merged per-task
        sorted runs — exec/merge.py); only offset/limit apply here."""
        child = self.execute(node.child, path + (0,))
        if node.offset:
            child = _skip_rows(child, node.offset)
        if node.limit is not None:
            child = limit_batch(child, node.limit)
        return self._shrink(child)

    def _x_WindowNode(self, node: WindowNode, path: Path) -> RecordBatch:
        from ..ops.sort import SortKey
        from ..ops.window import WindowCall as WCall, window

        child = self.execute(node.child, path + (0,))
        pcols = [eval_expr(self._bind(e, child), child)
                 for e in node.partition_by]
        ranges = self._ranges(path, "ranges", pcols, child.num_rows) \
            if pcols else []
        okeys = [SortKey(eval_expr(self._bind(e, child), child), asc, nf)
                 for e, asc, nf in node.order_by]
        calls = [
            WCall(c.fn,
                  None if c.arg is None
                  else eval_expr(self._bind(c.arg, child), child),
                  c.symbol, c.type, frame=c.frame,
                  default=None if c.default is None
                  else eval_expr(self._bind(c.default, child), child),
                  param=c.param)
            for c in node.calls
        ]
        return window(child, pcols, ranges, okeys, calls)

    def _x_Union(self, node: Union, path: Path) -> RecordBatch:
        parts = [self.execute(c, path + (i,))
                 for i, c in enumerate(node.inputs)]
        rec = self._rec(path)
        counts = [p.num_rows for p in parts]
        if self.compiled:
            cap = rec["capacity"]
        else:
            cap = round_capacity(max(sum(int(c) for c in counts), 1))
            rec["capacity"] = max(cap, rec.get("capacity", 0))
        total = counts[0]
        for c in counts[1:]:
            total = total + c
        i = jnp.arange(cap, dtype=jnp.int64)
        cols: Dict[str, Column] = {}
        for sym, t, srcs in node.outputs:
            # merged dictionary for varchar columns (host-side, static per plan)
            dictionary = None
            remaps = [None] * len(parts)
            if t.is_string:
                dicts = [parts[k][srcs[k]].dictionary for k in range(len(parts))]
                dictionary = np.unique(np.concatenate(
                    [d if d is not None and len(d) else np.empty(0, "U1")
                     for d in dicts]))
                for k, d in enumerate(dicts):
                    if d is not None and len(d):
                        remaps[k] = jnp.asarray(
                            np.searchsorted(dictionary, d).astype(np.int32))
            data = None
            validity = None
            offset = 0
            for k, p in enumerate(parts):
                c = p[srcs[k]]
                d = c.data
                if remaps[k] is not None:
                    d = jnp.take(remaps[k], jnp.clip(c.data, 0,
                                                     len(remaps[k]) - 1))
                if t.kind == "double" and d.dtype.kind != "f":
                    d = d.astype(jnp.float64)
                elif t.kind != "double" and d.dtype != np.dtype(t.np_dtype):
                    d = d.astype(np.dtype(t.np_dtype))
                local = i - offset
                sel = (local >= 0) & (local < counts[k])
                g = jnp.take(d, jnp.clip(local, 0, d.shape[0] - 1),
                             mode="clip")
                v = None
                if c.validity is not None:
                    v = jnp.take(c.validity, jnp.clip(local, 0,
                                                      d.shape[0] - 1),
                                 mode="clip")
                if data is None:
                    data = jnp.where(sel, g, jnp.zeros((), g.dtype))
                    validity = v if v is None else (v & sel) | ~sel
                else:
                    data = jnp.where(sel, g, data)
                    if v is not None or validity is not None:
                        va = jnp.ones((cap,), bool) if validity is None else validity
                        vb = jnp.ones((cap,), bool) if v is None else v
                        validity = jnp.where(sel, vb, va)
                offset = offset + counts[k]
            cols[sym] = Column(data, t, validity=validity,
                               dictionary=dictionary)
        self._check_capacity(total, cap)
        return self._shrink(RecordBatch(cols, total))

    def _x_Limit(self, node: Limit, path: Path) -> RecordBatch:
        child = self.execute(node.child, path + (0,))
        if node.offset:
            child = _skip_rows(child, node.offset)
        if node.n is None:
            return self._shrink(child)
        return self._shrink(limit_batch(child, node.n))


def _skip_rows(batch: RecordBatch, offset: int) -> RecordBatch:
    """Drop the first ``offset`` live rows (live rows are a prefix)."""
    cap = batch.capacity()
    off = min(offset, max(cap - 1, 0))  # keep >= 1 slot (num_rows masks)
    cols = {
        name: c.with_data(c.data[off:],
                          c.validity[off:] if c.validity is not None
                          else None)
        for name, c in batch.columns.items()
    }
    n = batch.num_rows
    n = max(n - offset, 0) if isinstance(n, int) \
        else jnp.maximum(n - offset, 0)
    return RecordBatch(cols, n)


def _fragment_roots(node: LogicalNode, path: Path = ()) -> List[Path]:
    """Fragment boundaries: every heavy operator roots its own compiled
    program (the PlanFragmenter analog — reference
    ``sql/planner/PlanFragmenter.java:106`` cuts at exchanges; we cut at
    the operators whose fused modules would grow unboundedly)."""
    from ..sql.logical import (
        Aggregate as _Agg, Join as _Join, Sort as _Sort, Union as _Uni,
        WindowNode as _Win,
    )

    out = [path] if (path == ()
                     or isinstance(node, (_Agg, _Join, _Sort, _Win, _Uni))) \
        else []
    for i, c in enumerate(node.children):
        out += _fragment_roots(c, path + (i,))
    return out


def _node_at(plan: LogicalNode, path: Path) -> LogicalNode:
    node = plan
    for i in path:
        node = node.children[i]
    return node


def _k(path: Path, name: str, kind: str) -> str:
    return f"{'/'.join(map(str, path))}|{name}|{kind}"


class _CpuTableProxy:
    """Table whose columns are CPU-device copies (for CPU-side discovery).

    Must cover the FULL Table surface (``exec/catalog.py:21``): any method
    `_scan_table`/discovery calls lands here when the default backend is an
    accelerator, a path no CPU-only test exercises naturally.  Unknown
    attributes delegate to the wrapped table so future Table methods can't
    silently break the TPU path again (round-2 regression: missing
    ``pruned`` crashed every compiled filtered query on hardware)."""

    def __init__(self, table, cpu_dev):
        self._table = table
        self._cpu = cpu_dev
        self._cache: Dict[str, Column] = {}
        self._pruned: Dict[object, Optional["_CpuTableProxy"]] = {}
        self.num_rows = table.num_rows
        self.schema = table.schema

    def __getattr__(self, name):
        # fallback for everything not overridden (unique_keys,
        # column_order, column_range, connector-specific metadata, ...)
        return getattr(self._table, name)

    def column(self, name: str) -> Column:
        if name not in self._cache:
            c = self._table.host_column(name)  # host load, no device pull
            self._cache[name] = Column(
                jax.device_put(np.asarray(c.data), self._cpu), c.type,
                validity=None if c.validity is None
                else jax.device_put(np.asarray(c.validity), self._cpu),
                dictionary=c.dictionary)
        return self._cache[name]

    def batch(self, columns=None):
        cols = columns if columns is not None else list(self.schema)
        return RecordBatch({c: self.column(c) for c in cols}, self.num_rows)

    def pruned(self, domain):
        """Prune through the real table, then wrap the view so discovery
        keeps reading CPU copies (shapes match the real pruned scan)."""
        key = domain.fingerprint() if domain is not None else None
        if key not in self._pruned:
            view = self._table.pruned(domain)
            self._pruned[key] = None if view is None \
                else _CpuTableProxy(view, self._cpu)
        return self._pruned[key]


class _CpuCatalogProxy:
    def __init__(self, catalog, cpu_dev):
        self._catalog = catalog
        self._cpu = cpu_dev
        self._tables: Dict[str, _CpuTableProxy] = {}

    def table(self, name: str):
        if name not in self._tables:
            self._tables[name] = _CpuTableProxy(
                self._catalog.table(name), self._cpu)
        return self._tables[name]

    def __contains__(self, name):
        return name in self._catalog


class CompiledQuery:
    """A query pipeline compiled into a handful of XLA programs.

    The plan is cut into fragments at heavy-operator boundaries
    (_fragment_roots); each fragment traces into one jitted program, and
    fragments chain on-device (counts stay device scalars, no host syncs
    between them).  granularity='single' fuses the whole pipeline into one
    program instead — maximal fusion, but very large modules can outgrow
    the TPU compiler.
    """

    def __init__(self, catalog, plan: LogicalNode,
                 granularity: str = "fragment",
                 stubs: Optional[Dict[Path, RecordBatch]] = None,
                 sample: Optional[Dict[str, int]] = None,
                 sample_margin: Optional[float] = None):
        """``stubs`` makes this a compiled FRAGMENT: the given paths are
        external inputs (remote-exchange sources on a worker) whose
        batches are supplied per run via ``__call__(stubs=...)``.  Shapes
        and dictionaries must match the discovery-time batches — the
        worker's program cache keys on exactly that signature.

        ``sample`` ({table: k}) runs discovery on a 1/k PREFIX of the
        named tables and extrapolates the recorded capacities/ranges
        (``exec/sampling.py``) — sublinear discovery for SF10+ where the
        eager full-data replay was the scalability wall.  Sampled
        programs run fully guarded: growth past any extrapolated value
        raises ExecError instead of silently truncating."""
        self.catalog = catalog
        self.plan = plan
        self.external = dict(stubs or {})
        self.sample = dict(sample) if sample else None

        roots = sorted(set(_fragment_roots(plan)), key=len, reverse=True) \
            if granularity == "fragment" else [()]
        # external stub paths act as extra fragment boundaries: they are
        # never executed, their data arrives as runtime inputs
        roots = [r for r in roots
                 if not any(r[:len(p)] == p for p in self.external)]
        # discovery (capacity/range recording) runs on CPU when the default
        # backend is an accelerator: the recorded values are data-dependent,
        # not device-dependent, and CPU compiles are ~100x faster
        from ..ops.common import backend_override

        disc_base = catalog
        if self.sample:
            from .sampling import sampled_catalog_view

            disc_base = sampled_catalog_view(catalog, self.sample)
        cpu_devs = [d for d in jax.devices("cpu")] if _has_cpu() else []
        if jax.default_backend() != "cpu" and cpu_devs:
            disc_catalog = _CpuCatalogProxy(disc_base, cpu_devs[0])
            with backend_override("cpu"), jax.default_device(cpu_devs[0]):
                discoverer = Executor(disc_catalog, stubs=self.external)
                discoverer.capture_paths = set(roots)
                discoverer.execute(plan)
        else:
            discoverer = Executor(disc_base, stubs=self.external)
            discoverer.capture_paths = set(roots)
            discoverer.execute(plan)
        self.record = discoverer.record
        if self.sample:
            from .sampling import DEFAULT_MARGIN, rewrite_record

            rewrite_record(plan, self.record, self.sample, catalog,
                           margin=sample_margin or DEFAULT_MARGIN)
        # fragment-boundary capacities from discovery: a selective
        # operator's compiled output otherwise keeps its INPUT-sized
        # buffers (no _shrink under jit), and every downstream fragment
        # pays the oversize — q9's partsupp join ran 6.29M-capacity
        # sorts/gathers over 327k live rows (16x) until outputs were
        # sliced to the discovered boundary size here
        self._caps = {r: discoverer.captured[r].capacity() for r in roots}
        if self.sample:
            from .sampling import DEFAULT_MARGIN, scaled_boundary_caps

            self._caps = scaled_boundary_caps(
                plan, self._caps, self.sample,
                margin=sample_margin or DEFAULT_MARGIN)
        # scan inputs must come from the REAL catalog (default-device
        # arrays), never the CPU discovery proxy: proxy arrays are
        # host-committed, and feeding them to the compiled program would
        # re-transfer every scan column to the device on EVERY run
        # (measured: SF1 Q1 69ms -> 13s through the device tunnel).
        self.inputs = Executor(catalog).scan_inputs(plan)
        self._meta: Dict[Path, list] = {}
        for r in roots:
            b = discoverer.captured[r]
            self._meta[r] = [
                (n, c.type, c.dictionary, c.validity is not None)
                for n, c in b.columns.items()
            ]
        for p, b in self.external.items():
            self._meta[p] = [
                (n, c.type, c.dictionary, c.validity is not None)
                for n, c in b.columns.items()
            ]

        # child fragments of each root = roots (or external inputs) whose
        # longest proper prefix root is this one
        def parent_root(r: Path):
            for plen in range(len(r) - 1, -1, -1):
                if r[:plen] in self._meta and r[:plen] != r \
                        and r[:plen] not in self.external:
                    return r[:plen]
            return None

        children: Dict[Path, List[Path]] = {r: [] for r in roots}
        for r in list(roots) + list(self.external):
            p = parent_root(r)
            if p is not None:
                children[p].append(r)

        self._aot = None  # root -> AOT executable (precompile())
        self._stages = []
        for root in roots:  # deepest-first (sorted by len desc)
            node = _node_at(plan, root)
            child_roots = children[root]
            meta = self._meta

            def make_fn(root, node, child_roots):
                def fn(scan_arrays, frag_inputs):
                    stubs = {}
                    for cr in child_roots:
                        cols = {}
                        for (nm, t, dic, has_v) in meta[cr]:
                            cols[nm] = Column(
                                frag_inputs[_k(cr, nm, "d")], t,
                                validity=frag_inputs.get(_k(cr, nm, "v")),
                                dictionary=dic)
                        stubs[cr] = RecordBatch(
                            cols, frag_inputs[_k(cr, "", "n")])
                    ex = Executor(self.catalog, compiled=True,
                                  record=self.record,
                                  scan_arrays=scan_arrays, stubs=stubs,
                                  guard_ranges=bool(self.external)
                                  or bool(self.sample))
                    out = ex.execute(node, path=root)
                    # fragment-boundary shrink to the discovered capacity
                    # (live rows are a prefix); growth past it trips the
                    # overflow guard instead of silently truncating
                    cap = self._caps[root]
                    if cap < out.capacity():
                        ex.overflow_checks.append(out.num_rows <= cap)
                        cols = {
                            n: c.with_data(
                                c.data[:cap],
                                c.validity[:cap]
                                if c.validity is not None else None)
                            for n, c in out.columns.items()
                        }
                        for n, c in out.columns.items():
                            if c.lengths is not None:
                                from dataclasses import replace as _rp

                                cols[n] = _rp(
                                    cols[n], lengths=c.lengths[:cap],
                                    map_values=None
                                    if c.map_values is None
                                    else c.map_values[:cap])
                        out = RecordBatch(cols, out.num_rows)
                    data = {n: c.data for n, c in out.columns.items()}
                    validity = {n: c.validity
                                for n, c in out.columns.items()
                                if c.validity is not None}
                    ok = jnp.asarray(True)
                    for chk in ex.overflow_checks:
                        ok = ok & chk
                    return data, validity, out.num_rows, ok

                return fn

            self._stages.append(
                (root, child_roots, jax.jit(make_fn(root, node, child_roots))))

    def _external_tuples(self, stubs: Optional[Dict[Path, RecordBatch]]):
        """Runtime stub batches -> (data, validity, n, ok) result tuples.
        Shapes/dtypes must match the discovery batches (program inputs)."""
        out: Dict[Path, tuple] = {}
        for p in self.external:
            b = (stubs or {}).get(p, self.external[p])
            data = {n: c.data for n, c in b.columns.items()}
            validity = {n: c.validity for n, c in b.columns.items()
                        if c.validity is not None}
            n = b.num_rows
            if isinstance(n, int):
                n = jnp.asarray(n, jnp.int64)  # avoid per-count retraces
            out[p] = (data, validity, n, jnp.asarray(True))
        return out

    def precompile(self, max_workers: Optional[int] = None) -> None:
        """AOT-compile every fragment program CONCURRENTLY.

        The v5e AOT compiler charges a large, size-independent cost per
        program (measured round 5: 44-312 s per fragment for 150-600
        line HLO modules — q10's cold wall was the SUM, 612 s, of six
        such compiles).  Fragments are independent programs, so the fix
        is structural: thread each stage's output shapes into its
        consumer with ``jax.eval_shape`` (no stage must RUN before the
        next can lower), lower everything up front (~0.2 s each), and
        compile on a thread pool — cold wall becomes ~max(fragment)
        instead of sum.  The reference's per-task codegen is similarly
        bounded per expression (``sql/gen/PageFunctionCompiler`` caches).

        Falls back silently to lazy per-stage compilation on any error
        (``P1_PARALLEL_COMPILE=0`` disables).
        """
        import concurrent.futures as cf

        if self._aot:
            return
        self._aot = {}
        if os.environ.get("P1_PARALLEL_COMPILE", "1") == "0" \
                or len(self._stages) <= 1:
            return
        try:
            def _struct(x):
                a = jnp.asarray(x) if not hasattr(x, "shape") else x
                return jax.ShapeDtypeStruct(a.shape, a.dtype)

            results: Dict[Path, tuple] = {}
            if self.external:
                for p, tup in self._external_tuples(None).items():
                    results[p] = jax.tree_util.tree_map(_struct, tup)
            lowered = []
            for root, child_roots, jfn in self._stages:
                frag_inputs = {}
                for cr in child_roots:
                    data, validity, n, _ = results[cr]
                    for nm, _t, _d, _hv in self._meta[cr]:
                        frag_inputs[_k(cr, nm, "d")] = data[nm]
                        if nm in validity:
                            frag_inputs[_k(cr, nm, "v")] = validity[nm]
                    frag_inputs[_k(cr, "", "n")] = n
                results[root] = jax.eval_shape(jfn, self.inputs,
                                               frag_inputs)
                lowered.append((root, jfn.lower(self.inputs, frag_inputs)))
            workers = max_workers or int(
                os.environ.get("P1_COMPILE_WORKERS", "4"))
            with cf.ThreadPoolExecutor(max_workers=workers) as pool:
                futs = [(root, pool.submit(low.compile))
                        for root, low in lowered]
                for root, fut in futs:
                    self._aot[root] = fut.result()
        except Exception:  # noqa: BLE001 — lazy path still works
            self._aot = {}

    def _run(self, ext: Optional[Dict[Path, tuple]] = None):
        if self._aot is None:
            self.precompile()
        results: Dict[Path, tuple] = dict(ext or {})
        oks = []
        for root, child_roots, jfn in self._stages:
            jfn = (self._aot or {}).get(root, jfn)
            frag_inputs = {}
            for cr in child_roots:
                data, validity, n, _ = results[cr]
                for nm, _, _, _ in self._meta[cr]:
                    frag_inputs[_k(cr, nm, "d")] = data[nm]
                    if nm in validity:
                        frag_inputs[_k(cr, nm, "v")] = validity[nm]
                frag_inputs[_k(cr, "", "n")] = n
                # each fragment output has exactly one consumer — free the
                # HBM buffers as soon as they are wired in (holding every
                # intermediate alive thrashes device memory at SF10+)
                del results[cr]
            out = jfn(self.inputs, frag_inputs)
            del frag_inputs
            results[root] = out
            oks.append(out[3])
        data, validity, num_rows, _ = results[()]
        return data, validity, num_rows, oks

    def __call__(self, stubs: Optional[Dict[Path, RecordBatch]] = None
                 ) -> RecordBatch:
        data, validity, num_rows, oks = self._run(
            self._external_tuples(stubs) if self.external else None)
        if not all(bool(o) for o in oks):
            raise ExecError(
                "compiled-plan buffer overflow: data outgrew the "
                "discovery-time capacities — re-run Engine.compile()")
        cols = {
            nm: Column(data[nm], t, validity=validity.get(nm), dictionary=dic)
            for (nm, t, dic, _) in self._meta[()]
        }
        n = int(num_rows) if not isinstance(num_rows, int) else num_rows
        return RecordBatch(cols, n)

    def profile(self, reps: int = 5,
                stubs: Optional[Dict[Path, RecordBatch]] = None):
        """Per-fragment operator attribution ON the compiled path.

        The fragment boundary is the natural operator here (one jitted
        program per heavy operator — the OperatorStats analog,
        ``operator/OperatorStats.java``): each fragment re-dispatches
        ``reps`` times behind its own scalar-readback barrier, so the
        reported wall is that fragment's steady-state device time (the
        same methodology as hand xplane captures; through a remote
        tunnel never trust reps < 5).  Returns
        ``[(root_path, wall_s, rows, out_bytes), ...]`` in execution
        order.  Holds every fragment output alive for the walk — a
        profiling call, not a production run."""
        import time as _time

        results: Dict[Path, tuple] = dict(
            self._external_tuples(stubs) if self.external else {})
        out_stats = []
        for root, child_roots, jfn in self._stages:
            frag_inputs = {}
            for cr in child_roots:
                data, validity, n, _ = results[cr]
                for nm, _t, _d, _hv in self._meta[cr]:
                    frag_inputs[_k(cr, nm, "d")] = data[nm]
                    if nm in validity:
                        frag_inputs[_k(cr, nm, "v")] = validity[nm]
                frag_inputs[_k(cr, "", "n")] = n
            out = jfn(self.inputs, frag_inputs)
            jax.block_until_ready(out[0])
            rows = int(out[2])
            t0 = _time.time()
            for _ in range(reps):
                out = jfn(self.inputs, frag_inputs)
            jax.block_until_ready(out[0])
            rows = int(out[2])
            wall = (_time.time() - t0) / reps
            nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                         for a in out[0].values())
            out_stats.append((root, wall, rows, nbytes))
            results[root] = out
        return out_stats

    def block_run(self, reps: int = 1):
        """Execute ``reps`` times and block until complete (benchmarking).

        Forces a host readback of the row count: through remote-device
        tunnels `block_until_ready` can return before execution, so a
        scalar fetch is the only reliable completion barrier.  With
        ``reps > 1`` the runs are dispatched back-to-back and a single
        barrier closes the batch — steady-state throughput measurement
        that amortises the tunnel round-trip (~20-25 ms) across runs."""
        for _ in range(reps):
            data, validity, num_rows, oks = self._run()
        jax.block_until_ready(data)
        if not all(bool(o) for o in oks):
            raise ExecError(
                "compiled-plan buffer overflow: data outgrew the "
                "discovery-time capacities — re-run Engine.compile()")
        if not isinstance(num_rows, int):
            num_rows = int(num_rows)
        return num_rows
