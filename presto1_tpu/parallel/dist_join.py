"""Distributed equi-join: hash repartition both sides over ICI, join
locally per shard.

The FIXED_HASH_DISTRIBUTION partitioned join of the reference
(``DetermineJoinDistributionType`` → ``PartitionedOutputOperator`` shuffle →
per-worker ``PagesHash`` build/probe): rows of both inputs are routed by
key hash with one ``all_to_all`` collective each, then every shard runs the
same sorted-build/searchsorted-probe join the single-chip engine uses, on
its co-partitioned slice.  Multi-column and string (dictionary-coded) keys
ride the same path: the key columns are bit-packed into one routing word
(``ops/common.pack_key_words``; >63-bit composites use the 62-bit mix whose
collisions only cost routing balance, never correctness — the local join
re-verifies real keys).  Quotas and capacities come from the discovery
pass (exact histograms on the host — the planner's stats job).

Broadcast distribution (``FIXED_BROADCAST`` / BroadcastOutputBuffer in the
reference) is ``broadcast_hash_join``: the small build side is replicated,
only the probe side is row-sharded, and no collective moves data at all.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import Column, RecordBatch, round_capacity
from ..ops.common import mix_key_word, pack_key_words
from ..ops.join import hash_join
from .exchange import all_to_all_by_key, partition_of


class JoinCapacityError(RuntimeError):
    """A shard's join output exceeded local_capacity; retry with
    ``needed`` (the true max per-shard row count)."""

    def __init__(self, needed: int):
        super().__init__(f"per-shard join output needs capacity {needed}")
        self.needed = needed


def _shard(mesh, axis, data, pad, fill=0):
    if pad:
        data = jnp.concatenate(
            [data, jnp.full((pad,) + data.shape[1:], fill, data.dtype)])
    return jax.device_put(data, NamedSharding(mesh, P(axis)))


def route_word(batch: RecordBatch, key_names: Sequence[str], ranges,
               num_rows) -> jnp.ndarray:
    """One int64 routing word per row: the packed composite key (or its
    62-bit mix when too wide).  Equal keys always map to equal words."""
    cols = [batch[k] for k in key_names]
    widths = 0
    for lo_, hi_ in ranges:
        widths += max(int(hi_ - lo_ + 2).bit_length(), 1)
    if widths <= 63:
        return pack_key_words(cols, ranges, num_rows)[0]
    return mix_key_word(cols, ranges, num_rows)


def prep_shard_rows(cap: int, n_dev: int) -> int:
    """Rows per shard EXACTLY as ``_prep`` lays them out (padded to a
    multiple of ``n_dev*128``).  Quota histograms must use this same
    boundary: an unpadded ``cap // n_dev`` drifts from the real layout,
    and with KEY-CLUSTERED inputs (merge-join outputs are sorted by key)
    the drift concentrates whole runs into the wrong source bucket —
    observed as a 16-row exchange overflow on mesh q5."""
    pad = (-cap) % (n_dev * 128)
    return max((cap + pad) // n_dev, 1)


def exchange_quota(word_host: np.ndarray, n_rows: int, n_dev: int,
                   shard_rows: int) -> int:
    """Exact max rows any shard sends to any destination (discovery-time
    histogram — the stats the reference's planner gets from connectors)."""
    h = (word_host[:n_rows].astype(np.int64)
         * np.uint64(0x9E3779B97F4A7C15).astype(np.int64)) >> 33
    dest = (h % n_dev).astype(np.int64)
    src = np.arange(n_rows) // shard_rows
    counts = np.zeros((n_dev + 1, n_dev), np.int64)
    np.add.at(counts, (src, dest), 1)
    return int(counts.max())


def _prep(mesh, axis, batch: RecordBatch, n_dev: int):
    cap = batch.capacity()
    pad = (-cap) % (n_dev * 128)
    arrays = {}
    vnames = []
    for name, c in batch.columns.items():
        arrays[name] = _shard(mesh, axis, c.data, pad)
        if c.validity is not None:
            vnames.append(name)
            arrays["__v_" + name] = _shard(mesh, axis, c.validity, pad,
                                           fill=False)
    meta = {name: (c.type, c.dictionary)
            for name, c in batch.columns.items()}
    return arrays, meta, vnames, (cap + pad) // n_dev


def _rebuild(arrays, meta, vnames, extra_mask, num_rows):
    """Columns back from the wire arrays; dead rows masked via validity on
    every column is unnecessary — join key sentinels handle liveness."""
    cols = {}
    for name, (t, dic) in meta.items():
        v = arrays.get("__v_" + name)
        if name in vnames and extra_mask is not None and v is not None:
            v = v & extra_mask
        cols[name] = Column(arrays[name], t, validity=v, dictionary=dic)
    return RecordBatch(cols, num_rows)


def distributed_hash_join(
    mesh: Mesh,
    probe: RecordBatch,
    build: RecordBatch,
    probe_keys: Sequence[str],
    build_keys: Sequence[str],
    kind: str,
    ranges,
    quotas: Tuple[int, int],
    local_capacity: int,
    residual=None,
    build_unique: bool = False,
    axis: str = "d",
) -> RecordBatch:
    """Join two full-table batches by repartitioning over the mesh.

    Output is the concatenation of per-shard join results (padded +
    per-shard counts), compacted on the caller side by ``RecordBatch``
    row-count semantics.  Any equi-key arity/type, LEFT/FULL/SEMI/ANTI,
    residual predicates and the N:1 fast path all delegate to the local
    ``ops.join.hash_join`` per shard.
    """
    n_dev = len(mesh.devices.flat)
    pq, bq = quotas

    parr, pmeta, pvn, p_shard_rows = _prep(mesh, axis, probe, n_dev)
    barr, bmeta, bvn, b_shard_rows = _prep(mesh, axis, build, n_dev)
    p_rows = probe.num_rows
    b_rows = build.num_rows

    def step(pa: Dict[str, jnp.ndarray], ba: Dict[str, jnp.ndarray]):
        me = jax.lax.axis_index(axis)
        p_valid = jnp.clip(p_rows - me * p_shard_rows, 0, p_shard_rows)
        b_valid = jnp.clip(b_rows - me * b_shard_rows, 0, b_shard_rows)

        def local_word(arrs, meta, vnames, keys, nrows):
            cols = {k: Column(arrs[k], meta[k][0],
                              validity=arrs.get("__v_" + k),
                              dictionary=meta[k][1]) for k in keys}
            b = RecordBatch(cols, nrows)
            return route_word(b, keys, ranges, nrows)

        pword = local_word(pa, pmeta, pvn, list(probe_keys), p_valid)
        bword = local_word(ba, bmeta, bvn, list(build_keys), b_valid)
        precv, _pk, pmask, pdrop = all_to_all_by_key(
            pa, pword, p_valid, axis, pq)
        brecv, _bk, bmask, bdrop = all_to_all_by_key(
            ba, bword, b_valid, axis, bq)

        # compact received rows to the front so num_rows semantics hold
        def compacted(arrays, mask, meta, vnames):
            order = jnp.argsort(~mask, stable=True)
            arrays = {k: jnp.take(v, order, axis=0)
                      for k, v in arrays.items()}
            n = jnp.sum(mask.astype(jnp.int64))
            return _rebuild(arrays, meta, vnames,
                            jnp.take(mask, order), n)

        pb = compacted(precv, pmask, pmeta, pvn)
        bb = compacted(brecv, bmask, bmeta, bvn)
        out = hash_join(pb, bb, list(probe_keys), list(build_keys), kind,
                        ranges, local_capacity, residual=residual,
                        build_unique=build_unique)
        res = {name: c.data for name, c in out.columns.items()}
        vres = {name: c.validity for name, c in out.columns.items()
                if c.validity is not None}
        nr = out.num_rows
        return res, vres, jnp.reshape(nr, (1,)), jnp.reshape(pdrop + bdrop,
                                                             (1,))

    from .distributed import (arrays_signature, cached_program,
                              mesh_signature, residual_signature)

    sig = ("dist_join", mesh_signature(mesh), axis, kind,
           tuple(probe_keys), tuple(build_keys), tuple(map(tuple, ranges)),
           quotas, local_capacity, build_unique,
           residual_signature(residual), int(p_rows), int(b_rows),
           arrays_signature(parr), arrays_signature(barr),
           tuple((n, str(t)) for n, (t, _) in sorted(pmeta.items())),
           tuple((n, str(t)) for n, (t, _) in sorted(bmeta.items())))

    def build():
        return jax.jit(shard_map(
            step, mesh=mesh,
            in_specs=(dict.fromkeys(parr, P(axis)),
                      dict.fromkeys(barr, P(axis))),
            out_specs=P(axis),
        ))

    data, validity, counts, dropped = cached_program(sig, build)(parr, barr)
    # barrier: two collective programs in flight can interleave their
    # rendezvous on the shared device threads and deadlock (observed on
    # the 8-device CPU mesh) — finish this stage before anything else
    jax.block_until_ready((data, validity, counts, dropped))
    total_dropped = int(jnp.sum(dropped))
    if total_dropped:
        raise RuntimeError(
            f"exchange overflow: {total_dropped} rows exceeded the "
            f"src->dst quotas {quotas} — the discovery histogram under-"
            f"sized the shuffle (skewed keys?); re-run with larger quotas")
    return _stitch(data, validity, counts, pmeta, bmeta, kind,
                   local_capacity, n_dev)


def broadcast_hash_join(
    mesh: Mesh,
    probe: RecordBatch,
    build: RecordBatch,
    probe_keys: Sequence[str],
    build_keys: Sequence[str],
    kind: str,
    ranges,
    local_capacity: int,
    residual=None,
    build_unique: bool = False,
    axis: str = "d",
) -> RecordBatch:
    """Replicated-build join: no collective at all — the build side is
    broadcast (FIXED_BROADCAST_DISTRIBUTION), the probe stays row-sharded,
    each shard joins its slice.  Valid for inner/left/semi/anti (every
    probe row lives on exactly one shard); FULL OUTER must repartition."""
    if kind == "full":
        raise ValueError("broadcast join cannot emit build-side unmatched "
                         "rows exactly once; use distributed_hash_join")
    n_dev = len(mesh.devices.flat)
    parr, pmeta, pvn, p_shard_rows = _prep(mesh, axis, probe, n_dev)
    p_rows = probe.num_rows

    bcols = {}
    for name, c in build.columns.items():
        bcols[name] = jax.device_put(c.data, NamedSharding(mesh, P()))
        if c.validity is not None:
            bcols["__v_" + name] = jax.device_put(
                c.validity, NamedSharding(mesh, P()))
    bmeta = {name: (c.type, c.dictionary)
             for name, c in build.columns.items()}
    bvn = [n for n, c in build.columns.items() if c.validity is not None]
    b_rows = build.num_rows

    def step(pa, ba):
        me = jax.lax.axis_index(axis)
        p_valid = jnp.clip(p_rows - me * p_shard_rows, 0, p_shard_rows)
        pb = _rebuild(pa, pmeta, pvn, None, p_valid)
        bb = _rebuild(ba, bmeta, bvn, None, b_rows)
        out = hash_join(pb, bb, list(probe_keys), list(build_keys), kind,
                        ranges, local_capacity, residual=residual,
                        build_unique=build_unique)
        res = {name: c.data for name, c in out.columns.items()}
        vres = {name: c.validity for name, c in out.columns.items()
                if c.validity is not None}
        return res, vres, jnp.reshape(out.num_rows, (1,))

    from .distributed import (arrays_signature, cached_program,
                              mesh_signature, residual_signature)

    sig = ("bcast_join", mesh_signature(mesh), axis, kind,
           tuple(probe_keys), tuple(build_keys), tuple(map(tuple, ranges)),
           local_capacity, build_unique, residual_signature(residual),
           int(p_rows), int(b_rows),
           arrays_signature(parr), arrays_signature(bcols),
           tuple((n, str(t)) for n, (t, _) in sorted(pmeta.items())),
           tuple((n, str(t)) for n, (t, _) in sorted(bmeta.items())))

    def build():
        return jax.jit(shard_map(
            step, mesh=mesh,
            in_specs=(dict.fromkeys(parr, P(axis)),
                      dict.fromkeys(bcols, P())),
            out_specs=P(axis),
        ))

    data, validity, counts = cached_program(sig, build)(parr, bcols)
    jax.block_until_ready((data, validity, counts))
    return _stitch(data, validity, counts, pmeta, bmeta, kind,
                   local_capacity, n_dev)


def _stitch(data, validity, counts, pmeta, bmeta, kind, local_capacity,
            n_dev) -> RecordBatch:
    """Concatenate per-shard join outputs: rows of shard s live at
    [s*local_capacity, s*local_capacity + counts[s]); compact with index
    arithmetic."""
    mx = int(jnp.max(counts))
    if mx > local_capacity:
        # a shard overflowed its static output buffer — the analog of the
        # compiled executor's capacity re-discovery loop
        raise JoinCapacityError(mx)
    total_cap = n_dev * local_capacity
    offsets = jnp.cumsum(counts)
    total = offsets[-1]
    i = jnp.arange(total_cap, dtype=jnp.int64)
    shard_of = jnp.searchsorted(offsets, i, side="right")
    shard_of = jnp.clip(shard_of, 0, n_dev - 1)
    within = i - (offsets[shard_of] - counts[shard_of])
    src = shard_of * local_capacity + jnp.clip(within, 0, local_capacity - 1)

    meta = {}
    meta.update(pmeta)
    meta.update(bmeta)
    cols = {}
    for name in data.keys():
        t, dic = (pmeta.get(name) or bmeta.get(name))
        d = jnp.take(data[name], src, mode="clip")
        v = None
        if name in validity:
            v = jnp.take(validity[name], src, mode="clip")
        cols[name] = Column(d, t, validity=v, dictionary=dic)
    return RecordBatch(cols, total)
