"""Distributed equi-join: hash repartition both sides over ICI, join
locally per shard.

The FIXED_HASH_DISTRIBUTION partitioned join of the reference
(``DetermineJoinDistributionType`` → ``PartitionedOutputOperator`` shuffle →
per-worker ``PagesHash`` build/probe): rows of both inputs are routed by
key hash with one ``all_to_all`` collective each, then every shard runs the
same sorted-build/searchsorted-probe join the single-chip engine uses, on
its co-partitioned slice.  Quotas and capacities come from the discovery
pass (exact histograms on the host — the planner's stats job).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import Column, RecordBatch, round_capacity
from ..ops.join import hash_join
from .exchange import all_to_all_by_key, partition_of


def _shard(mesh, axis, data, pad, fill=0):
    if pad:
        data = jnp.concatenate(
            [data, jnp.full((pad,) + data.shape[1:], fill, data.dtype)])
    return jax.device_put(data, NamedSharding(mesh, P(axis)))


def exchange_quota(key_host: np.ndarray, n_rows: int, n_dev: int,
                   shard_rows: int) -> int:
    """Exact max rows any shard sends to any destination (discovery-time
    histogram — the stats the reference's planner gets from connectors)."""
    h = (key_host[:n_rows].astype(np.int64)
         * np.uint64(0x9E3779B97F4A7C15).astype(np.int64)) >> 33
    dest = (h % n_dev).astype(np.int64)
    src = np.arange(n_rows) // shard_rows
    counts = np.zeros((n_dev + 1, n_dev), np.int64)
    np.add.at(counts, (src, dest), 1)
    return int(counts.max())


def distributed_hash_join(
    mesh: Mesh,
    probe: RecordBatch,
    build: RecordBatch,
    probe_key: str,
    build_key: str,
    kind: str,
    ranges,
    quotas: Tuple[int, int],
    local_capacity: int,
    axis: str = "d",
) -> RecordBatch:
    """Join two full-table batches by repartitioning over the mesh.

    Single-column int keys (the common TPC-H case); output is the
    concatenation of per-shard join results (padded + per-shard counts),
    compacted on the caller side by ``RecordBatch`` row-count semantics.
    """
    n_dev = len(mesh.devices.flat)
    pq, bq = quotas

    def prep(batch: RecordBatch, key_name: str):
        cap = batch.capacity()
        pad = (-cap) % (n_dev * 128)
        arrays = {
            name: _shard(mesh, axis, c.data, pad)
            for name, c in batch.columns.items()
        }
        meta = {name: (c.type, c.dictionary)
                for name, c in batch.columns.items()}
        return arrays, meta, (cap + pad) // n_dev

    parr, pmeta, p_shard_rows = prep(probe, probe_key)
    barr, bmeta, b_shard_rows = prep(build, build_key)
    p_rows = probe.num_rows
    b_rows = build.num_rows

    def step(pa: Dict[str, jnp.ndarray], ba: Dict[str, jnp.ndarray]):
        me = jax.lax.axis_index(axis)
        p_valid = jnp.clip(p_rows - me * p_shard_rows, 0, p_shard_rows)
        b_valid = jnp.clip(b_rows - me * b_shard_rows, 0, b_shard_rows)
        precv, pkey, pmask, pdrop = all_to_all_by_key(
            {k: v for k, v in pa.items() if k != probe_key},
            pa[probe_key], p_valid, axis, pq)
        brecv, bkey, bmask, bdrop = all_to_all_by_key(
            {k: v for k, v in ba.items() if k != build_key},
            ba[build_key], b_valid, axis, bq)

        def mk(arrays, key_name, key, mask, meta):
            cols = {
                name: Column(arr, meta[name][0], dictionary=meta[name][1])
                for name, arr in arrays.items()
            }
            cols[key_name] = Column(
                jnp.where(mask, key, jnp.asarray(-1, key.dtype)),
                meta[key_name][0], dictionary=meta[key_name][1])
            # mark dead rows null-keyed so they never match
            cols[key_name] = Column(
                cols[key_name].data, cols[key_name].type,
                validity=mask, dictionary=cols[key_name].dictionary)
            return RecordBatch(cols, jnp.sum(mask.astype(jnp.int64)))

        # compact received rows to the front so num_rows semantics hold
        def compacted(arrays, key_name, key, mask, meta):
            order = jnp.argsort(~mask, stable=True)
            arrays = {k: jnp.take(v, order, axis=0) for k, v in arrays.items()}
            key = jnp.take(key, order)
            mask_sorted = jnp.take(mask, order)
            return mk(arrays, key_name, key, mask_sorted, meta)

        pb = compacted(precv, probe_key, pkey, pmask, pmeta)
        bb = compacted(brecv, build_key, bkey, bmask, bmeta)
        out = hash_join(pb, bb, [probe_key], [build_key], kind, ranges,
                        local_capacity)
        res = {name: c.data for name, c in out.columns.items()}
        vres = {name: c.validity for name, c in out.columns.items()
                if c.validity is not None}
        nr = out.num_rows
        return res, vres, jnp.reshape(nr, (1,)), jnp.reshape(pdrop + bdrop,
                                                             (1,))

    smapped = shard_map(
        step, mesh=mesh,
        in_specs=(dict.fromkeys(parr, P(axis)), dict.fromkeys(barr, P(axis))),
        out_specs=P(axis),
    )
    data, validity, counts, dropped = jax.jit(smapped)(parr, barr)
    total_dropped = int(jnp.sum(dropped))
    if total_dropped:
        raise RuntimeError(
            f"exchange overflow: {total_dropped} rows exceeded the "
            f"src->dst quotas {quotas} — the discovery histogram under-"
            f"sized the shuffle (skewed keys?); re-run with larger quotas")

    # stitch shards: rows of shard s live at [s*local_capacity,
    # s*local_capacity + counts[s]); compact with index arithmetic
    total_cap = n_dev * local_capacity
    offsets = jnp.cumsum(counts)
    total = offsets[-1]
    i = jnp.arange(total_cap, dtype=jnp.int64)
    shard_of = jnp.searchsorted(offsets, i, side="right")
    shard_of = jnp.clip(shard_of, 0, n_dev - 1)
    within = i - (offsets[shard_of] - counts[shard_of])
    src = shard_of * local_capacity + jnp.clip(within, 0, local_capacity - 1)

    meta = {}
    if kind in ("inner", "left"):
        meta.update(pmeta)
        meta.update(bmeta)
        out_names = list(data.keys())
    else:
        out_names = list(data.keys())
        meta.update(pmeta)
    cols = {}
    for name in out_names:
        t, dic = (pmeta.get(name) or bmeta.get(name))
        d = jnp.take(data[name], src, mode="clip")
        v = None
        if name in validity:
            v = jnp.take(validity[name], src, mode="clip")
        cols[name] = Column(d, t, validity=v, dictionary=dic)
    return RecordBatch(cols, total)
