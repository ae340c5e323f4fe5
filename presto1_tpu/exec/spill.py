"""Spilling: host-RAM partitioned execution (Grace join / grouped agg).

Reference parity: ``spiller/`` (``FileSingleStreamSpiller``,
``GenericPartitioningSpiller``), the HashBuilderOperator spill states
(``operator/HashBuilderOperator.java:155,287-302``) and
``SpillableHashAggregationBuilder``.  The reference spills revocable
memory to local disk; on TPU the scarce resource is HBM and the spill
medium is **host RAM over PCIe** (SURVEY.md §5.4) — a spilled partition
is a dict of numpy arrays, unspilling re-uploads to device.

The partitioned processing loop doubles as the grouped-execution
(``execution/Lifespan.java:26``) analog: every hash partition runs
end-to-end independently, bounding peak HBM to roughly 1/P of the input.

TPU-native notes: partition ids come from the same 62-bit multiplicative
key mix the join uses, so partitioning is one fused elementwise pass; the
per-partition compaction reuses the sort-based ``compact`` (no scatters).
NULL keys land in one partition (sentinel word), preserving outer-join
semantics within a single partition pair.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch, round_capacity
from ..ops.common import iota, mix_key_word
from ..ops.filter import compact

# golden-ratio multiplier: decorrelates the mixed key word from the join's
# own table addressing before taking the top partition bits
_GOLD = np.int64(-7046029254386353131)  # 0x9E3779B97F4A7C15 as signed


@dataclass
class SpilledBatch:
    """Host-side (spilled) copy of a RecordBatch: the SerializedPage analog."""

    columns: Dict[str, tuple]  # name -> (data, validity|None, dictionary, type)
    num_rows: int

    def nbytes(self) -> int:
        total = 0
        for data, valid, _, _ in self.columns.values():
            total += data.nbytes + (valid.nbytes if valid is not None else 0)
        return total


def spill(batch: RecordBatch, num_rows: Optional[int] = None) -> SpilledBatch:
    """Copy the live rows of a batch to host arrays (device -> host RAM)."""
    n = int(batch.num_rows) if num_rows is None else num_rows
    cols = {}
    for name, c in batch.columns.items():
        data = np.asarray(c.data[:n])
        valid = None if c.validity is None else np.asarray(c.validity[:n])
        cols[name] = (data, valid, c.dictionary, c.type)
    return SpilledBatch(cols, n)


def unspill(sp: SpilledBatch, capacity: Optional[int] = None) -> RecordBatch:
    """Re-upload a spilled batch into a padded device RecordBatch."""
    cap = capacity if capacity is not None else round_capacity(max(sp.num_rows, 1))
    cols = {}
    for name, (data, valid, dic, t) in sp.columns.items():
        pad = cap - len(data)
        if pad:
            data = np.concatenate([data, np.zeros((pad,), data.dtype)])
            if valid is not None:
                valid = np.concatenate([valid, np.zeros((pad,), bool)])
        cols[name] = Column(jnp.asarray(data), t,
                            validity=None if valid is None
                            else jnp.asarray(valid),
                            dictionary=dic)
    return RecordBatch(cols, sp.num_rows)


def concat_spilled(parts: Sequence[SpilledBatch]) -> SpilledBatch:
    parts = [p for p in parts if p is not None]
    assert parts
    names = list(parts[0].columns.keys())
    cols = {}
    for name in names:
        datas, valids = [], []
        has_valid = any(p.columns[name][1] is not None for p in parts)
        dic = parts[0].columns[name][2]
        t = parts[0].columns[name][3]
        for p in parts:
            data, valid, pdic, _ = p.columns[name]
            datas.append(data)
            if has_valid:
                valids.append(valid if valid is not None
                              else np.ones((len(data),), bool))
            if pdic is not None:
                dic = pdic  # identical across partitions of one source
        cols[name] = (np.concatenate(datas) if datas else np.empty(0),
                      np.concatenate(valids) if has_valid else None,
                      dic, t)
    return SpilledBatch(cols, sum(p.num_rows for p in parts))


def choose_partitions(total_bytes: int, threshold: int,
                      max_partitions: int = 256) -> int:
    """Power-of-two partition count so each partition ~ threshold/2."""
    target = max(threshold // 2, 1)
    p = 1
    while p * target < total_bytes and p < max_partitions:
        p <<= 1
    return max(p, 2)


def partition_ids(key_cols: Sequence[Column], ranges, num_rows,
                  n_partitions: int) -> jnp.ndarray:
    """Partition id per row from the mixed key word (one elementwise pass).

    NULL keys share the sentinel word and therefore one partition, which
    keeps outer-join semantics local to a single partition pair.
    """
    word = mix_key_word(key_cols, ranges, num_rows)
    h = word * jnp.asarray(_GOLD, jnp.int64)
    return (h >> 32) & (n_partitions - 1)  # n_partitions is a power of two


def spill_partitions(batch: RecordBatch, key_names: Sequence[str], ranges,
                     n_partitions: int) -> List[SpilledBatch]:
    """Hash-partition a batch and spill each partition to host RAM."""
    n = batch.capacity()
    live = iota(n) < batch.num_rows
    pids = partition_ids([batch[k] for k in key_names], ranges,
                         batch.num_rows, n_partitions)
    out = []
    for p in range(n_partitions):
        mask = live & (pids == p)
        count = int(jnp.sum(mask))
        part = compact(batch, mask, round_capacity(max(count, 1)))
        out.append(spill(part, count))
    return out
