"""Skew detection and skew-resistant distributed join.

The reference has no automatic in-engine skew handling (SURVEY §2.8 —
cost model only); the north star requires it.  Design:

* **detect** — the discovery pass already computes exact per-key
  histograms on the host (`exchange_quota`); keys whose probe-side row
  count exceeds ``threshold × fair_share`` are "hot".
* **split** — hot keys would overload one shard under hash routing, so
  the join splits: cold rows take the normal repartitioned path
  (`dist_join.distributed_hash_join`), hot probe rows STAY where they are
  and the (few) build rows for hot keys are **broadcast** to every shard —
  the classic partitioned+broadcast hybrid.
* **merge** — both halves use the same local join operator; results
  concatenate.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..batch import RecordBatch, concat_batches, round_capacity
from ..ops import hash_join
from ..ops.filter import compact
from .dist_join import distributed_hash_join, exchange_quota


def detect_hot_keys(key_host: np.ndarray, n_rows: int, n_dev: int,
                    threshold: float = 4.0) -> np.ndarray:
    """Keys whose row count exceeds threshold × (n_rows / n_dev) — any one
    of them would make a shard's quota blow past fair share."""
    keys, counts = np.unique(key_host[:n_rows], return_counts=True)
    fair = max(n_rows / max(n_dev, 1), 1.0)
    return keys[counts > threshold * fair]


def skew_aware_join(
    mesh: Mesh,
    probe: RecordBatch,
    build: RecordBatch,
    probe_key: str,
    build_key: str,
    ranges,
    hot_keys: np.ndarray,
    axis: str = "d",
) -> RecordBatch:
    """Inner join resilient to probe-side key skew (discovery-time hot-key
    list).  Cold slice → repartitioned mesh join; hot slice → local probe ×
    broadcast build."""
    n_dev = len(mesh.devices.flat)
    pk_host = np.asarray(probe[probe_key].data)[:probe.num_rows]
    bk_host = np.asarray(build[build_key].data)[:build.num_rows]

    hot = jnp.asarray(np.isin(np.asarray(probe[probe_key].data), hot_keys))
    live = jnp.arange(probe.capacity()) < probe.num_rows
    n_hot = int(np.isin(pk_host, hot_keys).sum())
    n_cold = probe.num_rows - n_hot

    cold = compact(probe, live & ~hot,
                   round_capacity(max(n_cold, 1)))
    cold = RecordBatch(cold.columns, n_cold)

    hot_probe = compact(probe, live & hot, round_capacity(max(n_hot, 1)))
    hot_probe = RecordBatch(hot_probe.columns, n_hot)

    b_hot_mask = np.isin(bk_host, hot_keys)
    hot_build_rows = int(b_hot_mask.sum())
    bh = jnp.asarray(np.isin(np.asarray(build[build_key].data), hot_keys))
    blive = jnp.arange(build.capacity()) < build.num_rows
    hot_build = compact(build, blive & bh,
                        round_capacity(max(hot_build_rows, 1)))
    hot_build = RecordBatch(hot_build.columns, hot_build_rows)

    # cold half: normal repartitioned mesh join
    shard_rows = round_capacity(max(n_cold, 1)) // n_dev or 1
    pq = exchange_quota(np.asarray(cold[probe_key].data), n_cold, n_dev,
                        max(shard_rows, 1))
    b_shard_rows = round_capacity(build.num_rows) // n_dev or 1
    bq = exchange_quota(bk_host, build.num_rows, n_dev, b_shard_rows)
    cold_out = distributed_hash_join(
        mesh, cold, build, [probe_key], [build_key], "inner", ranges,
        (round_capacity(max(pq, 128)), round_capacity(max(bq, 128))),
        round_capacity(max(n_cold * 2, 128)), axis=axis)

    # hot half: broadcast the (small) hot build slice; probe rows join
    # where they already live — one local join, no shuffle of the hot rows
    hot_out = hash_join(hot_probe, hot_build, [probe_key], [build_key],
                        "inner", ranges,
                        round_capacity(max(n_hot * 4, 128)))

    cold_n = int(cold_out.num_rows)
    hot_n = int(hot_out.num_rows)
    cap = round_capacity(max(cold_n + hot_n, 1))
    cold_out = RecordBatch(cold_out.columns, cold_n)
    hot_out = RecordBatch(hot_out.columns, hot_n)
    # align column sets (order may differ)
    hot_cols = {name: hot_out.columns[name] for name in cold_out.columns}
    return concat_batches(cold_out,
                          RecordBatch(hot_cols, hot_out.num_rows), cap)
