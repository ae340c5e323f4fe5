"""Skew detection and skew-resistant distributed join (mesh plane).

The reference has no automatic in-engine skew handling (SURVEY §2.8 —
cost model only); the north star requires it.  Design:

* **detect** — the discovery pass already computes exact per-key
  histograms on the host (`exchange_quota`); keys whose probe-side row
  count exceeds ``threshold × fair_share`` are "hot".  Detection runs on
  the ROUTE WORD (the packed composite of every equi key — the same word
  the exchange routes on), so any key arity is covered, mirroring the
  DCN plane's row-hash approach (``server/worker.py _partition_output``).
* **split** — hot keys would overload one shard under hash routing, so
  the join splits: cold rows take the normal repartitioned path
  (`dist_join.distributed_hash_join`), hot probe rows STAY where they are
  and the (few) build rows for hot keys are **broadcast** to every shard —
  the classic partitioned+broadcast hybrid.
* **merge** — both halves use the same local join operator (residuals
  included: each candidate pair lives in exactly one half, so the
  residual evaluates once per pair); results concatenate.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..batch import RecordBatch, concat_batches, round_capacity
from ..ops import hash_join
from ..ops.filter import compact
from .dist_join import distributed_hash_join, exchange_quota


def detect_hot_keys(key_host: np.ndarray, n_rows: int, n_dev: int,
                    threshold: float = 4.0) -> np.ndarray:
    """Key words whose row count exceeds threshold × (n_rows / n_dev) —
    any one of them would make a shard's quota blow past fair share.
    ``key_host`` is the packed route word, so composite keys are one
    value here."""
    keys, counts = np.unique(key_host[:n_rows], return_counts=True)
    fair = max(n_rows / max(n_dev, 1), 1.0)
    return keys[counts > threshold * fair]


def skew_aware_join(
    mesh: Mesh,
    probe: RecordBatch,
    build: RecordBatch,
    probe_keys,
    build_keys,
    ranges,
    hot_words: np.ndarray,
    probe_words: np.ndarray,
    build_words: np.ndarray,
    residual=None,
    build_unique: bool = False,
    axis: str = "d",
) -> RecordBatch:
    """Inner join resilient to probe-side key skew (discovery-time
    hot-word list over the packed composite key).  Cold slice →
    repartitioned mesh join; hot slice → local probe × broadcast build.
    Multi-key and residual conditions ride both halves unchanged."""
    if isinstance(probe_keys, str):  # single-key callers (tests)
        probe_keys, build_keys = [probe_keys], [build_keys]
    n_dev = len(mesh.devices.flat)
    n_rows = int(probe.num_rows)

    hot_p = np.zeros(probe.capacity(), bool)
    hot_p[:n_rows] = np.isin(probe_words[:n_rows], hot_words)
    n_hot = int(hot_p.sum())
    n_cold = n_rows - n_hot
    hot = jnp.asarray(hot_p)
    live = jnp.arange(probe.capacity()) < probe.num_rows

    cold = compact(probe, live & ~hot, round_capacity(max(n_cold, 1)))
    cold = RecordBatch(cold.columns, n_cold)

    hot_probe = compact(probe, live & hot, round_capacity(max(n_hot, 1)))
    hot_probe = RecordBatch(hot_probe.columns, n_hot)

    b_rows = int(build.num_rows)
    hot_b = np.zeros(build.capacity(), bool)
    hot_b[:b_rows] = np.isin(build_words[:b_rows], hot_words)
    hot_build_rows = int(hot_b.sum())
    blive = jnp.arange(build.capacity()) < build.num_rows
    hot_build = compact(build, blive & jnp.asarray(hot_b),
                        round_capacity(max(hot_build_rows, 1)))
    hot_build = RecordBatch(hot_build.columns, hot_build_rows)

    # cold half: normal repartitioned mesh join (the cold probe slice
    # re-derives its quota — the hot rows are exactly the ones that made
    # the original histogram spike)
    from .dist_join import prep_shard_rows

    shard_rows = prep_shard_rows(cold.capacity(), n_dev)
    cold_words = probe_words[:n_rows][~hot_p[:n_rows]]
    pq = exchange_quota(cold_words, n_cold, n_dev, shard_rows)
    b_shard_rows = prep_shard_rows(build.capacity(), n_dev)
    bq = exchange_quota(build_words, b_rows, n_dev, b_shard_rows)
    cold_out = distributed_hash_join(
        mesh, cold, build, list(probe_keys), list(build_keys), "inner",
        ranges,
        (round_capacity(max(pq, 128)), round_capacity(max(bq, 128))),
        round_capacity(max(n_cold * 2, 128)), residual=residual,
        build_unique=build_unique, axis=axis)

    # hot half: broadcast the (small) hot build slice; probe rows join
    # where they already live — one local join, no shuffle of the hot rows
    hot_out = hash_join(hot_probe, hot_build, list(probe_keys),
                        list(build_keys), "inner", ranges,
                        round_capacity(max(n_hot * 4, 128)),
                        residual=residual, build_unique=build_unique)

    cold_n = int(cold_out.num_rows)
    hot_n = int(hot_out.num_rows)
    cap = round_capacity(max(cold_n + hot_n, 1))
    cold_out = RecordBatch(cold_out.columns, cold_n)
    hot_out = RecordBatch(hot_out.columns, hot_n)
    # align column sets (order may differ)
    hot_cols = {name: hot_out.columns[name] for name in cold_out.columns}
    return concat_batches(cold_out,
                          RecordBatch(hot_cols, hot_out.num_rows), cap)
