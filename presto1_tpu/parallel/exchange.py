"""Distributed exchange: hash repartitioning over the device mesh.

The TPU-native replacement for the reference's HTTP page shuffle
(``operator/PartitionedOutputOperator.java:406`` partition loop +
``operator/ExchangeClient.java:56`` pull protocol + ``PagesSerde`` wire
format): rows are routed by key hash with one vectorized partition kernel,
and the transfer is a single XLA ``all_to_all`` collective over ICI.  No
serde (fixed-width columns), no token/ack protocol (collectives are
deterministic), no backpressure machinery (static quotas per src→dst pair,
sized by the planner's discovery pass).

All functions here run *inside* ``shard_map`` over a Mesh axis — each
invocation sees its local shard.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# golden-ratio multiplicative-hash constant, as signed int64
_MIX = np.uint64(0x9E3779B97F4A7C15).astype(np.int64)


def partition_of(key: jnp.ndarray, n: int) -> jnp.ndarray:
    """Destination shard for each row: multiplicative hash of the key.

    (The reference's LocalPartitionGenerator / raw-hash routing,
    ``operator/PartitionedLookupSource.java:144``.)"""
    h = (key * _MIX) >> 33
    return (h % n).astype(jnp.int32)


def all_to_all_by_key(
    arrays: Dict[str, jnp.ndarray],
    key: jnp.ndarray,
    num_valid: jnp.ndarray,
    axis_name: str,
    quota: int,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Repartition local rows so equal keys land on the same shard.

    Every shard packs its rows into an [n, quota] send buffer (quota =
    max rows per src→dst pair, sized by the discovery pass) and one
    all_to_all moves everything over ICI.

    Rows beyond a src→dst quota cannot be sent inside a static-shape
    collective; they are counted, NOT silently dropped: the fourth return
    value is this shard's dropped-row count, and callers must check it on
    the host (psum + raise, or retry with a doubled quota) before trusting
    the result — the traced analog of the compiled executor's
    ``overflow_checks`` guard.

    Returns (received arrays flattened to [n*quota], received key,
    valid-row mask, dropped-row count scalar).
    """
    n = jax.lax.axis_size(axis_name)
    cap = key.shape[0]
    live = jnp.arange(cap) < num_valid
    dest = partition_of(key, n)
    dest = jnp.where(live, dest, n)  # dead rows route nowhere

    # stable-sort rows by destination; bucket slots filled by GATHER from
    # the sorted arrangement (scatter is pathologically slow on TPU —
    # see ops/segments.py)
    order = jnp.argsort(dest, stable=True)
    dest_sorted = jnp.take(dest, order)
    start = jnp.searchsorted(dest_sorted, jnp.arange(n + 1))
    raw_counts = start[1:] - start[:-1]
    counts = jnp.minimum(raw_counts, quota)
    dropped = jnp.sum(raw_counts - counts)
    slot_src = start[:n, None] + jnp.arange(quota)[None, :]  # [n, quota]
    slot_ok = jnp.arange(quota)[None, :] < counts[:, None]
    slot_row = jnp.take(order, jnp.clip(slot_src, 0, cap - 1), mode="clip")

    def pack(a: jnp.ndarray) -> jnp.ndarray:
        buf = jnp.take(a, slot_row, mode="clip")
        return jnp.where(
            slot_ok.reshape(slot_ok.shape + (1,) * (buf.ndim - 2))
            if buf.ndim > 2 else slot_ok,
            buf, jnp.zeros((), a.dtype))

    send = {name: pack(a) for name, a in arrays.items()}
    send_key = pack(key)

    recv = {
        name: jax.lax.all_to_all(b, axis_name, 0, 0, tiled=False)
        for name, b in send.items()
    }
    recv_key = jax.lax.all_to_all(send_key, axis_name, 0, 0, tiled=False)
    recv_counts = jax.lax.all_to_all(
        counts.reshape(n, 1), axis_name, 0, 0, tiled=False).reshape(n)

    valid = (jnp.arange(quota)[None, :] < recv_counts[:, None]).reshape(-1)
    out = {name: b.reshape((n * quota,) + b.shape[2:])
           for name, b in recv.items()}
    return out, recv_key.reshape(-1), valid, dropped
