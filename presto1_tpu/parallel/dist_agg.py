"""Distributed aggregation: partial per shard → gather → final combine.

The reference splits aggregations into PARTIAL and FINAL stages around a
FIXED_HASH exchange (planner rule PushPartialAggregationThroughExchange,
``operator/HashAggregationOperator`` steps).  The TPU-native version runs
the partial aggregation inside ``shard_map`` over row-sharded scan columns,
gathers the per-shard group tables (tiny compared to the input), and
re-aggregates them with the same sort-based operator — sum/count re-sum,
min/max re-min/max, avg is decomposed into sum+count and divided at the
end.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..batch import Column, RecordBatch
from ..ops.hashagg import AggSpec, group_aggregate
from ..types import BIGINT, DOUBLE


def _decompose(aggs: Sequence[AggSpec]) -> Tuple[List[AggSpec], list]:
    """Partial agg specs + recipe to rebuild finals from partial columns."""
    partial: List[AggSpec] = []
    recipe = []  # (final_name, kind, partial names)
    for i, a in enumerate(aggs):
        if a.fn in ("sum", "min", "max"):
            pname = f"__p{i}"
            partial.append(AggSpec(a.fn, a.input, pname))
            recipe.append((a.name, a.fn, [pname]))
        elif a.fn in ("count", "count_star"):
            pname = f"__p{i}"
            partial.append(AggSpec(a.fn, a.input, pname))
            recipe.append((a.name, "sum", [pname]))
        elif a.fn == "avg":
            sname, cname = f"__ps{i}", f"__pc{i}"
            partial.append(AggSpec("sum", a.input, sname))
            partial.append(AggSpec("count", a.input, cname))
            recipe.append((a.name, "avg_combine", [sname, cname]))
        else:
            raise NotImplementedError(a.fn)
    return partial, recipe


def distributed_group_aggregate(
    mesh: Mesh,
    key_names: Sequence[str],
    columns: Dict[str, Column],
    aggs: Sequence[AggSpec],
    num_rows: int,
    ranges,
    max_groups: int,
    mask: Optional[jnp.ndarray] = None,
    carry_names: Sequence[str] = (),
    axis: str = "d",
) -> RecordBatch:
    """Group-aggregate row-sharded columns over the mesh.

    ``columns`` hold full-table device arrays (they get resharded onto the
    mesh); ``mask`` optionally fuses an upstream filter.  Output is a
    replicated RecordBatch.
    """
    n_dev = len(mesh.devices.flat)
    partial_specs, recipe = _decompose(aggs)

    # pad rows to a multiple of the mesh size, shard
    cap = next(iter(columns.values())).data.shape[0]
    pad = (-cap) % (n_dev * 128)

    def _shard(data):
        if pad:
            data = jnp.concatenate(
                [data, jnp.zeros((pad,) + data.shape[1:], data.dtype)])
        return jax.device_put(data, NamedSharding(mesh, P(axis)))

    sharded: Dict[str, jnp.ndarray] = {}
    for name, c in columns.items():
        sharded[name] = _shard(c.data)
        if c.validity is not None:
            sharded["__v_" + name] = _shard(c.validity)
    if mask is not None:
        sharded["__mask"] = _shard(mask)
    shard_rows = (cap + pad) // n_dev

    types = {name: (c.type, c.dictionary) for name, c in columns.items()}

    def partial_fn(arrays):
        arrays = dict(arrays)
        local_mask = arrays.pop("__mask", None)
        cols = {
            name: Column(arrays[name], types[name][0],
                         validity=arrays.get("__v_" + name),
                         dictionary=types[name][1])
            for name in arrays if not name.startswith("__v_")
        }
        # rows valid on this shard: global row index < num_rows
        base = jax.lax.axis_index(axis) * shard_rows
        local_valid_rows = jnp.clip(num_rows - base, 0, shard_rows)
        keys = [(k, cols[k]) for k in key_names]
        carry = [(k, cols[k]) for k in carry_names]
        specs = [
            AggSpec(s.fn,
                    None if s.input is None else cols[f"__agg_{s.name}"],
                    s.name)
            for s in partial_specs
        ]
        out = group_aggregate(keys, specs, local_valid_rows, ranges,
                              max_groups, mask=local_mask, carry=carry)
        res = {name: c.data for name, c in out.columns.items()}
        res["__count"] = jnp.reshape(out.num_rows, (1,))
        return res

    # evaluate partial-agg inputs up front so the shard function only sees
    # plain arrays (inputs were already evaluated Columns); validity rides
    # along — count/sum must skip NULLs (e.g. LEFT-join padding)
    for s in partial_specs:
        if s.input is not None:
            sharded[f"__agg_{s.name}"] = _shard(s.input.data)
            if s.input.validity is not None:
                sharded[f"__v___agg_{s.name}"] = _shard(s.input.validity)
            types[f"__agg_{s.name}"] = (s.input.type, s.input.dictionary)

    from .distributed import (arrays_signature, cached_program,
                              mesh_signature)

    sig = ("dist_agg", mesh_signature(mesh), axis, tuple(key_names),
           tuple(carry_names),
           tuple((s.fn, s.name, s.input is not None) for s in partial_specs),
           tuple(map(tuple, ranges)), max_groups, int(num_rows),
           arrays_signature(sharded),
           tuple((n, str(t)) for n, (t, _) in sorted(types.items())))

    def build():
        return jax.jit(shard_map(
            partial_fn, mesh=mesh,
            in_specs=(dict.fromkeys(sharded, P(axis)),),
            out_specs=P(axis),
        ))

    # each value: [n_dev * max_groups]
    partials = cached_program(sig, build)(sharded)
    # finish the collective program before any other launches (interleaved
    # collective rendezvous deadlock on shared device threads)
    jax.block_until_ready(partials)

    # final combine on replicated partial tables (carry columns — group
    # columns functionally dependent on the primary keys — ride through
    # as representative-row payloads, same as in group_aggregate)
    fcols = {}
    for name in list(key_names) + list(carry_names):
        fcols[name] = Column(partials[name], types[name][0],
                             dictionary=types[name][1])
    total_rows = n_dev * max_groups
    # per-shard group tables are padded to max_groups; dead slots carry
    # garbage keys — mask them via per-shard group counts
    counts = partials["__count"]  # [n_dev]
    slot = jnp.arange(total_rows) % max_groups
    shard_of = jnp.arange(total_rows) // max_groups
    live = slot < jnp.take(counts, shard_of)

    final_specs = []
    for fname, kind, pnames in recipe:
        if kind == "avg_combine":
            sum_col = Column(partials[pnames[0]],
                             _partial_type(partial_specs, pnames[0]))
            cnt_col = Column(partials[pnames[1]], BIGINT)
            fcols[pnames[0]] = sum_col
            fcols[pnames[1]] = cnt_col
            final_specs.append(AggSpec("sum", sum_col, pnames[0] + "_f"))
            final_specs.append(AggSpec("sum", cnt_col, pnames[1] + "_f"))
        else:
            col = Column(partials[pnames[0]],
                         _partial_type(partial_specs, pnames[0]))
            fcols[pnames[0]] = col
            final_specs.append(AggSpec(kind, col, fname))

    keys = [(k, fcols[k]) for k in key_names]
    out = group_aggregate(keys, final_specs, total_rows, ranges, max_groups,
                          mask=live,
                          carry=[(k, fcols[k]) for k in carry_names])

    # stitch avg columns
    cols = {k: out[k] for k in list(key_names) + list(carry_names)}
    for fname, kind, pnames in recipe:
        if kind == "avg_combine":
            s = out[pnames[0] + "_f"]
            c = out[pnames[1] + "_f"]
            t = s.type
            scale = 10 ** t.scale if t.kind == "decimal" else 1  # type: ignore[attr-defined]
            data = s.data.astype(jnp.float64) / (
                jnp.maximum(c.data, 1) * scale)
            cols[fname] = Column(data, DOUBLE, validity=c.data > 0)
        else:
            cols[fname] = out[fname]
    return RecordBatch(cols, out.num_rows)


def _partial_type(partial_specs, name):
    for s in partial_specs:
        if s.name == name:
            return AggSpec(s.fn, s.input, s.name).output_type()
    raise KeyError(name)


def distributed_global_aggregate(
    mesh: Mesh,
    aggs: Sequence[AggSpec],
    num_rows: int,
    mask: Optional[jnp.ndarray] = None,
    axis: str = "d",
) -> RecordBatch:
    """Ungrouped aggregation over the mesh: a degenerate group-by on a
    constant key (the reference's single-group AggregationOperator with a
    partial→final exchange; with one group the exchange is an all-reduce).

    Caller must guarantee num_rows > 0 — SQL's empty-input global
    aggregate (one row of NULL/0) stays on the single-device path."""
    cap = None
    for s in aggs:
        if s.input is not None:
            cap = s.input.data.shape[0]
            break
    if cap is None:
        cap = mask.shape[0] if mask is not None else 128
    const = Column(jnp.zeros((cap,), jnp.int64), BIGINT)
    out = distributed_group_aggregate(
        mesh, ["__g"], {"__g": const}, aggs, num_rows, [(0, 0)], 128,
        mask=mask, axis=axis)
    cols = {n: c for n, c in out.columns.items() if n != "__g"}
    return RecordBatch(cols, out.num_rows)
