"""Array/map types + lambda functions (reference: spi/type/ArrayType,
MapType; operator/scalar/Array*Function, MapKeys/MapValues,
ArrayTransformFunction lambda compilation).

TPU-first representation: [n, W] padded element matrix + lengths (static
shapes), lambdas re-entering the scalar jnp evaluator over the flattened
element space."""

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def one(engine, expr_sql):
    out = engine.sql(f"select {expr_sql} v from nation where n_nationkey = 0")
    return out.to_pandas().v[0]


def test_array_literal_and_cardinality(engine):
    assert one(engine, "array[1, 2, 3]") == [1, 2, 3]
    assert one(engine, "cardinality(array[1, 2, 3])") == 3
    assert one(engine, "cardinality(array[])") == 0


def test_element_at_and_subscript(engine):
    assert one(engine, "element_at(array[10, 20, 30], 2)") == 20
    assert one(engine, "array[10, 20, 30][3]") == 30
    assert one(engine, "element_at(array[10, 20], -1)") == 20
    assert one(engine, "element_at(array[10, 20], 5)") is None


def test_contains_position_minmax(engine):
    assert bool(one(engine, "contains(array[1, 5, 9], 5)")) is True
    assert bool(one(engine, "contains(array[1, 5, 9], 4)")) is False
    assert one(engine, "array_position(array[7, 8, 9], 9)") == 3
    assert one(engine, "array_position(array[7, 8], 99)") == 0
    assert one(engine, "array_min(array[5, 2, 8])") == 2
    assert one(engine, "array_max(array[5, 2, 8])") == 8


def test_array_concat(engine):
    assert one(engine, "array[1, 2] || array[3]") == [1, 2, 3]
    assert one(engine, "array_concat(array[1], array[2, 3])") == [1, 2, 3]


def test_lambdas(engine):
    assert one(engine, "transform(array[1, 2, 3], x -> x * 10)") == \
        [10, 20, 30]
    assert one(engine, "filter(array[5, 2, 8, 1], x -> x > 2)") == [5, 8]
    assert bool(one(engine, "any_match(array[1, 2], x -> x = 2)")) is True
    assert bool(one(engine, "all_match(array[1, 2], x -> x > 0)")) is True
    assert bool(one(engine, "none_match(array[1, 2], x -> x > 5)")) is True


def test_lambda_with_outer_column(engine):
    out = engine.sql(
        "select n_nationkey k, transform(array[1, 2], x -> x + n_nationkey)"
        " v from nation where n_nationkey < 3 order by k").to_pandas()
    assert out.v[0] == [1, 2]
    assert out.v[2] == [3, 4]


def test_map_functions(engine):
    assert one(engine, "cardinality(map(array[1, 2], array[10, 20]))") == 2
    assert one(engine,
               "element_at(map(array[1, 2], array[10, 20]), 2)") == 20
    assert one(engine,
               "element_at(map(array[1, 2], array[10, 20]), 9)") is None
    assert one(engine, "map_keys(map(array[1, 2], array[10, 20]))") == [1, 2]
    assert one(engine,
               "map_values(map(array[1, 2], array[10, 20]))") == [10, 20]
    assert one(engine, "map(array[1, 2], array[10, 20])") == {1: 10, 2: 20}


def test_string_array_literal(engine):
    assert one(engine, "cardinality(array['a', 'b'])") == 2


def test_arrays_from_table_columns(engine):
    out = engine.sql(
        "select n_nationkey k, array[n_nationkey, n_regionkey] a "
        "from nation order by k limit 3").to_pandas()
    assert out.a[0] == [0, 0]
    row1 = engine.catalog.table("nation").batch(
        ["n_nationkey", "n_regionkey"]).to_pandas().sort_values(
        "n_nationkey").iloc[1]
    assert out.a[1] == [int(row1.n_nationkey), int(row1.n_regionkey)]


def test_array_through_filter_and_sort(engine):
    out = engine.sql(
        "select n_nationkey k, transform(array[n_regionkey], x -> x * 2) a "
        "from nation where n_regionkey = 1 "
        "order by n_nationkey desc").to_pandas()
    assert len(out) == 5
    assert all(v == [2] for v in out.a)
    assert list(out.k) == sorted(out.k, reverse=True)


def test_parse_type_roundtrip():
    from presto1_tpu.types import parse_type_str

    for s in ["array(bigint)", "map(varchar,bigint)",
              "array(decimal(12,2))", "map(bigint,array(bigint))"]:
        assert str(parse_type_str(s)) == s


def test_array_wire_roundtrip():
    import jax.numpy as jnp
    from presto1_tpu.batch import Column, RecordBatch
    from presto1_tpu.exec.pages import deserialize_batch, serialize_batch
    from presto1_tpu.types import ArrayType, BIGINT, MapType

    b = RecordBatch({
        "a": Column(jnp.asarray([[1, 2, 0], [3, 0, 0]], jnp.int64),
                    ArrayType(BIGINT),
                    lengths=jnp.asarray([2, 1], jnp.int32)),
        "m": Column(jnp.asarray([[1, 2], [7, 0]], jnp.int64),
                    MapType(BIGINT, BIGINT),
                    lengths=jnp.asarray([2, 1], jnp.int32),
                    map_values=jnp.asarray([[10, 20], [70, 0]], jnp.int64)),
    }, 2)
    rt = deserialize_batch(serialize_batch(b))
    assert rt["a"].decode(2).tolist() == [[1, 2], [3]]
    assert rt["m"].decode(2).tolist() == [{1: 10, 2: 20}, {7: 70}]


def test_unnest_standalone(engine):
    out = engine.sql(
        "select col from unnest(array[3, 1, 2]) as t(col) order by col"
    ).to_pandas()
    assert list(out.col) == [1, 2, 3]


def test_unnest_cross_join(engine):
    """CROSS JOIN UNNEST correlates with the left relation (the
    operator/unnest/ UnnestOperator shape)."""
    out = engine.sql(
        "select n_nationkey k, e from nation "
        "cross join unnest(array[n_nationkey, n_nationkey * 10]) as u(e) "
        "where n_nationkey < 3 order by k, e").to_pandas()
    assert list(out.k) == [0, 0, 1, 1, 2, 2]
    assert list(out.e) == [0, 0, 1, 10, 2, 20]


def test_unnest_map(engine):
    out = engine.sql(
        "select k, v from unnest(map(array[1, 2], array[10, 20])) "
        "as t(k, v) order by k").to_pandas()
    assert list(out.k) == [1, 2]
    assert list(out.v) == [10, 20]


def test_unnest_aggregate(engine):
    out = engine.sql(
        "select sum(e) s, count(*) c from nation "
        "cross join unnest(array[1, 2, 3]) as u(e)").to_pandas()
    assert int(out.c[0]) == 25 * 3
    assert int(out.s[0]) == 25 * 6


def test_lambda_empty_array(engine):
    """Zero-width element matrices (``array[]`` literals) through the
    lambda family (ADVICE r3: reshape(rows, 0) crashed)."""
    assert one(engine, "transform(array[], x -> x)") == []
    assert one(engine, "filter(array[], x -> x > 0)") == []
    assert bool(one(engine, "any_match(array[], x -> x = 1)")) is False
    assert bool(one(engine, "all_match(array[], x -> x = 1)")) is True
    assert bool(one(engine, "none_match(array[], x -> x = 1)")) is True


def test_unnest_empty_array(engine):
    out = engine.sql(
        "select n_nationkey k, e from nation "
        "cross join unnest(array[]) as u(e)").to_pandas()
    assert len(out) == 0


def test_nested_pages_partition_and_paginate(monkeypatch):
    """Array columns through the DCN partition/paginate/concat path
    (ADVICE r3: lengths were dropped or misaligned everywhere except the
    raw serde)."""
    import jax.numpy as jnp

    from presto1_tpu.batch import Column, RecordBatch
    from presto1_tpu.exec import pages as P
    from presto1_tpu.server import worker as W
    from presto1_tpu.types import BIGINT, parse_type_str

    at = parse_type_str("array(bigint)")
    n = 25
    data = jnp.arange(n * 3, dtype=jnp.int64).reshape(n, 3)
    lengths = jnp.asarray((np.arange(n) % 4).astype(np.int32))
    k = jnp.arange(n, dtype=jnp.int64)
    b = RecordBatch({
        "k": Column(k, BIGINT),
        "a": Column(data, at, lengths=lengths),
    }, n)

    # multi-page pagination keeps lengths aligned with their rows
    monkeypatch.setattr(W, "PAGE_MAX_ROWS", 10)
    pgs = W._paginate(b, 0, n)
    assert len(pgs) == 3
    rts = [P.deserialize_batch(p) for p in pgs]
    got_lengths = np.concatenate(
        [np.asarray(r["a"].lengths)[:r.num_rows] for r in rts])
    assert list(got_lengths) == list(np.asarray(lengths))
    got_row0_page2 = rts[2]["a"].data[0, :int(rts[2]["a"].lengths[0])]
    assert list(np.asarray(got_row0_page2)) == list(
        np.asarray(data[20, :int(lengths[20])]))

    # hash partition keeps each row's elements with the row
    bufs = W._partition_output(b, n, ["k"], 3)
    seen = {}
    for buf in bufs:
        for p in buf:
            r = P.deserialize_batch(p)
            for i in range(r.num_rows):
                key = int(np.asarray(r["k"].data)[i])
                ln = int(np.asarray(r["a"].lengths)[i])
                seen[key] = list(np.asarray(r["a"].data)[i][:ln])
    assert len(seen) == n
    for key in range(n):
        ln = int(lengths[key])
        assert seen[key] == list(np.asarray(data[key, :ln]))

    # multi-batch concat with DIFFERENT pad widths
    b2 = RecordBatch({
        "k": Column(jnp.asarray([100, 101], jnp.int64), BIGINT),
        "a": Column(jnp.asarray([[7, 8, 9, 10, 11], [1, 2, 3, 4, 5]],
                                jnp.int64), at,
                    lengths=jnp.asarray([5, 2], jnp.int32)),
    }, 2)
    h1 = P.deserialize_batch(P.serialize_batch(b))
    h2 = P.deserialize_batch(P.serialize_batch(b2))
    merged = P.concat_batches([h1, h2], device=False)
    assert merged.num_rows == n + 2
    ml = np.asarray(merged["a"].lengths)
    assert list(ml[-2:]) == [5, 2]
    assert list(np.asarray(merged["a"].data)[n][:5]) == [7, 8, 9, 10, 11]
    # _to_device pads rows but keeps lengths/map_values
    dev = P.concat_batches([h1, h2], device=True)
    assert dev["a"].lengths is not None
    assert list(np.asarray(dev["a"].data)[n][:5]) == [7, 8, 9, 10, 11]
