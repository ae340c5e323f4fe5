"""Operator unit tests with hand-built batches — the analog of the
reference's TestHashJoinOperator / TestHashAggregationOperator / TestGroupByHash
(core/trino-main/src/test/java/io/trino/operator/)."""

import numpy as np
import pytest

from presto1_tpu import BIGINT, DOUBLE, VARCHAR, DecimalType
from presto1_tpu.batch import from_numpy
from presto1_tpu.expr import lit, col, call
from presto1_tpu.expr.eval import bind_string_ops, eval_expr
from presto1_tpu.ops import (
    AggSpec, SortKey, filter_batch, global_aggregate, group_aggregate,
    hash_join, sort_batch,
)
from presto1_tpu.ops.common import key_ranges
from presto1_tpu.ops.filter import filter_mask
from presto1_tpu.types import DATE


def make_batch(**arrays):
    types = {}
    np_arrays = {}
    for name, arr in arrays.items():
        arr = np.asarray(arr)
        if arr.dtype.kind in ("U", "O"):
            types[name] = VARCHAR
        elif arr.dtype.kind == "f":
            types[name] = DOUBLE
        else:
            types[name] = BIGINT
        np_arrays[name] = arr
    return from_numpy(np_arrays, types)


def test_filter_and_project():
    b = make_batch(x=[1, 2, 3, 4, 5], y=[10.0, 20.0, 30.0, 40.0, 50.0])
    pred = call(">", col("x", BIGINT), lit(2))
    out = filter_batch(pred, b)
    assert int(out.num_rows) == 3
    assert list(out["x"].decode(3)) == [3, 4, 5]


def test_string_predicate_lut():
    b = make_batch(s=["apple", "banana", "cherry", "apricot"])
    pred = call("like", col("s", VARCHAR), lit("ap%", VARCHAR))
    dicts = {"s": b["s"].dictionary}
    bound = bind_string_ops(pred, dicts)
    out = filter_batch(bound, b)
    assert sorted(out["s"].decode(int(out.num_rows))) == ["apple", "apricot"]


def test_group_aggregate_basic():
    b = make_batch(k=[1, 2, 1, 2, 3], v=[10, 20, 30, 40, 50])
    keys = [("k", b["k"])]
    aggs = [
        AggSpec("sum", b["v"], "s"),
        AggSpec("count_star", None, "c"),
        AggSpec("min", b["v"], "mn"),
        AggSpec("max", b["v"], "mx"),
    ]
    ranges = key_ranges([b["k"]], b.num_rows)
    out = group_aggregate(keys, aggs, b.num_rows, ranges, max_groups=8)
    n = int(out.num_rows)
    assert n == 3
    rows = sorted(zip(out["k"].decode(n), out["s"].decode(n),
                      out["c"].decode(n), out["mn"].decode(n), out["mx"].decode(n)))
    assert rows == [(1, 40, 2, 10, 30), (2, 60, 2, 20, 40), (3, 50, 1, 50, 50)]


def test_group_aggregate_masked_and_avg():
    b = make_batch(k=[1, 1, 2, 2], v=[1.0, 3.0, 5.0, 100.0])
    import jax.numpy as jnp

    mask = jnp.asarray([True, True, True, False])
    ranges = key_ranges([b["k"]], b.num_rows)
    out = group_aggregate([("k", b["k"])], [AggSpec("avg", b["v"], "a")],
                          b.num_rows, ranges, max_groups=8, mask=mask)
    n = int(out.num_rows)
    rows = dict(zip(out["k"].decode(n), out["a"].decode(n)))
    assert rows[1] == pytest.approx(2.0)
    assert rows[2] == pytest.approx(5.0)


def test_global_aggregate_empty():
    b = make_batch(v=[1, 2, 3])
    import jax.numpy as jnp

    out = global_aggregate(
        [AggSpec("sum", b["v"], "s"), AggSpec("count_star", None, "c")],
        num_rows=0, capacity=b.capacity())
    assert out["c"].decode(1)[0] == 0
    assert out["s"].decode(1)[0] is None  # SUM of empty = NULL


def test_decimal_exact_sum():
    t = DecimalType(12, 2)
    b = from_numpy({"v": np.array([101, 202, 307])}, {"v": t})  # 1.01+2.02+3.07
    out = global_aggregate([AggSpec("sum", b["v"], "s")], b.num_rows, b.capacity())
    assert out["s"].decode(1)[0] == pytest.approx(6.10)


def test_inner_join_one_to_many():
    probe = make_batch(pk=[1, 2, 3, 2], pv=[10, 20, 30, 21])
    build = make_batch(bk=[2, 2, 3], bv=[100, 200, 300])
    ranges = key_ranges([probe["pk"], build["bk"]], 4)
    lo = min(r[0] for r in ranges)
    hi = max(r[1] for r in ranges)
    out = hash_join(probe, build, ["pk"], ["bk"], "inner",
                    [(lo, hi)], capacity=16)
    n = int(out.num_rows)
    assert n == 5  # rows 2,4 match twice; row 3 once
    pairs = sorted(zip(out["pv"].decode(n), out["bv"].decode(n)))
    assert pairs == [(20, 100), (20, 200), (21, 100), (21, 200), (30, 300)]


def test_left_join_nulls():
    probe = make_batch(pk=[1, 2], pv=[10, 20])
    build = make_batch(bk=[2], bv=[200])
    out = hash_join(probe, build, ["pk"], ["bk"], "left", [(1, 2)], capacity=8)
    n = int(out.num_rows)
    assert n == 2
    rows = sorted(zip(out["pv"].decode(n), out["bv"].decode(n)),
                  key=lambda r: r[0])
    assert rows[0] == (10, None)
    assert rows[1] == (20, 200)


def test_semi_anti_join():
    probe = make_batch(pk=[1, 2, 3], pv=[10, 20, 30])
    build = make_batch(bk=[2, 2])
    semi = hash_join(probe, build, ["pk"], ["bk"], "semi", [(1, 3)], capacity=8)
    anti = hash_join(probe, build, ["pk"], ["bk"], "anti", [(1, 3)], capacity=8)
    assert list(semi["pv"].decode(int(semi.num_rows))) == [20]
    assert sorted(anti["pv"].decode(int(anti.num_rows))) == [10, 30]


def test_anti_join_with_residual():
    # NOT EXISTS (... key match AND other <> x) shape, as in TPC-H Q21
    probe = make_batch(pk=[1, 1, 2], ps=[7, 8, 9])
    build = make_batch(bk=[1, 1, 2], bs=[7, 7, 9])
    res = call("<>", col("bs", BIGINT), col("ps", BIGINT))
    out = hash_join(probe, build, ["pk"], ["bk"], "anti", [(1, 2)],
                    capacity=16, residual=res)
    n = int(out.num_rows)
    # probe (1,7): build (1,7)x2 fail residual -> anti keeps
    # probe (1,8): build (1,7) passes -> dropped; probe (2,9): (2,9) fails -> kept
    assert sorted(zip(out["pk"].decode(n), out["ps"].decode(n))) == [(1, 7), (2, 9)]


def test_sort_desc_and_limit():
    b = make_batch(x=[3, 1, 2, 5, 4], y=[1.0, 2.0, 3.0, 4.0, 5.0])
    out = sort_batch(b, [SortKey(b["x"], ascending=False)], limit=3)
    assert list(out["x"].decode(3)) == [5, 4, 3]


def test_sort_multi_key_with_nulls():
    import jax.numpy as jnp

    b = make_batch(x=[1, 1, 2, 2], y=[5.0, 3.0, 8.0, 1.0])
    c = b["y"]
    c.validity = jnp.asarray([True, False, True, True])
    out = sort_batch(b, [SortKey(b["x"]), SortKey(c)])
    ys = list(out["y"].decode(4))
    xs = list(out["x"].decode(4))
    assert xs == [1, 1, 2, 2]
    assert ys[0] == 5.0 and ys[1] is None  # nulls last within x=1
    assert ys[2:] == [1.0, 8.0]


def test_case_and_3vl():
    b = make_batch(x=[1, 2, 3])
    e = call("case",
             call("=", col("x", BIGINT), lit(2)), lit(100),
             lit(0))
    out = eval_expr(e, b)
    assert list(out.decode(3)) == [0, 100, 0]


def test_extract_year():
    days = (np.array(["1992-01-01", "1998-12-31", "1995-06-17"],
                     dtype="datetime64[D]")
            - np.datetime64("1970-01-01", "D")).astype(np.int32)
    b = from_numpy({"d": days}, {"d": DATE})
    e = call("extract_year", col("d", DATE))
    out = eval_expr(e, b)
    assert list(out.decode(3)) == [1992, 1998, 1995]


def test_pallas_filter_sum_kernel_interpret():
    """Fused range-filter + product-sum kernel vs numpy (interpret mode)."""
    import jax.numpy as jnp

    from presto1_tpu.ops.kernels.filter_sum import range_filter_product_sum

    rng = np.random.RandomState(7)
    n = 10_000
    ship = rng.randint(8000, 10600, n).astype(np.int32)
    disc = rng.randint(0, 11, n).astype(np.int32)
    qty = rng.randint(100, 5000, n).astype(np.int32)
    price = rng.randint(90000, 10_000_000, n).astype(np.int32)
    bounds = jnp.asarray([8766, 9131, 5, 7, 2400], jnp.int32)
    s, c = range_filter_product_sum(
        jnp.asarray(ship), jnp.asarray(disc), jnp.asarray(qty),
        jnp.asarray(price), bounds, interpret=True)
    mask = ((ship >= 8766) & (ship < 9131) & (disc >= 5) & (disc <= 7)
            & (qty < 2400))
    assert int(s) == (price.astype(np.int64) * disc)[mask].sum()
    assert int(c) == mask.sum()


def test_union_all_and_distinct():
    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine

    e = Engine(TpchCatalog(sf=0.001))
    rows = e.sql(
        "select n_name v from nation where n_regionkey = 0 "
        "union all select r_name from region order by v limit 4").to_pylist()
    assert [r[0] for r in rows] == ["AFRICA", "ALGERIA", "AMERICA", "ASIA"]
    rows = e.sql(
        "select n_regionkey k from nation union "
        "select r_regionkey from region order by k").to_pylist()
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]


def test_scalar_functions():
    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine

    e = Engine(TpchCatalog(sf=0.001))
    row = e.sql(
        "select abs(-5) a, mod(7, 3) m, round(1.256, 2) r, sqrt(16.0) s, "
        "length(n_name) l, lower(n_name) lo, greatest(1, 2, 3) g, "
        "coalesce(n_nationkey, 0) c from nation where n_nationkey = 0"
    ).to_pylist()[0]
    assert row[0] == 5 and row[1] == 1 and float(row[2]) == 1.26
    assert row[3] == 4.0 and row[4] == 7 and row[5] == "algeria"
    assert row[6] == 3 and row[7] == 0


def test_full_outer_join():
    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine

    e = Engine(TpchCatalog(sf=0.001))
    out = e.sql(
        "select n_name, r_name from nation full outer join region "
        "on n_regionkey = r_regionkey and r_regionkey < 2 "
        "order by n_name nulls last, r_name").to_pylist()
    # 25 nations (those in regions >=2 null-extended) + 3 unmatched regions
    assert len(out) == 28
    assert sum(1 for r in out if r[0] is None) == 3
    assert sum(1 for r in out if r[1] is None) == 15


def test_multiword_join_keys():
    """Composite keys wider than 63 bits: mix-hash + exact verification."""
    from presto1_tpu.ops import hash_join as hj

    big = 1 << 40
    probe = make_batch(a=np.array([1, 2, 3, 2]) * big, b=[7, 8, 9, 8],
                       v=[10, 20, 30, 21])
    build = make_batch(c=np.array([2, 3]) * big, d=[8, 9], w=[200, 300])
    ranges = [(0, 3 * big), (0, 9)]
    out = hj(probe, build, ["a", "b"], ["c", "d"], "inner", ranges, 16)
    n = int(out.num_rows)
    assert sorted(zip(out["v"].decode(n), out["w"].decode(n))) == [
        (20, 200), (21, 200), (30, 300)]
    anti = hj(probe, build, ["a", "b"], ["c", "d"], "anti", ranges, 16)
    assert list(anti["v"].decode(int(anti.num_rows))) == [10]


def test_dynamic_filter_engages_and_matches():
    """Build-side min/max domain compacts the probe (inner/semi only) —
    DynamicFilterService analog; reference server/DynamicFilterService.java:95."""
    import numpy as np

    from presto1_tpu.exec.executor import Executor
    from presto1_tpu.exec.memory_catalog import MemoryTable
    from presto1_tpu.exec.catalog import Catalog
    from presto1_tpu.exec.engine import Engine
    from presto1_tpu.batch import from_numpy
    from presto1_tpu.types import BIGINT

    catalog = Catalog()
    rng = np.random.RandomState(7)
    fact = MemoryTable("fact", [("fk", BIGINT), ("v", BIGINT)])
    fact.append(from_numpy({
        "fk": rng.randint(0, 100000, 20000).astype(np.int64),
        "v": np.arange(20000, dtype=np.int64),
    }, {"fk": BIGINT, "v": BIGINT}))
    dim = MemoryTable("dim", [("k", BIGINT), ("w", BIGINT)])
    dim.append(from_numpy({
        "k": np.arange(500, 600, dtype=np.int64),
        "w": np.arange(100, dtype=np.int64),
    }, {"k": BIGINT, "w": BIGINT}))
    catalog.tables = {"fact": fact, "dim": dim}
    engine = Engine(catalog)

    out = engine.sql_pandas(
        "select count(*) as c, sum(v) as s from fact, dim where fk = k")
    fkv = np.asarray(fact.batch()["fk"].data)[:20000]
    vv = np.asarray(fact.batch()["v"].data)[:20000]
    m = (fkv >= 500) & (fkv < 600)
    assert int(out["c"][0]) == int(m.sum())
    assert int(out["s"][0]) == int(vv[m].sum())

    # the build-domain mask fused into the join: the eager capacity
    # guess starts from the MASKED probe count (~20 in-domain rows of
    # 20000), not the full probe size
    plan = engine.plan("select count(*) from fact, dim where fk = k")
    ex = Executor(catalog)
    ex.execute(plan)
    recs = [r for r in ex.record.values() if "probe_rows" in r]
    assert any(r["probe_rows"] <= 256 and r.get("capacity", 1 << 30) <= 1024
               for r in recs), recs

    # anti join keeps non-matching rows — df must NOT drop them
    out = engine.sql_pandas(
        "select count(*) as c from fact where fk not in (select k from dim)")
    assert int(out["c"][0]) == int((~m).sum())


def test_wide_compact_pair_packed_sort_matches():
    """TPU wide-compaction path: pair-packed variadic sort must agree with
    the CPU nonzero path on every dtype class (8-byte, 4-byte, small,
    validity-carrying, f64)."""
    import numpy as np
    import jax.numpy as jnp

    from presto1_tpu.batch import Column, RecordBatch
    from presto1_tpu.ops.common import backend_override
    from presto1_tpu.ops.filter import compact
    from presto1_tpu.types import (BIGINT, BOOLEAN, DATE, DOUBLE, INTEGER,
                                   VARCHAR, DecimalType)

    rng = np.random.RandomState(7)
    n = 70000  # > 65536 so the wide gate fires
    cols = {}
    cols["a"] = Column(jnp.asarray(rng.randint(0, 1 << 40, n)), BIGINT)
    cols["b"] = Column(jnp.asarray(rng.randn(n)), DOUBLE)
    cols["c"] = Column(jnp.asarray(rng.randint(0, 1 << 20, n)
                                   .astype(np.int32)), INTEGER)
    cols["d"] = Column(jnp.asarray(rng.randint(0, 9000, n)
                                   .astype(np.int32)), DATE)
    cols["e"] = Column(jnp.asarray(rng.randint(0, 3, n).astype(np.int32)),
                       VARCHAR, dictionary=np.array(["x", "y", "z"]))
    cols["f"] = Column(jnp.asarray(rng.randint(0, 2, n).astype(bool)),
                       BOOLEAN)
    cols["g"] = Column(jnp.asarray(rng.randint(-5000, 5000, n)), 
                       DecimalType(12, 2),
                       validity=jnp.asarray(rng.randint(0, 2, n)
                                            .astype(bool)))
    cols["h"] = Column(jnp.asarray(rng.randint(0, 100, n)), BIGINT,
                       validity=jnp.asarray(rng.randint(0, 2, n)
                                            .astype(bool)))
    cols["i"] = Column(jnp.asarray(rng.randn(n)), DOUBLE,
                       validity=jnp.asarray(rng.randint(0, 2, n)
                                            .astype(bool)))
    batch = RecordBatch(cols, n - 17)
    mask = jnp.asarray(rng.randint(0, 2, n).astype(bool))
    mask = mask & (jnp.arange(n) < batch.num_rows)

    expected = compact(batch, mask)          # CPU nonzero path
    with backend_override("tpu"):            # pair-packed sort path
        got = compact(batch, mask)
    assert int(got.num_rows) == int(expected.num_rows)
    m = int(expected.num_rows)
    for name in cols:
        ev, gv = expected[name], got[name]
        assert np.array_equal(np.asarray(ev.data[:m]),
                              np.asarray(gv.data[:m])), name
        if ev.validity is not None:
            assert np.array_equal(np.asarray(ev.validity[:m]),
                                  np.asarray(gv.validity[:m])), name
