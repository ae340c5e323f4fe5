"""Multiple distinct aggregates via the MarkDistinct rewrite
(reference: ``operator/MarkDistinctOperator.java``,
``iterative/rule/MultipleDistinctAggregationToMarkDistinct.java``) —
validated against pandas on TPC-H data and NULL-heavy memory tables."""

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.01))


@pytest.fixture(scope="module")
def li(engine):
    return engine.catalog.table("lineitem").batch(
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_returnflag", "l_linestatus"]).to_pandas()


def test_two_count_distinct_grouped(engine, li):
    out = engine.sql(
        "select l_returnflag f, count(distinct l_partkey) p, "
        "count(distinct l_suppkey) s from lineitem "
        "group by l_returnflag order by f").to_pandas()
    exp = li.groupby("l_returnflag").agg(
        p=("l_partkey", "nunique"), s=("l_suppkey", "nunique"))
    assert list(out.f) == sorted(exp.index)
    for f, p, s in zip(out.f, out.p, out.s):
        assert p == exp.p[f] and s == exp.s[f]


def test_three_distinct_global(engine, li):
    out = engine.sql(
        "select count(distinct l_partkey) p, count(distinct l_suppkey) s, "
        "count(distinct l_orderkey) o from lineitem").to_pandas()
    assert out.p[0] == li.l_partkey.nunique()
    assert out.s[0] == li.l_suppkey.nunique()
    assert out.o[0] == li.l_orderkey.nunique()


def test_distinct_mixed_with_plain(engine, li):
    out = engine.sql(
        "select l_linestatus f, count(distinct l_partkey) p, "
        "count(distinct l_suppkey) s, sum(l_quantity) q, count(*) c "
        "from lineitem group by l_linestatus order by f").to_pandas()
    exp = li.groupby("l_linestatus").agg(
        p=("l_partkey", "nunique"), s=("l_suppkey", "nunique"),
        q=("l_quantity", "sum"), c=("l_orderkey", "count"))
    for f, p, s, q, c in zip(out.f, out.p, out.s, out.q, out.c):
        assert p == exp.p[f] and s == exp.s[f] and c == exp.c[f]
        assert np.isclose(float(q), float(exp.q[f]))


def test_sum_avg_distinct(engine, li):
    out = engine.sql(
        "select l_returnflag f, sum(distinct l_quantity) sq, "
        "avg(distinct l_quantity) aq from lineitem "
        "group by l_returnflag order by f").to_pandas()
    for f, sq, aq in zip(out.f, out.sq, out.aq):
        uq = li[li.l_returnflag == f].l_quantity.unique().astype(float)
        assert np.isclose(float(sq), uq.sum())
        assert np.isclose(aq, uq.mean())


def test_same_arg_shares_marker(engine):
    plan = engine.plan(
        "select count(distinct l_partkey), sum(distinct l_partkey), "
        "count(distinct l_suppkey) from lineitem")
    from presto1_tpu.sql.logical import MarkDistinct

    mds = []

    def walk(n):
        if isinstance(n, MarkDistinct):
            mds.append(n)
        for c in n.children:
            walk(c)

    walk(plan)
    assert len(mds) == 1 and len(mds[0].markers) == 2


def test_multiple_approx_distinct_exact_fallback(engine, li):
    out = engine.sql(
        "select approx_distinct(l_partkey) p, approx_distinct(l_suppkey) s "
        "from lineitem").to_pandas()
    # several sketches collapse to the exact marker path
    assert out.p[0] == li.l_partkey.nunique()
    assert out.s[0] == li.l_suppkey.nunique()


def test_nulls_in_values_and_group():
    import jax.numpy as jnp

    from presto1_tpu.batch import Column, RecordBatch
    from presto1_tpu.exec.memory_catalog import MemoryTable
    from presto1_tpu.types import BIGINT

    eng = Engine(TpchCatalog(sf=0.001))
    rng = np.random.default_rng(7)
    n = 5000
    # -1 sentinels become NULL through nullif() in the query
    g = np.where(rng.random(n) < 0.1, -1,
                 rng.integers(0, 5, n)).astype(np.int64)
    a = np.where(rng.random(n) < 0.2, -1,
                 rng.integers(0, 40, n)).astype(np.int64)
    b = np.where(rng.random(n) < 0.2, -1,
                 rng.integers(0, 15, n)).astype(np.int64)
    t = MemoryTable("t", [("g", BIGINT), ("a", BIGINT), ("b", BIGINT)])
    t.append(RecordBatch(
        {"g": Column(jnp.asarray(g), BIGINT),
         "a": Column(jnp.asarray(a), BIGINT),
         "b": Column(jnp.asarray(b), BIGINT)}, n))
    eng.catalog.tables["t"] = t
    out = eng.sql(
        "select nullif(g, -1) gg, count(distinct nullif(a, -1)) ca, "
        "count(distinct nullif(b, -1)) cb from t "
        "group by nullif(g, -1) order by gg").to_pandas()
    import pandas as pd

    df = pd.DataFrame({"g": np.where(g == -1, np.nan, g),
                       "a": np.where(a == -1, np.nan, a),
                       "b": np.where(b == -1, np.nan, b)})
    exp = df.groupby("g", dropna=False).agg(ca=("a", "nunique"),
                                            cb=("b", "nunique"))
    assert len(out) == len(exp)
    for _, row in out.iterrows():
        isnull = row.gg is None or (isinstance(row.gg, float)
                                    and np.isnan(row.gg))
        key = np.nan if isnull else float(row.gg)
        assert row.ca == exp.ca[key] and row.cb == exp.cb[key]


def test_compiled_multiple_distinct(engine, li):
    cq = engine.compile(
        "select l_returnflag f, count(distinct l_partkey) p, "
        "count(distinct l_suppkey) s from lineitem group by l_returnflag")
    out = cq().to_pandas().sort_values("f")
    exp = li.groupby("l_returnflag").agg(
        p=("l_partkey", "nunique"), s=("l_suppkey", "nunique"))
    for f, p, s in zip(out.f, out.p, out.s):
        assert p == exp.p[f] and s == exp.s[f]
