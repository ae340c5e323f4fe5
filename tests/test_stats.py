"""Cost-model statistics derivation (reference: cost/FilterStatsCalculator,
JoinStatsRule, AggregationStatsRule over spi/statistics column stats)."""

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.sql.stats import derive
from presto1_tpu.sql.logical import Join
from presto1_tpu.tpcds.catalog import TpcdsCatalog


@pytest.fixture(scope="module")
def eng():
    return Engine(TpchCatalog(sf=1.0))


def _plan_below_output(e, sql):
    p = e.plan(sql)
    while p.children and type(p).__name__ in ("Output", "Sort", "Limit"):
        p = p.children[0]
    return p


def test_scan_rows_exact(eng):
    st = derive(_plan_below_output(eng, "select l_orderkey from lineitem"),
                eng.catalog)
    assert st.rows == pytest.approx(6_002_010, rel=0.01)


def test_filter_range_selectivity(eng):
    # one year out of ~7 of shipdates -> ~1/7 of lineitem
    st = derive(_plan_below_output(
        eng, "select l_orderkey from lineitem "
        "where l_shipdate >= date '1994-01-01' "
        "and l_shipdate < date '1995-01-01'"), eng.catalog)
    assert 0.10 * 6e6 < st.rows < 0.20 * 6e6


def test_filter_equality_ndv(eng):
    # l_returnflag has ndv 3 -> ~1/3 of rows
    st = derive(_plan_below_output(
        eng, "select l_orderkey from lineitem where l_returnflag = 'R'"),
        eng.catalog)
    assert 0.2 * 6e6 < st.rows < 0.5 * 6e6


def test_join_ndv_estimate(eng):
    # lineitem x orders on orderkey: |L||R|/ndv(orderkey) ~ |L|
    st = derive(_plan_below_output(
        eng, "select l_orderkey from lineitem, orders "
        "where l_orderkey = o_orderkey"), eng.catalog)
    assert 0.5 * 6e6 < st.rows < 2.0 * 6e6


def test_group_ndv_estimate(eng):
    st = derive(_plan_below_output(
        eng, "select l_returnflag, l_linestatus, count(*) c from lineitem "
        "group by l_returnflag, l_linestatus"), eng.catalog)
    assert st.rows <= 6.0 + 1  # 3 x 2 groups


def test_filtered_dimension_becomes_broadcastable(eng):
    """The stats pipeline must see a FILTERED date-like dimension as small
    — driving broadcast distribution without per-query hints."""
    from presto1_tpu.sql.optimizer import _estimate

    plan = _plan_below_output(
        eng, "select o_orderkey from orders "
        "where o_orderdate >= date '1998-01-01'")
    est = _estimate(plan, eng.catalog)
    assert est < 0.25 * 1_500_000  # ~8% of the 6.5-year span


def test_tpcds_q7_class_join_order():
    """TPC-DS q7 shape (round-2 verdict item 7's bar): the d_year filter
    must shrink date_dim's estimate ~200x, making it the FIRST build side
    against the fact table, and every join must put its smaller estimated
    side on the build (right) — no TPC-H-specific hints involved."""
    from presto1_tpu.sql.optimizer import _estimate

    e = Engine(TpcdsCatalog(sf=1.0))
    plan = e.plan(
        "select i_item_sk, avg(ss_quantity) a from store_sales, "
        "customer_demographics, date_dim, item "
        "where ss_sold_date_sk = d_date_sk and ss_item_sk = i_item_sk "
        "and ss_cdemo_sk = cd_demo_sk and d_year = 2000 "
        "group by i_item_sk")

    joins = []

    def walk(n):
        if isinstance(n, Join):
            joins.append(n)
        for c in n.children:
            walk(c)

    walk(plan)
    assert len(joins) == 3

    def tables(n):
        out = []

        def w(x):
            if type(x).__name__ == "Scan":
                out.append(x.table)
            for c in x.children:
                w(c)
        w(n)
        return out

    for j in joins:
        # cost-based orientation: the build side is smaller OR provably
        # unique (PK builds probe expansion-free — the cost comparator
        # prefers them even when somewhat larger)
        assert j.build_unique or _estimate(j.right, e.catalog) <= \
            _estimate(j.left, e.catalog), tables(j.right)
        if tables(j.right) == ["date_dim"]:
            # the filtered dimension is tiny and joins the fact FIRST
            assert _estimate(j.right, e.catalog) < 1000
            assert tables(j.left) == ["store_sales"]
