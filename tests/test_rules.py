"""Iterative-optimizer rule tranche (iterative/rule/ analog): fired-rule
traces pinned on crafted plans, results validated against pandas."""

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.sql import parser as sql_parser
from presto1_tpu.sql.matching import CLEANUP_RULES, apply_rules
from presto1_tpu.sql.planner import Planner


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.01))


def _trace(engine, sql):
    """Raw plan (pre-cleanup) → fired rule names + final plan."""
    plan = Planner(engine.catalog).plan(sql_parser.parse(sql))
    trace = []
    out = apply_rules(plan, CLEANUP_RULES, trace=trace)
    return trace, out


def test_rule_library_breadth():
    assert len(CLEANUP_RULES) >= 15
    assert len({r.name for r in CLEANUP_RULES}) == len(CLEANUP_RULES)


def test_merge_limit_with_sort_becomes_topn(engine):
    trace, plan = _trace(engine,
                         "select * from (select l_orderkey from lineitem "
                         "order by l_orderkey) t limit 7")
    assert "MergeLimitWithSort" in trace
    from presto1_tpu.sql.logical import Sort

    sorts = [n for n in _walk(plan) if isinstance(n, Sort)]
    assert any(s.limit == 7 for s in sorts)
    out = engine.sql("select * from (select l_orderkey from lineitem "
                     "order by l_orderkey) t limit 7").to_pandas()
    assert len(out) == 7


def test_push_limit_through_left_join(engine):
    sql = ("select * from orders left join customer "
           "on o_custkey = c_custkey limit 5")
    trace, plan = _trace(engine, sql)
    assert "PushLimitThroughOuterJoin" in trace
    out = engine.sql(sql).to_pandas()
    assert len(out) == 5


def test_push_filter_and_limit_through_union(engine):
    sql = ("select * from (select l_orderkey k from lineitem "
           "union all select o_orderkey k from orders) t "
           "where k < 100 limit 9")
    trace, _ = _trace(engine, sql)
    assert "PushFilterThroughUnion" in trace
    assert "PushLimitThroughUnion" in trace
    out = engine.sql(sql).to_pandas()
    assert len(out) == 9 and (out.k < 100).all()


def test_push_topn_through_union(engine):
    sql = ("select k from (select l_orderkey k from lineitem "
           "union all select o_orderkey k from orders) t "
           "order by k desc limit 4")
    trace, _ = _trace(engine, sql)
    assert "PushTopNThroughUnion" in trace
    out = engine.sql(sql).to_pandas()
    li = engine.catalog.table("lineitem").batch(["l_orderkey"]).to_pandas()
    od = engine.catalog.table("orders").batch(["o_orderkey"]).to_pandas()
    allk = np.concatenate([li.l_orderkey.values, od.o_orderkey.values])
    exp = np.sort(allk)[::-1][:4]
    assert list(out.k) == list(exp)


def test_push_aggregation_through_union(engine):
    sql = ("select k % 10 g, count(*) c, sum(k) s, avg(k) a from "
           "(select l_orderkey k from lineitem "
           "union all select o_orderkey k from orders) t "
           "group by k % 10 order by g")
    trace, _ = _trace(engine, sql)
    assert "PushAggregationThroughUnion" in trace
    out = engine.sql(sql).to_pandas()
    li = engine.catalog.table("lineitem").batch(["l_orderkey"]).to_pandas()
    od = engine.catalog.table("orders").batch(["o_orderkey"]).to_pandas()
    import pandas as pd

    allk = pd.Series(np.concatenate([li.l_orderkey.values,
                                     od.o_orderkey.values]))
    exp = allk.groupby(allk % 10).agg(["count", "sum", "mean"])
    for g, c, s, a in zip(out.g, out.c, out.s, out.a):
        assert c == exp["count"][g] and s == exp["sum"][g]
        assert np.isclose(a, exp["mean"][g])


def test_remove_redundant_sort_over_global_agg(engine):
    sql = ("select * from (select sum(l_quantity) s from lineitem) t "
           "order by s")
    trace, plan = _trace(engine, sql)
    assert "RemoveRedundantSort" in trace
    from presto1_tpu.sql.logical import Sort

    assert not [n for n in _walk(plan) if isinstance(n, Sort)]


def test_merge_sorts_outer_wins(engine):
    sql = ("select * from (select l_orderkey k from lineitem "
           "order by k desc) t order by k")
    trace, plan = _trace(engine, sql)
    assert "MergeSorts" in trace
    from presto1_tpu.sql.logical import Sort

    sorts = [n for n in _walk(plan) if isinstance(n, Sort)]
    assert len(sorts) == 1
    out = engine.sql(sql).to_pandas()
    assert list(out.k) == sorted(out.k)


def test_remove_trivial_filter(engine):
    trace, plan = _trace(engine,
                         "select l_orderkey from lineitem where 1 = 1")
    from presto1_tpu.sql.logical import Filter

    # constant-folded TRUE predicate drops the Filter entirely
    if "RemoveTrivialFilter" in trace:
        assert not [n for n in _walk(plan) if isinstance(n, Filter)]
    out = engine.sql(
        "select count(*) c from lineitem where 1 = 1").to_pandas()
    exp = engine.sql("select count(*) c from lineitem").to_pandas()
    assert out.c[0] == exp.c[0]


def test_inline_projections(engine):
    sql = ("select x + 1 y from (select l_orderkey * 2 x from lineitem) t")
    trace, plan = _trace(engine, sql)
    assert "InlineProjections" in trace
    out = engine.sql(sql + " limit 3").to_pandas()
    li = engine.catalog.table("lineitem").batch(["l_orderkey"]).to_pandas()
    assert list(out.y) == list(li.l_orderkey.values[:3] * 2 + 1)


def _walk(node):
    yield node
    for c in node.children:
        yield from _walk(c)


def test_round5_rule_tranche_breadth():
    assert len(CLEANUP_RULES) >= 25


def test_merge_limit_with_topn(engine):
    sql = ("select * from (select l_orderkey from lineitem "
           "order by l_orderkey limit 100) t limit 7")
    trace, plan = _trace(engine, sql)
    assert "MergeLimitWithTopN" in trace
    from presto1_tpu.sql.logical import Sort

    sorts = [n for n in _walk(plan) if isinstance(n, Sort)]
    assert any(s.limit == 7 for s in sorts)
    assert len(engine.sql(sql).to_pandas()) == 7


def test_push_filter_through_project_and_sort(engine):
    sql = ("select * from (select l_orderkey k, l_quantity * 2 q "
           "from lineitem order by l_orderkey) t where q < 10")
    trace, plan = _trace(engine, sql)
    assert "PushFilterThroughProject" in trace
    assert "PushFilterThroughSort" in trace
    # the filter must end up BELOW the sort
    from presto1_tpu.sql.logical import Filter, Sort

    def depth_of(plan, ty):
        out = []

        def go(n, d):
            if isinstance(n, ty):
                out.append(d)
            for c in n.children:
                go(c, d + 1)
        go(plan, 0)
        return out

    assert min(depth_of(plan, Sort)) < max(depth_of(plan, Filter))
    out = engine.sql(sql).to_pandas()
    assert (out.q < 10).all()


def test_flatten_union(engine):
    sql = ("select count(*) c from ("
           "select l_orderkey k from lineitem union all "
           "select o_orderkey k from orders union all "
           "select c_custkey k from customer) t")
    trace, plan = _trace(engine, sql)
    from presto1_tpu.sql.logical import Union

    unions = [n for n in _walk(plan) if isinstance(n, Union)]
    if len(unions) == 1 and len(unions[0].inputs) == 3:
        pass  # planner already emits n-ary unions; rule is a no-op then
    else:
        assert "FlattenUnion" in trace
    out = engine.sql(sql).to_pandas()
    li = engine.sql("select count(*) c from lineitem").to_pandas().c[0]
    od = engine.sql("select count(*) c from orders").to_pandas().c[0]
    cu = engine.sql("select count(*) c from customer").to_pandas().c[0]
    assert int(out.c[0]) == int(li) + int(od) + int(cu)


def test_remove_redundant_distinct(engine):
    sql = ("select distinct o_orderpriority, c from ("
           "select o_orderpriority, count(*) c from orders "
           "group by o_orderpriority) t")
    trace, plan = _trace(engine, sql)
    assert "RemoveRedundantDistinct" in trace
    from presto1_tpu.sql.logical import Aggregate

    aggs = [n for n in _walk(plan) if isinstance(n, Aggregate)]
    assert len(aggs) == 1  # the distinct collapsed into a projection
    out = engine.sql(sql).to_pandas()
    assert len(out) == len(set(out.o_orderpriority))
