"""Writable memory-table tests (the trino-memory connector analog)."""

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture()
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_create_insert_select(engine):
    engine.execute_statement(
        "create table t (k bigint, name varchar, price decimal(10,2))")
    engine.execute_statement(
        "insert into t values (1, 'ann', 9.50), (2, 'bob', 1.25)")
    engine.execute_statement("insert into t values (3, 'cy', -4.75)")
    out = engine.execute_statement(
        "select k, name, price from t order by k")
    rows = out.to_pylist()
    assert rows == [(1, "ann", 9.50), (2, "bob", 1.25), (3, "cy", -4.75)]
    agg = engine.execute_statement("select sum(price) s, count(*) c from t")
    s, c = agg.to_pylist()[0]
    assert c == 3 and s == pytest.approx(6.0)


def test_ctas_and_join(engine):
    engine.execute_statement(
        "create table topn as select n_nationkey k, n_name v from nation "
        "where n_regionkey = 1")
    out = engine.execute_statement(
        "select count(*) c from customer, topn where c_nationkey = k")
    assert out.to_pylist()[0][0] > 0


def test_insert_from_query(engine):
    engine.execute_statement("create table sink (k bigint)")
    r = engine.execute_statement(
        "insert into sink select o_orderkey from orders where o_orderkey < 100")
    inserted = r.to_pylist()[0][0]
    back = engine.execute_statement("select count(*) from sink")
    assert back.to_pylist()[0][0] == inserted > 0


def test_drop(engine):
    engine.execute_statement("create table gone (x bigint)")
    engine.execute_statement("drop table gone")
    with pytest.raises(Exception):
        engine.execute_statement("select * from gone")


# ---- memory management (pools, limits, low-memory killer) ----
# reference: lib/trino-memory-context, memory/MemoryPool.java,
# memory/TotalReservationOnBlockedNodesLowMemoryKiller.java


def test_query_max_memory_enforced():
    from presto1_tpu.exec.memory import ExceededMemoryLimitError
    from presto1_tpu.exec.session import Session

    sess = Session()
    sess.set("query_max_memory", 1024)  # 1 KB: any scan blows it
    engine = Engine(TpchCatalog(sf=0.001), session=sess)
    with pytest.raises(ExceededMemoryLimitError):
        engine.sql("select count(*) from lineitem")


def test_query_within_limit_succeeds_and_tracks_peak():
    from presto1_tpu.exec.executor import Executor
    from presto1_tpu.exec.memory import QueryMemoryContext

    engine = Engine(TpchCatalog(sf=0.001))
    plan = engine.plan("select sum(l_quantity) from lineitem "
                       "where l_shipdate < date '1995-01-01'")
    ctx = QueryMemoryContext("q1", max_bytes=1 << 30)
    Executor(engine.catalog, memory=ctx).execute(plan)
    assert ctx.peak > 0
    ctx.release_all()
    assert ctx.current == 0


def test_pool_low_memory_killer():
    from presto1_tpu.exec.memory import (
        ExceededMemoryLimitError, MemoryPool, QueryMemoryContext,
        QueryKilledError,
    )

    pool = MemoryPool(capacity_bytes=1000)
    big = QueryMemoryContext("big", pool=pool)
    small = QueryMemoryContext("small", pool=pool)
    pool.register(big)
    pool.register(small)
    big.set_bytes((0,), 700)
    small.set_bytes((0,), 200)
    # small asks for more than remains: the killer targets the LARGEST query
    small.set_bytes((1,), 300)
    assert big.killed is not None
    assert small.killed is None
    with pytest.raises(QueryKilledError):
        big.set_bytes((1,), 1)
    # a single query larger than the pool is its own victim
    pool2 = MemoryPool(capacity_bytes=100)
    solo = QueryMemoryContext("solo", pool=pool2)
    pool2.register(solo)
    with pytest.raises(ExceededMemoryLimitError):
        solo.set_bytes((0,), 500)


def test_children_freed_on_parent_materialise():
    from presto1_tpu.exec.memory import QueryMemoryContext

    ctx = QueryMemoryContext("q")
    ctx.set_bytes((0, 0, 0), 100)
    ctx.set_bytes((0, 0, 1), 50)
    assert ctx.current == 150
    ctx.set_bytes((0, 0), 80)  # parent consumes both children
    assert ctx.current == 80
    assert ctx.peak == 150 + 80 - 80 + 0 or ctx.peak >= 150
