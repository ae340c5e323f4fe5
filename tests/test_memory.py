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
