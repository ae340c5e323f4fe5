"""Client↔coordinator protocol tests (statement protocol over localhost,
the reference's TestQueuedStatementResource / client-protocol coverage)."""

import pytest

from presto1_tpu.client.http_client import Client, QueryFailed
from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.server.coordinator import CoordinatorServer


@pytest.fixture(scope="module")
def server():
    engine = Engine(TpchCatalog(sf=0.001))
    srv = CoordinatorServer(engine).start()
    yield srv
    srv.stop()


def test_statement_roundtrip(server):
    c = Client(f"http://127.0.0.1:{server.port}")
    cols, rows = c.execute(
        "select n_name, n_nationkey from nation order by n_nationkey limit 3")
    assert [col["name"] for col in cols] == ["n_name", "n_nationkey"]
    assert rows == [["ALGERIA", 0], ["ARGENTINA", 1], ["BRAZIL", 2]]


def test_statement_aggregation(server):
    c = Client(f"http://127.0.0.1:{server.port}")
    cols, rows = c.execute("select count(*) c from customer")
    assert rows[0][0] > 0


def test_statement_failure(server):
    c = Client(f"http://127.0.0.1:{server.port}")
    with pytest.raises(QueryFailed):
        c.execute("select bogus_column from nation")


def test_paged_results(server):
    c = Client(f"http://127.0.0.1:{server.port}")
    cols, rows = c.execute("select l_orderkey from lineitem")
    assert len(rows) > 1000  # > PAGE_ROWS -> exercises nextUri paging
    assert rows[0][0] >= 1


def test_explain_analyze_render():
    engine = Engine(TpchCatalog(sf=0.001))
    txt = engine.explain_analyze(
        "select count(*) from lineitem where l_quantity < 10")
    assert "Aggregate" in txt and "ms" in txt


def test_explain_analyze_compiled_path():
    """EXPLAIN ANALYZE on the COMPILED path (round-5 VERDICT item 6):
    per-fragment steady-state walls/rows/bytes, annotated at the
    fragment-root plan nodes — the attribution every reported benchmark
    number comes from."""
    from presto1_tpu.exec.session import Session

    s = Session()
    s.set("compile_queries", True)
    engine = Engine(TpchCatalog(sf=0.001), session=s)
    txt = engine.explain_analyze(
        "select o_orderpriority, count(*) c from orders, customer "
        "where o_custkey = c_custkey and c_acctbal > 0 "
        "group by o_orderpriority order by c desc")
    assert "compiled path" in txt and "fragments" in txt
    assert "MB out" in txt and "Join" in txt
    # fragment roots (Join/Aggregate/Sort) carry timings; the row counts
    # are real (orders join keeps only positive-balance customers)
    joins = [ln for ln in txt.splitlines() if "Join" in ln and "ms" in ln]
    assert joins, txt


def test_events():
    from presto1_tpu.exec.events import EventBus

    bus = EventBus()
    seen = []
    bus.register(seen.append)
    engine = Engine(TpchCatalog(sf=0.001), events=bus)
    engine.sql("select 1 x from region limit 1")
    kinds = [e.kind for e in seen]
    assert kinds == ["created", "completed"]


def test_explain_statement():
    engine = Engine(TpchCatalog(sf=0.001))
    out = engine.execute_statement(
        "explain select count(*) from lineitem where l_quantity < 10")
    text = "\n".join(r[0] for r in out.to_pylist())
    assert "Aggregate" in text and "Filter" in text
    out = engine.execute_statement("explain analyze select count(*) from region")
    assert out.num_rows >= 3


def test_compiled_plan_cache():
    from presto1_tpu.exec.session import Session

    s = Session()
    s.set("compile_queries", True)
    engine = Engine(TpchCatalog(sf=0.001), session=s)
    r1 = engine.sql("select count(*) c from orders").to_pylist()
    r2 = engine.sql("select count(*) c from orders").to_pylist()
    assert r1 == r2
    assert len(engine._compiled_cache) == 1
