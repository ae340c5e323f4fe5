"""System tables + blackhole connector (system/JMX/blackhole plugin analogs)."""

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture()
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_runtime_queries_reflect_history(engine):
    engine.sql("select count(*) from nation")
    engine.sql("select count(*) from region")
    out = engine.sql_pandas(
        "select state, count(*) c from system.runtime.queries "
        "group by state order by state")
    states = dict(zip(out.iloc[:, 0], out.iloc[:, 1]))
    # the two finished queries are visible (the in-flight one is RUNNING)
    assert states.get("FINISHED", 0) >= 2


def test_runtime_nodes_and_memory(engine):
    nodes = engine.sql_pandas("select node_id, state from system.runtime.nodes")
    assert len(nodes) == 1 and nodes.iloc[0, 1] == "active"
    mem = engine.sql_pandas(
        "select pool, reserved_bytes from system.runtime.memory")
    assert mem.iloc[0, 0] == "general"
    up = engine.sql_pandas("select uptime_s from system.runtime.uptime")
    assert float(up.iloc[0, 0]) >= 0.0


def test_failed_query_recorded(engine):
    with pytest.raises(Exception):
        engine.sql("select no_such_column from nation")
    out = engine.sql_pandas(
        "select count(*) from system.runtime.queries where state = 'FAILED'")
    assert int(out.iloc[0, 0]) >= 1


def test_blackhole_swallow_and_synthesize(engine):
    from presto1_tpu.exec.system_catalog import BlackholeTable
    from presto1_tpu.types import BIGINT, VARCHAR

    engine.catalog.tables["sink"] = BlackholeTable(
        "sink", [("x", BIGINT)], rows_per_scan=0)
    r = engine.execute_statement(
        "insert into sink select n_nationkey from nation")
    assert r.to_pylist()[0][0] == 25  # reported written, stored nowhere
    assert engine.sql_pandas("select count(*) from sink").iloc[0, 0] == 0

    engine.catalog.tables["synth"] = BlackholeTable(
        "synth", [("k", BIGINT), ("s", VARCHAR)], rows_per_scan=1000)
    out = engine.sql_pandas("select count(*) c, sum(k) s from synth")
    assert int(out["c"][0]) == 1000 and int(out["s"][0]) == 0


def test_runtime_metrics_table(engine):
    """Per-component counters/rates (airlift CounterStat/DistributionStat
    + trino-jmx analog): queryable via system.runtime.metrics."""
    engine.sql("select count(*) from nation")
    out = engine.sql(
        "select name, kind, total from system.runtime.metrics "
        "where name like 'engine.%' order by name").to_pandas()
    names = set(out.name)
    assert "engine.queries_completed" in names
    assert "engine.query_wall_s" in names
    row = out[out.name == "engine.queries_completed"].iloc[0]
    assert row.kind == "counter" and row.total >= 1
