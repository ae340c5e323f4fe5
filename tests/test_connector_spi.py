"""Formal connector SPI (round-5: SURVEY §2.2 'Connector SPI' partial):
split enumeration drives the distributed scheduler, page sources stream
pages, page sinks commit atomically."""

import numpy as np
import pytest

from presto1_tpu.batch import from_numpy
from presto1_tpu.exec.catalog import Catalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.exec.memory_catalog import MemoryTable
from presto1_tpu.spi.connector import (
    Connector, ConnectorSplit, ConnectorSplitManager,
    FixedCountSplitManager, TablePageSource, split_manager_for,
)
from presto1_tpu.types import BIGINT


def _table(n=1000):
    t = MemoryTable("t", [("k", BIGINT), ("v", BIGINT)])
    t.append(from_numpy(
        {"k": np.arange(n, dtype=np.int64),
         "v": np.arange(n, dtype=np.int64) * 2},
        dict(k=BIGINT, v=BIGINT)))
    return t


def test_fixed_count_split_manager():
    t = _table()
    splits = FixedCountSplitManager().splits(t, 4)
    assert [s.index for s in splits] == [0, 1, 2, 3]
    assert all(s.count == 4 and s.table == "t" for s in splits)
    assert splits[0].to_wire() == {"index": 0, "count": 4}


def test_page_source_streams_all_rows():
    t = _table(1000)
    cat = Catalog()
    cat.tables["t"] = t
    conn = Connector(cat)
    total = 0
    seen = []
    for split in conn.split_manager.splits(t, 3):
        for page in conn.page_source(split).pages(["k", "v"],
                                                  page_rows=128):
            n = int(page.num_rows)
            total += n
            seen.extend(np.asarray(page["k"].data)[:n].tolist())
    assert total == 1000
    assert sorted(seen) == list(range(1000))


def test_page_sink_commits_atomically():
    t = _table(10)
    sink = t.page_sink()
    sink.append(from_numpy({"k": np.arange(5, dtype=np.int64),
                            "v": np.zeros(5, np.int64)},
                           dict(k=BIGINT, v=BIGINT)))
    assert t.num_rows == 10  # invisible until finish
    assert sink.finish() == 5
    assert t.num_rows == 15

    sink2 = t.page_sink()
    sink2.append(from_numpy({"k": np.arange(3, dtype=np.int64),
                             "v": np.zeros(3, np.int64)},
                            dict(k=BIGINT, v=BIGINT)))
    sink2.abort()
    assert t.num_rows == 15  # aborted pages never land


def test_insert_select_failure_leaves_table_untouched():
    cat = Catalog()
    cat.tables["t"] = _table(10)
    engine = Engine(cat)
    before = cat.table("t").num_rows
    with pytest.raises(Exception):
        engine.execute_statement(
            "insert into t select k, v from nonexistent")
    assert cat.table("t").num_rows == before
    engine.execute_statement("insert into t values (100, 200)")
    assert cat.table("t").num_rows == before + 1


def test_custom_split_manager_drives_scheduler():
    """An external connector's split manager controls the number of
    scan tasks the distributed scheduler creates."""
    from presto1_tpu.testing.dist_runner import MultiHostRunner

    class ThreeSplits(ConnectorSplitManager):
        def splits(self, table, desired):
            return [ConnectorSplit(table.name, i, 3) for i in range(3)]

    with MultiHostRunner(n_workers=2, catalog_spec="tpch:tiny") as runner:
        runner.engine.catalog.split_manager = ThreeSplits()
        assert isinstance(split_manager_for(runner.engine.catalog),
                          ThreeSplits)
        info = {}
        out = runner.engine.sql(
            "select count(*) c from lineitem where l_quantity < 10",
            info=info).to_pandas()
        # source stage task count follows the connector's splits
        assert info["stage1_tasks"] % 3 == 0 and info["stage1_tasks"] > 0, \
            info
        runner.engine.catalog.split_manager = None
        out2 = runner.engine.sql(
            "select count(*) c from lineitem where l_quantity < 10"
        ).to_pandas()
        assert int(out.c[0]) == int(out2.c[0])
