"""SHOW/DESCRIBE metadata statements + OFFSET (reference: SHOW rewrites
over information_schema; OFFSET node)."""

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_show_tables_and_describe(engine):
    tables = list(engine.execute_statement("show tables").to_pandas().table)
    for t in ("lineitem", "orders", "customer", "nation"):
        assert t in tables
    desc = engine.execute_statement("describe nation").to_pandas()
    assert list(desc.column) == ["n_nationkey", "n_name", "n_regionkey",
                                 "n_comment"]
    assert list(desc.type)[:2] == ["bigint", "varchar"]
    desc2 = engine.execute_statement("show columns from region").to_pandas()
    assert list(desc2.column) == ["r_regionkey", "r_name", "r_comment"]


def test_show_session_and_functions(engine):
    ses = engine.execute_statement("show session").to_pandas()
    assert "spill_threshold" in set(ses.name)
    fns = engine.execute_statement("show functions").to_pandas()
    kinds = dict(zip(fns.function, fns.kind))
    assert kinds["sum"] == "aggregate"
    assert kinds["sqrt"] == "scalar"
    assert kinds["row_number"] == "window"


def test_offset_with_order_by(engine):
    out = engine.sql("select n_nationkey from nation "
                     "order by n_nationkey offset 20 limit 3").to_pandas()
    assert list(out.n_nationkey) == [20, 21, 22]
    out = engine.sql("select n_nationkey from nation "
                     "order by n_nationkey limit 3 offset 5").to_pandas()
    assert list(out.n_nationkey) == [5, 6, 7]
    # offset beyond the row count -> empty
    out = engine.sql("select n_nationkey from nation "
                     "order by n_nationkey offset 30").to_pandas()
    assert len(out) == 0


def test_offset_without_order(engine):
    out = engine.sql("select count(*) c from "
                     "(select o_orderkey from orders offset 100) t"
                     ).to_pandas()
    assert int(out.c[0]) == 1400


def test_offset_binds_to_whole_setop(engine):
    """'A UNION ALL B ... OFFSET n' skips over the combined result, not
    just the last branch (parser transfers offset to the SetOp alongside
    order_by/limit)."""
    out = engine.sql(
        "select n_nationkey k from nation where n_nationkey < 3 "
        "union all "
        "select n_nationkey from nation where n_nationkey >= 22 "
        "order by k offset 4"
    ).to_pandas()
    assert list(out["k"]) == [23, 24]
    # offset without order by, whole-setop scope: 25 + 25 rows, skip 47
    out = engine.sql(
        "select n_nationkey k from nation union all "
        "select n_nationkey from nation offset 47").to_pandas()
    assert len(out) == 3
