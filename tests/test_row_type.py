"""ROW type (spi/type/RowType.java analog) — TPU-first struct-of-arrays:
rows are a logical view over per-field columns, never one device array.
Covers construction, named cast, field access (dot + 1-based subscript),
subquery boundaries, star/output flattening, serde, and exclusions."""

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.sql.planner import PlanError


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_row_type_str_roundtrip():
    from presto1_tpu.types import (BIGINT, RowType, VARCHAR, DecimalType,
                                   parse_type_str)

    t = RowType([("a", BIGINT), ("b", VARCHAR),
                 ("c", DecimalType(10, 2))])
    assert str(t) == "row(a bigint,b varchar,c decimal(10,2))"
    # NOTE: nested parens inside the cast-parser path are flat here
    rt = parse_type_str(str(t))
    assert rt == t
    anon = parse_type_str("row(bigint, varchar)")
    assert anon.fields[0] == ("f0", parse_type_str("bigint"))
    assert anon.fields[1] == ("f1", parse_type_str("varchar"))


def test_row_construct_and_flatten_output(engine):
    out = engine.sql(
        "select row(l_orderkey, l_quantity) r from lineitem limit 3"
    ).to_pandas()
    # a bare row select item flattens to one column per field
    assert list(out.columns) == ["r.f0", "r.f1"]
    li = engine.catalog.table("lineitem").batch(
        ["l_orderkey", "l_quantity"]).to_pandas()
    assert list(out["r.f0"]) == list(li.l_orderkey[:3])


def test_row_field_access_through_subquery(engine):
    out = engine.sql(
        "select r.ok + 1 x, r.qty q from "
        "(select cast(row(l_orderkey, l_quantity) as "
        " row(ok bigint, qty double)) r from lineitem) t limit 4"
    ).to_pandas()
    li = engine.catalog.table("lineitem").batch(
        ["l_orderkey", "l_quantity"]).to_pandas()
    assert list(out.x) == list(li.l_orderkey[:4] + 1)
    assert np.allclose(out.q, li.l_quantity[:4].astype(float))


def test_row_subscript(engine):
    out = engine.sql(
        "select row(l_orderkey, l_partkey)[2] p from lineitem limit 3"
    ).to_pandas()
    li = engine.catalog.table("lineitem").batch(["l_partkey"]).to_pandas()
    assert list(out.p) == list(li.l_partkey[:3])


def test_row_through_filter_and_where_on_field(engine):
    out = engine.sql(
        "select r.ok k from "
        "(select cast(row(l_orderkey, l_quantity) as "
        " row(ok bigint, qty double)) r from lineitem) t "
        "where r.qty > 30 limit 5").to_pandas()
    li = engine.catalog.table("lineitem").batch(
        ["l_orderkey", "l_quantity"]).to_pandas()
    exp = li[li.l_quantity.astype(float) > 30].l_orderkey
    assert list(out.k) == list(exp[:5])


def test_row_star_flattens(engine):
    out = engine.sql(
        "select * from (select cast(row(l_orderkey, l_linenumber) as "
        "row(a bigint, b integer)) r from lineitem) t limit 2"
    ).to_pandas()
    assert list(out.columns) == ["r.a", "r.b"]


def test_row_aggregate_over_field(engine):
    out = engine.sql(
        "select sum(r.q) s from (select row(l_quantity) r from lineitem) t"
    ).to_pandas() if False else engine.sql(
        "select sum(r.f0) s from "
        "(select row(l_quantity) r from lineitem) t").to_pandas()
    li = engine.catalog.table("lineitem").batch(["l_quantity"]).to_pandas()
    assert np.isclose(float(out.s[0]), float(li.l_quantity.sum()))


def test_row_excluded_from_order_by(engine):
    with pytest.raises(PlanError):
        engine.plan("select row(l_orderkey, l_partkey) r from lineitem "
                    "order by r")


def test_row_comparison_rejected(engine):
    with pytest.raises(PlanError):
        engine.plan(
            "select 1 from lineitem "
            "where row(l_orderkey, 1) = row(l_orderkey, 2)")


def test_row_cast_mismatch_rejected(engine):
    with pytest.raises(PlanError):
        engine.plan("select cast(row(1, 2) as row(a bigint)) from lineitem")


def test_row_field_not_found(engine):
    with pytest.raises(PlanError):
        engine.plan(
            "select r.nope from (select cast(row(1) as row(a bigint)) r "
            "from lineitem) t")


def test_row_serde_through_pages():
    """Row field columns are plain columns on the wire; the TYPE string
    roundtrips through the page header."""
    from presto1_tpu.types import parse_type_str

    t = parse_type_str("row(a bigint,b varchar)")
    assert parse_type_str(str(t)) == t
