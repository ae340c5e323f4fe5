"""Type-system conformance: TIMESTAMP / REAL / CHAR / SMALLINT / TINYINT
(reference: spi/type/TimestampType.java, RealType.java, CharType.java,
SmallintType.java, TinyintType.java) — round-1 verdict item 6."""

import numpy as np
import pandas as pd
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_timestamp_literal_roundtrip(engine):
    out = engine.sql(
        "select timestamp '2020-03-15 12:34:56.789' ts").to_pandas()
    assert out.ts[0] == pd.Timestamp("2020-03-15 12:34:56.789")


def test_timestamp_time_fields(engine):
    out = engine.sql(
        "select hour(timestamp '2020-03-15 12:34:56.789') h, "
        "minute(timestamp '2020-03-15 12:34:56.789') m, "
        "second(timestamp '2020-03-15 12:34:56.789') s, "
        "millisecond(timestamp '2020-03-15 12:34:56.789') ms, "
        "year(timestamp '2020-03-15 12:34:56.789') y, "
        "day(timestamp '2020-03-15 12:34:56.789') d").to_pandas()
    assert list(out.iloc[0]) == [12, 34, 56, 789, 2020, 15]


def test_timestamp_trunc_add_diff(engine):
    out = engine.sql(
        "select date_trunc('hour', timestamp '2020-03-15 12:34:56') th, "
        "date_trunc('day', timestamp '2020-03-15 12:34:56') td, "
        "date_add('minute', 90, timestamp '2020-03-15 12:34:56') am, "
        "date_add('month', 1, timestamp '2020-01-31 08:00:00') amo, "
        "date_diff('hour', timestamp '2020-03-15 00:30:00', "
        "          timestamp '2020-03-15 12:34:56') dh").to_pandas()
    r = out.iloc[0]
    assert r.th == pd.Timestamp("2020-03-15 12:00:00")
    assert r.td == pd.Timestamp("2020-03-15 00:00:00")
    assert r.am == pd.Timestamp("2020-03-15 14:04:56")
    assert r.amo == pd.Timestamp("2020-02-29 08:00:00")  # clamped leap day
    assert r.dh == 12


def test_timestamp_date_comparison_coerces(engine):
    out = engine.sql(
        "select (timestamp '2020-03-15 12:00:00' > date '2020-03-15') a, "
        "(timestamp '2020-03-15 00:00:00' = date '2020-03-15') b, "
        "(date '2020-03-16' > timestamp '2020-03-15 23:59:59') c"
    ).to_pandas()
    assert list(out.iloc[0]) == [True, True, True]


def test_timestamp_casts(engine):
    out = engine.sql(
        "select cast(timestamp '2020-03-15 18:30:00' as date) d, "
        "cast(date '2020-03-15' as timestamp) ts").to_pandas()
    assert str(out.d[0])[:10] == "2020-03-15"
    assert out.ts[0] == pd.Timestamp("2020-03-15 00:00:00")


def test_timestamp_table_storage_and_agg(engine):
    engine.execute_statement(
        "create table events (id bigint, at timestamp)")
    engine.execute_statement(
        "insert into events values (1, timestamp '2021-06-01 10:00:00'), "
        "(2, timestamp '2021-06-01 11:30:00'), "
        "(3, timestamp '2021-05-31 23:59:59')")
    out = engine.sql(
        "select min(at) lo, max(at) hi, count(*) n from events").to_pandas()
    assert out.lo[0] == pd.Timestamp("2021-05-31 23:59:59")
    assert out.hi[0] == pd.Timestamp("2021-06-01 11:30:00")
    ordered = engine.sql(
        "select id from events order by at desc").to_pandas()
    assert list(ordered.id) == [2, 1, 3]
    grp = engine.sql(
        "select date_trunc('day', at) d, count(*) n from events "
        "group by date_trunc('day', at) order by d").to_pandas()
    assert list(grp.n) == [1, 2]
    engine.execute_statement("drop table events")


def test_real_type(engine):
    out = engine.sql(
        "select cast(1.5 as real) r, cast(1 as real) / cast(3 as real) d,"
        " cast(2.5 as real) + cast(0.25 as real) s").to_pandas()
    assert out.r[0] == np.float32(1.5)
    assert abs(out.d[0] - np.float32(1) / np.float32(3)) < 1e-7
    assert out.s[0] == np.float32(2.75)
    # real -> double promotion
    out = engine.sql(
        "select cast(1.5 as real) + cast(1.25 as double) x").to_pandas()
    assert out.x[0] == 2.75


def test_small_int_types(engine):
    out = engine.sql(
        "select cast(300 as smallint) s, cast(100 as tinyint) t, "
        "cast(100 as tinyint) + cast(100 as tinyint) u").to_pandas()
    assert out.s[0] == 300
    assert out.t[0] == 100
    # tinyint + tinyint stays int8 (device-repr wraparound: 200 -> -56)
    assert out.u[0] == -56


def test_char_table(engine):
    engine.execute_statement("create table codes (c char(2), v bigint)")
    engine.execute_statement(
        "insert into codes values ('US', 1), ('DE', 2), ('US', 3)")
    out = engine.sql(
        "select c, sum(v) s from codes where c = 'US' group by c"
    ).to_pandas()
    assert list(out.c) == ["US"]
    assert list(out.s) == [4]
    engine.execute_statement("drop table codes")


def test_parse_type_roundtrip():
    from presto1_tpu.types import (CharType, TimestampType, parse_type_str,
                                   REAL, SMALLINT, TINYINT)

    assert parse_type_str("timestamp(6)") == TimestampType(6)
    assert parse_type_str("timestamp") == TimestampType(3)
    assert parse_type_str("char(10)") == CharType(10)
    assert parse_type_str("real") == REAL
    assert parse_type_str("smallint") == SMALLINT
    assert parse_type_str("tinyint") == TINYINT
    for t in (TimestampType(6), CharType(10)):
        assert parse_type_str(str(t)) == t


def test_supertype_lattice():
    from presto1_tpu.types import (BIGINT, DATE, DOUBLE, INTEGER, REAL,
                                   SMALLINT, TIMESTAMP, TINYINT,
                                   common_supertype)

    assert common_supertype(TINYINT, SMALLINT) == SMALLINT
    assert common_supertype(SMALLINT, INTEGER) == INTEGER
    assert common_supertype(REAL, DOUBLE) == DOUBLE
    assert common_supertype(INTEGER, REAL) == REAL
    assert common_supertype(DATE, TIMESTAMP) == TIMESTAMP
    assert common_supertype(BIGINT, REAL) == REAL
