"""TIMESTAMP WITH TIME ZONE.

Reference: ``spi/type/TimestampWithTimeZoneType`` +
``spi/type/DateTimeEncoding.java`` (packed millis<<12 | zoneKey per
value, unpacked for every comparison).  TPU-first re-design: the device
array is plain UTC int64 micros (directly comparable — no unpacking on
device, instants sort/join/compare natively) and the zone is COLUMN
metadata (a fixed offset on the type), so AT TIME ZONE is a pure type
rewrite.  Fixed-offset zones + UTC only; named DST zones rejected at
plan time (documented, PARITY.md)."""

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def one(engine, expr):
    out = engine.sql(f"select {expr} x").to_pandas()
    return out.x[0]


def test_zoned_literal_renders_local(engine):
    assert one(engine, "timestamp '2020-03-01 10:30:00 +05:30'") == \
        "2020-03-01 10:30:00.000000 +05:30"


def test_at_time_zone_preserves_instant(engine):
    assert one(engine, "timestamp '2020-03-01 10:30:00 +05:30' "
                       "at time zone 'UTC'") == \
        "2020-03-01 05:00:00.000000 +00:00"
    assert one(engine, "timestamp '2020-03-01 05:00:00' "
                       "at time zone '-08:00'") == \
        "2020-02-29 21:00:00.000000 -08:00"


def test_civil_fields_read_in_zone(engine):
    assert one(engine, "hour(timestamp '2020-03-01 10:30:00 +05:30')") == 10
    assert one(engine, "hour(timestamp '2020-03-01 10:30:00 +05:30' "
                       "at time zone 'UTC')") == 5
    assert one(engine, "day(timestamp '2020-03-01 01:30:00 +05:30' "
                       "at time zone 'UTC')") == 29  # feb 29 utc


def test_date_trunc_in_civil_frame(engine):
    assert one(engine, "date_trunc('day', "
                       "timestamp '2020-03-01 01:30:00 +05:30')") == \
        "2020-03-01 00:00:00.000000 +05:30"


def test_cross_zone_comparison_is_instant(engine):
    assert bool(one(engine, "timestamp '2020-03-01 10:30:00 +05:30' = "
                            "timestamp '2020-03-01 05:00:00 UTC'"))
    # naive timestamps are session-zone (UTC) instants
    assert not bool(one(engine, "timestamp '2020-03-01 10:30:00' < "
                                "timestamp '2020-03-01 10:30:00 +05:30'"))


def test_cast_to_naive_gives_local(engine):
    got = str(one(engine, "cast(timestamp '2020-03-01 10:30:00 +05:30' "
                          "as timestamp)")).replace("T", " ")
    assert got.startswith("2020-03-01 10:30:00")


def test_named_dst_zone_rejected(engine):
    from presto1_tpu.sql.planner import PlanError

    with pytest.raises((PlanError, Exception)) as ei:
        engine.sql("select timestamp '2020-01-01 00:00:00' "
                   "at time zone 'America/New_York'")
    assert "time zone" in str(ei.value)


def test_current_timestamp_is_zoned(engine):
    got = one(engine, "current_timestamp")
    assert str(got).endswith("+00:00")


def test_string_date_casts(engine):
    assert str(one(engine, "cast('2020-01-01' as date)")).startswith(
        "2020-01-01")
    assert str(one(engine, "cast('2020-01-01 12:00:00' as timestamp)")
               ).replace("T", " ").startswith("2020-01-01 12:00:00")
