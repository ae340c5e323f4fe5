"""Date/time function family (reference: operator/scalar/DateTimeFunctions
+ ExtractYear/Quarter/... — validated against pandas)."""

import numpy as np
import pandas as pd
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_extract_fields(engine):
    out = engine.sql(
        "select o_orderdate d, extract(year from o_orderdate) y, "
        "extract(month from o_orderdate) m, extract(day from o_orderdate) dd, "
        "extract(quarter from o_orderdate) q, extract(dow from o_orderdate) dw, "
        "extract(doy from o_orderdate) dy, extract(week from o_orderdate) wk "
        "from orders").to_pandas()
    d = pd.to_datetime(out.d)
    assert (out.y == d.dt.year).all()
    assert (out.m == d.dt.month).all()
    assert (out.dd == d.dt.day).all()
    assert (out.q == d.dt.quarter).all()
    assert (out.dw == d.dt.dayofweek + 1).all()  # ISO 1=Mon
    assert (out.dy == d.dt.dayofyear).all()
    assert (out.wk == d.dt.isocalendar().week.astype(int).values).all()


def test_scalar_aliases(engine):
    out = engine.sql(
        "select o_orderdate d, year(o_orderdate) y, month(o_orderdate) m, "
        "day(o_orderdate) dd, quarter(o_orderdate) q, "
        "week(o_orderdate) w, day_of_week(o_orderdate) dw "
        "from orders limit 500").to_pandas()
    d = pd.to_datetime(out.d)
    assert (out.y == d.dt.year).all() and (out.m == d.dt.month).all()
    assert (out.dd == d.dt.day).all() and (out.q == d.dt.quarter).all()


def test_date_trunc(engine):
    out = engine.sql(
        "select o_orderdate d, date_trunc('month', o_orderdate) tm, "
        "date_trunc('quarter', o_orderdate) tq, "
        "date_trunc('year', o_orderdate) ty, "
        "date_trunc('week', o_orderdate) tw from orders").to_pandas()
    d = pd.to_datetime(out.d)
    assert (pd.to_datetime(out.tm) == d.dt.to_period("M").dt.start_time).all()
    assert (pd.to_datetime(out.tq) == d.dt.to_period("Q").dt.start_time).all()
    assert (pd.to_datetime(out.ty) == d.dt.to_period("Y").dt.start_time).all()
    assert (pd.to_datetime(out.tw) ==
            d - pd.to_timedelta(d.dt.dayofweek, unit="D")).all()


def test_date_add_diff(engine):
    out = engine.sql(
        "select o_orderdate d, date_add('day', 45, o_orderdate) a45, "
        "date_add('month', 7, o_orderdate) am, "
        "date_add('year', -2, o_orderdate) ay, "
        "date_diff('day', o_orderdate, date '1998-12-31') dd, "
        "date_diff('month', o_orderdate, date '1998-12-31') dm "
        "from orders limit 1000").to_pandas()
    d = pd.to_datetime(out.d)
    assert (pd.to_datetime(out.a45) == d + pd.Timedelta(days=45)).all()
    assert (pd.to_datetime(out.am) == d + pd.DateOffset(months=7)).all()
    assert (pd.to_datetime(out.ay) == d - pd.DateOffset(years=2)).all()
    end = pd.Timestamp("1998-12-31")
    assert (out.dd == (end - d).dt.days).all()
    exp_dm = (1998 - d.dt.year) * 12 + (12 - d.dt.month) - (31 < d.dt.day)
    assert (out.dm == exp_dm).all()


def test_month_end_clamping(engine):
    out = engine.sql(
        "select date_add('month', 1, date '2000-01-31') a, "
        "date_add('month', 1, date '2000-01-29') b, "
        "date_add('year', 1, date '2000-02-29') c").to_pandas()
    assert str(np.datetime64(out.a[0], "D")) == "2000-02-29"
    assert str(np.datetime64(out.b[0], "D")) == "2000-02-29"
    assert str(np.datetime64(out.c[0], "D")) == "2001-02-28"


def test_current_date(engine):
    import time

    out = engine.sql("select current_date cd").to_pandas()
    assert str(np.datetime64(out.cd[0], "D")) == \
        str(np.datetime64(int(time.time() // 86400), "D"))


def test_first_class_interval_arithmetic(engine):
    """Round-5: date/timestamp ± INTERVAL on COLUMNS (not just literal
    folding), both interval kinds, plus interval values as outputs."""
    out = engine.sql_pandas(
        "select o_orderdate + interval '3' day d3, "
        "o_orderdate - interval '1' month m1, "
        "o_orderdate + interval '2' year y2 "
        "from orders limit 3")
    import pandas as pd

    base = engine.sql_pandas("select o_orderdate from orders limit 3")
    b = pd.to_datetime(base.o_orderdate)
    assert list(pd.to_datetime(out.d3)) == list(b + pd.Timedelta(days=3))
    assert list(pd.to_datetime(out.m1)) == list(b - pd.DateOffset(months=1))
    assert list(pd.to_datetime(out.y2)) == list(b + pd.DateOffset(years=2))
    # interval values project and render
    v = engine.sql_pandas(
        "select interval '36' hour h, interval '14' month m from region "
        "limit 1")
    assert v.h[0] == "1 12:00:00.000"
    assert v.m[0] == "1-2"
    # filters with column-side interval arithmetic
    c = engine.sql_pandas(
        "select count(*) c from orders "
        "where o_orderdate + interval '1' day > o_orderdate")
    total = engine.sql_pandas("select count(*) c from orders")
    assert int(c.c[0]) == int(total.c[0])
