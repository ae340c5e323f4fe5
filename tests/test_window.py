"""Window-function tests (the WindowOperator analog)."""

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_row_number_and_rank(engine):
    out = engine.sql(
        "select n_regionkey r, n_name, "
        "row_number() over (partition by n_regionkey order by n_name) rn, "
        "rank() over (partition by n_regionkey order by n_name) rk "
        "from nation order by r, rn").to_pandas()
    # within each region the row numbers are 1..5 over sorted names
    for r, grp in out.groupby("r"):
        assert list(grp.rn) == list(range(1, len(grp) + 1))
        assert list(grp.n_name) == sorted(grp.n_name)
        assert list(grp.rk) == list(grp.rn)  # names unique -> rank == rn


def test_running_sum_matches_pandas(engine):
    out = engine.sql(
        "select o_custkey, o_orderdate, "
        "sum(o_totalprice) over (partition by o_custkey order by o_orderdate) rs, "
        "o_totalprice "
        "from orders").to_pandas()
    df = engine.catalog.table("orders").batch(
        ["o_custkey", "o_orderdate", "o_totalprice"]).to_pandas()
    # SQL RANGE frame: peers (equal orderdate) share the running value
    exp = df.sort_values(["o_custkey", "o_orderdate"]).copy()
    exp["rs"] = exp.groupby(["o_custkey", "o_orderdate"])\
        .o_totalprice.transform("sum")
    exp["rs"] = exp.groupby("o_custkey").rs.apply(
        lambda s: s.groupby(level=0).first()).values if False else exp["rs"]
    exp2 = df.sort_values(["o_custkey", "o_orderdate"])
    run = exp2.groupby("o_custkey").o_totalprice.cumsum()
    peer_tot = exp2.groupby(["o_custkey", "o_orderdate"])\
        .o_totalprice.transform("sum")
    peer_cum_first = run - exp2.groupby(["o_custkey", "o_orderdate"])\
        .o_totalprice.cumsum() + peer_tot
    expmap = {}
    for (ck, od), v in zip(
            zip(exp2.o_custkey, exp2.o_orderdate), peer_cum_first):
        expmap[(ck, od)] = v
    got = {(r.o_custkey, r.o_orderdate): r.rs for r in out.itertuples()}
    for k, v in got.items():
        assert abs(v - expmap[k]) < 1e-6, (k, v, expmap[k])


def test_partition_total_no_order(engine):
    out = engine.sql(
        "select c_nationkey, c_acctbal, "
        "sum(c_acctbal) over (partition by c_nationkey) tot, "
        "count(*) over (partition by c_nationkey) cnt "
        "from customer").to_pandas()
    df = engine.catalog.table("customer").batch(
        ["c_nationkey", "c_acctbal"]).to_pandas()
    tot = df.groupby("c_nationkey").c_acctbal.sum()
    cnt = df.groupby("c_nationkey").c_acctbal.size()
    for r in out.itertuples():
        assert abs(r.tot - tot[r.c_nationkey]) < 1e-6
        assert r.cnt == cnt[r.c_nationkey]


def test_window_min_max(engine):
    out = engine.sql(
        "select n_regionkey r, n_nationkey k, "
        "min(n_nationkey) over (partition by n_regionkey order by n_nationkey) mn, "
        "max(n_nationkey) over (partition by n_regionkey) mx "
        "from nation").to_pandas()
    df = engine.catalog.table("nation").batch(
        ["n_regionkey", "n_nationkey"]).to_pandas()
    mx = df.groupby("n_regionkey").n_nationkey.max()
    mn = df.groupby("n_regionkey").n_nationkey.min()
    for r in out.itertuples():
        assert r.mx == mx[r.r]
        assert r.mn == mn[r.r]  # running min ordered by key = global min
