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


def _orders_df(engine):
    return engine.catalog.table("orders").batch(
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]).to_pandas()


def test_lag_lead(engine):
    out = engine.sql(
        "select o_orderkey, o_custkey, o_orderdate, "
        "lag(o_totalprice) over (partition by o_custkey order by o_orderkey) lg, "
        "lead(o_totalprice, 2) over (partition by o_custkey order by o_orderkey) ld, "
        "lag(o_totalprice, 1, -1.0) over (partition by o_custkey order by o_orderkey) lgd "
        "from orders").to_pandas()
    df = _orders_df(engine).sort_values(["o_custkey", "o_orderkey"])
    g = df.groupby("o_custkey").o_totalprice
    exp_lg = g.shift(1)
    exp_ld = g.shift(-2)
    key = list(zip(df.o_custkey, df.o_orderkey))
    m_lg = dict(zip(key, exp_lg))
    m_ld = dict(zip(key, exp_ld))
    for r in out.itertuples():
        k = (r.o_custkey, r.o_orderkey)
        e = m_lg[k]
        if e != e:  # NaN -> SQL NULL
            assert r.lg is None
            assert abs(r.lgd - (-1.0)) < 1e-9  # default fills
        else:
            assert abs(r.lg - e) < 1e-6
            assert abs(r.lgd - e) < 1e-6
        e = m_ld[k]
        if e != e:
            assert r.ld is None
        else:
            assert abs(r.ld - e) < 1e-6


def test_first_last_nth_value(engine):
    out = engine.sql(
        "select o_custkey, o_orderkey, "
        "first_value(o_totalprice) over (partition by o_custkey order by o_orderkey) fv, "
        "last_value(o_totalprice) over (partition by o_custkey order by o_orderkey "
        "  rows between unbounded preceding and unbounded following) lv, "
        "nth_value(o_totalprice, 2) over (partition by o_custkey order by o_orderkey "
        "  rows between unbounded preceding and unbounded following) nv "
        "from orders").to_pandas()
    df = _orders_df(engine).sort_values(["o_custkey", "o_orderkey"])
    for ck, grp in df.groupby("o_custkey"):
        rows = out[out.o_custkey == ck]
        prices = list(grp.o_totalprice)
        assert np.allclose(rows.fv, prices[0])
        assert np.allclose(rows.lv, prices[-1])
        if len(prices) >= 2:
            assert np.allclose(rows.nv.astype(float), prices[1])
        else:
            assert all(v is None for v in rows.nv)


def test_ntile(engine):
    out = engine.sql(
        "select o_orderkey, "
        "ntile(4) over (order by o_orderkey) nt from orders").to_pandas()
    n = len(out)
    out = out.sort_values("o_orderkey")
    q, r = divmod(n, 4)
    sizes = [q + 1] * r + [q] * (4 - r)
    exp = np.concatenate([np.full(s, i + 1) for i, s in enumerate(sizes)])
    assert (out.nt.values == exp).all()


def test_rows_frame_sliding_sum_and_min(engine):
    out = engine.sql(
        "select o_custkey, o_orderkey, "
        "sum(o_totalprice) over (partition by o_custkey order by o_orderkey "
        "  rows between 2 preceding and current row) ms, "
        "min(o_totalprice) over (partition by o_custkey order by o_orderkey "
        "  rows between 1 preceding and 1 following) mn, "
        "max(o_totalprice) over (partition by o_custkey order by o_orderkey "
        "  rows 3 preceding) mx "
        "from orders").to_pandas()
    df = _orders_df(engine).sort_values(["o_custkey", "o_orderkey"])
    g = df.groupby("o_custkey").o_totalprice
    exp_ms = g.rolling(3, min_periods=1).sum().reset_index(drop=True)
    exp_mn = g.rolling(3, min_periods=1, center=True).min().reset_index(drop=True)
    exp_mx = g.rolling(4, min_periods=1).max().reset_index(drop=True)
    key = list(zip(df.o_custkey, df.o_orderkey))
    got = {(r.o_custkey, r.o_orderkey): (r.ms, r.mn, r.mx)
           for r in out.itertuples()}
    for k, ems, emn, emx in zip(key, exp_ms, exp_mn, exp_mx):
        gms, gmn, gmx = got[k]
        assert abs(gms - ems) < 1e-6, (k, gms, ems)
        assert abs(gmn - emn) < 1e-6, (k, gmn, emn)
        assert abs(gmx - emx) < 1e-6, (k, gmx, emx)


def test_empty_frame_is_null(engine):
    out = engine.sql(
        "select o_orderkey, "
        "sum(o_totalprice) over (order by o_orderkey "
        "  rows between 3 following and 2 following) s, "
        "count(*) over (order by o_orderkey "
        "  rows between 3 following and 2 following) c "
        "from orders limit 5").to_pandas()
    assert all(v is None for v in out.s)
    assert (out.c == 0).all()


def test_dense_rank_and_frame_defaults(engine):
    out = engine.sql(
        "select l_orderkey, l_quantity, "
        "dense_rank() over (order by l_quantity) dr "
        "from lineitem").to_pandas()
    df = out.sort_values("l_quantity")
    qs = sorted(set(df.l_quantity))
    rank_of = {q: i + 1 for i, q in enumerate(qs)}
    assert all(rank_of[q] == d for q, d in zip(out.l_quantity, out.dr))


def test_percent_rank_and_cume_dist(engine):
    out = engine.sql(
        "select o_custkey k, o_totalprice p, "
        "percent_rank() over (partition by o_custkey order by o_totalprice) pr, "
        "cume_dist() over (partition by o_custkey order by o_totalprice) cd "
        "from orders where o_custkey < 50").to_pandas()
    df = engine.catalog.table("orders").batch(
        ["o_custkey", "o_totalprice"]).to_pandas()
    df = df[df.o_custkey < 50]
    exp_pr = df.groupby("o_custkey").o_totalprice.rank(method="min")
    sizes = df.groupby("o_custkey").o_totalprice.transform("size")
    exp_pr = np.where(sizes > 1, (exp_pr - 1) / (sizes - 1).clip(lower=1), 0.0)
    exp_cd = df.groupby("o_custkey").o_totalprice.rank(method="max") / sizes
    got = out.sort_values(["k", "p"]).reset_index(drop=True)
    ref = df.assign(pr=exp_pr, cd=exp_cd).sort_values(
        ["o_custkey", "o_totalprice"]).reset_index(drop=True)
    assert np.allclose(got.pr.to_numpy(), ref.pr.to_numpy())
    assert np.allclose(got.cd.to_numpy(), ref.cd.to_numpy())


def test_percent_rank_single_row_partition(engine):
    out = engine.sql(
        "select n_nationkey, "
        "percent_rank() over (partition by n_nationkey) pr, "
        "cume_dist() over (partition by n_nationkey) cd "
        "from nation").to_pandas()
    assert (out.pr == 0.0).all()
    assert (out.cd == 1.0).all()
