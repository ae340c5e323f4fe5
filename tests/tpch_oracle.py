"""Pandas oracle for the 22 TPC-H queries.

The correctness-oracle role the reference gives H2
(``testing/trino-testing/.../H2QueryRunner.java`` +
``QueryAssertions.assertQuery``): an independent implementation executes the
same query over the same data and results are compared row-for-row.
"""

import numpy as np
import pandas as pd


def D(s):
    return np.datetime64(s, "D")


def rev(df):
    return df.l_extendedprice * (1 - df.l_discount)


def q1(t):
    li = t["lineitem"]
    d = li[li.l_shipdate <= D("1998-09-02")]
    g = d.groupby(["l_returnflag", "l_linestatus"], as_index=False).apply(
        lambda x: pd.Series({
            "sum_qty": x.l_quantity.sum(),
            "sum_base_price": x.l_extendedprice.sum(),
            "sum_disc_price": (x.l_extendedprice * (1 - x.l_discount)).sum(),
            "sum_charge": (x.l_extendedprice * (1 - x.l_discount)
                           * (1 + x.l_tax)).sum(),
            "avg_qty": x.l_quantity.mean(),
            "avg_price": x.l_extendedprice.mean(),
            "avg_disc": x.l_discount.mean(),
            "count_order": float(len(x)),
        }), include_groups=False)
    return g.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q2(t):
    p, s, ps, n, r = (t["part"], t["supplier"], t["partsupp"], t["nation"],
                      t["region"])
    eu = r[r.r_name == "EUROPE"]
    nat = n.merge(eu, left_on="n_regionkey", right_on="r_regionkey")
    sup = s.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    j = ps.merge(sup, left_on="ps_suppkey", right_on="s_suppkey")
    minc = j.groupby("ps_partkey", as_index=False).ps_supplycost.min() \
        .rename(columns={"ps_supplycost": "minc"})
    pp = p[(p.p_size == 15) & p.p_type.str.endswith("BRASS")]
    out = pp.merge(j, left_on="p_partkey", right_on="ps_partkey")
    out = out.merge(minc, on="ps_partkey")
    out = out[out.ps_supplycost == out.minc]
    out = out[["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
               "s_address", "s_phone", "s_comment"]]
    out = out.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                          ascending=[False, True, True, True]).head(100)
    return out.reset_index(drop=True)


def q3(t):
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    c = c[c.c_mktsegment == "BUILDING"]
    o = o[o.o_orderdate < D("1995-03-15")]
    li = li[li.l_shipdate > D("1995-03-15")]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey") \
          .merge(c, left_on="o_custkey", right_on="c_custkey")
    j["revenue"] = rev(j)
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"],
                  as_index=False).revenue.sum()
    g = g[["l_orderkey", "revenue", "o_orderdate", "o_shippriority"]]
    return g.sort_values(["revenue", "o_orderdate"],
                         ascending=[False, True]).head(10).reset_index(drop=True)


def q4(t):
    o, li = t["orders"], t["lineitem"]
    o = o[(o.o_orderdate >= D("1993-07-01")) & (o.o_orderdate < D("1993-10-01"))]
    ok = li[li.l_commitdate < li.l_receiptdate].l_orderkey.unique()
    o = o[o.o_orderkey.isin(ok)]
    g = o.groupby("o_orderpriority", as_index=False).size() \
         .rename(columns={"size": "order_count"})
    return g.sort_values("o_orderpriority").reset_index(drop=True)


def q5(t):
    c, o, li, s, n, r = (t["customer"], t["orders"], t["lineitem"],
                         t["supplier"], t["nation"], t["region"])
    r = r[r.r_name == "ASIA"]
    o = o[(o.o_orderdate >= D("1994-01-01")) & (o.o_orderdate < D("1995-01-01"))]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j[j.c_nationkey == j.s_nationkey]
    j = j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j = j.merge(r, left_on="n_regionkey", right_on="r_regionkey")
    j["revenue"] = rev(j)
    g = j.groupby("n_name", as_index=False).revenue.sum()
    return g.sort_values("revenue", ascending=False).reset_index(drop=True)


def q6(t):
    li = t["lineitem"]
    d = li[(li.l_shipdate >= D("1994-01-01")) & (li.l_shipdate < D("1995-01-01"))
           & (li.l_discount >= 0.05 - 1e-9) & (li.l_discount <= 0.07 + 1e-9)
           & (li.l_quantity < 24)]
    return pd.DataFrame({"revenue": [
        (d.l_extendedprice * d.l_discount).sum() if len(d) else None]})


def q7(t):
    s, li, o, c, n = (t["supplier"], t["lineitem"], t["orders"], t["customer"],
                      t["nation"])
    j = li.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    n1 = n[["n_nationkey", "n_name"]].rename(
        columns={"n_nationkey": "sk", "n_name": "supp_nation"})
    n2 = n[["n_nationkey", "n_name"]].rename(
        columns={"n_nationkey": "ck", "n_name": "cust_nation"})
    j = j.merge(n1, left_on="s_nationkey", right_on="sk")
    j = j.merge(n2, left_on="c_nationkey", right_on="ck")
    j = j[((j.supp_nation == "FRANCE") & (j.cust_nation == "GERMANY"))
          | ((j.supp_nation == "GERMANY") & (j.cust_nation == "FRANCE"))]
    j = j[(j.l_shipdate >= D("1995-01-01")) & (j.l_shipdate <= D("1996-12-31"))]
    j["l_year"] = j.l_shipdate.dt.year.astype("int64")
    j["volume"] = rev(j)
    g = j.groupby(["supp_nation", "cust_nation", "l_year"],
                  as_index=False).volume.sum().rename(columns={"volume": "revenue"})
    return g.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)


def q8(t):
    p, s, li, o, c, n, r = (t["part"], t["supplier"], t["lineitem"],
                            t["orders"], t["customer"], t["nation"], t["region"])
    p = p[p.p_type == "ECONOMY ANODIZED STEEL"]
    o = o[(o.o_orderdate >= D("1995-01-01")) & (o.o_orderdate <= D("1996-12-31"))]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.merge(n.rename(columns={"n_nationkey": "cnk", "n_regionkey": "crk"})
                [["cnk", "crk"]], left_on="c_nationkey", right_on="cnk")
    j = j.merge(r, left_on="crk", right_on="r_regionkey")
    j = j[j.r_name == "AMERICA"]
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(n.rename(columns={"n_nationkey": "snk", "n_name": "nation"})
                [["snk", "nation"]], left_on="s_nationkey", right_on="snk")
    j["o_year"] = j.o_orderdate.dt.year.astype("int64")
    j["volume"] = rev(j)
    j["bv"] = np.where(j.nation == "BRAZIL", j.volume, 0.0)
    g = j.groupby("o_year", as_index=False).agg(bv=("bv", "sum"),
                                                volume=("volume", "sum"))
    g["mkt_share"] = g.bv / g.volume
    return g[["o_year", "mkt_share"]].sort_values("o_year").reset_index(drop=True)


def q9(t):
    p, s, li, ps, o, n = (t["part"], t["supplier"], t["lineitem"],
                          t["partsupp"], t["orders"], t["nation"])
    p = p[p.p_name.str.contains("green")]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(ps, left_on=["l_partkey", "l_suppkey"],
                right_on=["ps_partkey", "ps_suppkey"])
    j = j.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j["o_year"] = j.o_orderdate.dt.year.astype("int64")
    j["amount"] = rev(j) - j.ps_supplycost * j.l_quantity
    g = j.groupby(["n_name", "o_year"], as_index=False).amount.sum() \
         .rename(columns={"n_name": "nation", "amount": "sum_profit"})
    return g.sort_values(["nation", "o_year"],
                         ascending=[True, False]).reset_index(drop=True)


def q10(t):
    c, o, li, n = t["customer"], t["orders"], t["lineitem"], t["nation"]
    o = o[(o.o_orderdate >= D("1993-10-01")) & (o.o_orderdate < D("1994-01-01"))]
    li = li[li.l_returnflag == "R"]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.merge(n, left_on="c_nationkey", right_on="n_nationkey")
    j["revenue"] = rev(j)
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                   "c_address", "c_comment"], as_index=False).revenue.sum()
    g = g[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
           "c_address", "c_phone", "c_comment"]]
    return g.sort_values("revenue", ascending=False).head(20).reset_index(drop=True)


def q11(t):
    ps, s, n = t["partsupp"], t["supplier"], t["nation"]
    n = n[n.n_name == "GERMANY"]
    j = ps.merge(s, left_on="ps_suppkey", right_on="s_suppkey")
    j = j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    j["value"] = j.ps_supplycost * j.ps_availqty
    total = j.value.sum() * 0.0001
    g = j.groupby("ps_partkey", as_index=False).value.sum()
    g = g[g.value > total]
    return g.sort_values("value", ascending=False).reset_index(drop=True)


def q12(t):
    o, li = t["orders"], t["lineitem"]
    li = li[li.l_shipmode.isin(["MAIL", "SHIP"])
            & (li.l_commitdate < li.l_receiptdate)
            & (li.l_shipdate < li.l_commitdate)
            & (li.l_receiptdate >= D("1994-01-01"))
            & (li.l_receiptdate < D("1995-01-01"))]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    hi = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    j["high_line_count"] = hi.astype(np.int64)
    j["low_line_count"] = (~hi).astype(np.int64)
    g = j.groupby("l_shipmode", as_index=False)[
        ["high_line_count", "low_line_count"]].sum()
    return g.sort_values("l_shipmode").reset_index(drop=True)


def q13(t):
    c, o = t["customer"], t["orders"]
    o = o[~o.o_comment.str.contains(r"special.*requests", regex=True)]
    j = c.merge(o, left_on="c_custkey", right_on="o_custkey", how="left")
    g = j.groupby("c_custkey").o_orderkey.count().rename("c_count").reset_index()
    g2 = g.groupby("c_count", as_index=False).size() \
          .rename(columns={"size": "custdist"})
    return g2[["c_count", "custdist"]].sort_values(
        ["custdist", "c_count"], ascending=[False, False]).reset_index(drop=True)


def q14(t):
    li, p = t["lineitem"], t["part"]
    li = li[(li.l_shipdate >= D("1995-09-01")) & (li.l_shipdate < D("1995-10-01"))]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    v = rev(j)
    promo = v[j.p_type.str.startswith("PROMO")].sum()
    return pd.DataFrame({"promo_revenue": [100.0 * promo / v.sum()]})


def q15(t):
    li, s = t["lineitem"], t["supplier"]
    li = li[(li.l_shipdate >= D("1996-01-01")) & (li.l_shipdate < D("1996-04-01"))]
    li = li.assign(revenue=rev(li))
    g = li.groupby("l_suppkey", as_index=False).revenue.sum() \
          .rename(columns={"l_suppkey": "supplier_no",
                           "revenue": "total_revenue"})
    mx = g.total_revenue.max()
    g = g[np.isclose(g.total_revenue, mx, rtol=1e-12)]
    out = s.merge(g, left_on="s_suppkey", right_on="supplier_no")
    out = out[["s_suppkey", "s_name", "s_address", "s_phone", "total_revenue"]]
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q16(t):
    ps, p, s = t["partsupp"], t["part"], t["supplier"]
    bad = s[s.s_comment.str.contains(r"Customer.*Complaints")].s_suppkey
    p = p[(p.p_brand != "Brand#45")
          & ~p.p_type.str.startswith("MEDIUM POLISHED")
          & p.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])]
    j = ps.merge(p, left_on="ps_partkey", right_on="p_partkey")
    j = j[~j.ps_suppkey.isin(bad)]
    g = j.groupby(["p_brand", "p_type", "p_size"], as_index=False) \
         .ps_suppkey.nunique().rename(columns={"ps_suppkey": "supplier_cnt"})
    return g[["p_brand", "p_type", "p_size", "supplier_cnt"]].sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).reset_index(drop=True)


def q17(t):
    li, p = t["lineitem"], t["part"]
    p = p[(p.p_brand == "Brand#23") & (p.p_container == "MED BOX")]
    avg = li.groupby("l_partkey").l_quantity.mean().rename("avgq")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j = j.join(avg, on="l_partkey")
    j = j[j.l_quantity < 0.2 * j.avgq]
    return pd.DataFrame({"avg_yearly": [
        j.l_extendedprice.sum() / 7.0 if len(j) else None]})


def q18(t):
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    big = li.groupby("l_orderkey").l_quantity.sum()
    big = big[big > 300].index
    o = o[o.o_orderkey.isin(big)]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(c, left_on="o_custkey", right_on="c_custkey")
    g = j.groupby(["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                   "o_totalprice"], as_index=False).l_quantity.sum()
    return g.sort_values(["o_totalprice", "o_orderdate"],
                         ascending=[False, True]).head(100).reset_index(drop=True)


def q19(t):
    li, p = t["lineitem"], t["part"]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    base = j.l_shipmode.isin(["AIR", "AIR REG"]) \
        & (j.l_shipinstruct == "DELIVER IN PERSON")
    c1 = ((j.p_brand == "Brand#12")
          & j.p_container.isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (j.l_quantity >= 1) & (j.l_quantity <= 11)
          & (j.p_size >= 1) & (j.p_size <= 5))
    c2 = ((j.p_brand == "Brand#23")
          & j.p_container.isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (j.l_quantity >= 10) & (j.l_quantity <= 20)
          & (j.p_size >= 1) & (j.p_size <= 10))
    c3 = ((j.p_brand == "Brand#34")
          & j.p_container.isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (j.l_quantity >= 20) & (j.l_quantity <= 30)
          & (j.p_size >= 1) & (j.p_size <= 15))
    d = j[base & (c1 | c2 | c3)]
    return pd.DataFrame({"revenue": [rev(d).sum() if len(d) else None]})


def q20(t):
    s, n, ps, p, li = (t["supplier"], t["nation"], t["partsupp"], t["part"],
                       t["lineitem"])
    pk = p[p.p_name.str.startswith("forest")].p_partkey
    li = li[(li.l_shipdate >= D("1994-01-01")) & (li.l_shipdate < D("1995-01-01"))]
    q = li.groupby(["l_partkey", "l_suppkey"], as_index=False).l_quantity.sum()
    j = ps[ps.ps_partkey.isin(pk)].merge(
        q, left_on=["ps_partkey", "ps_suppkey"],
        right_on=["l_partkey", "l_suppkey"], how="left")
    j = j[j.ps_availqty > 0.5 * j.l_quantity]  # NaN comparison -> False
    sk = j.ps_suppkey.unique()
    n = n[n.n_name == "CANADA"]
    out = s[s.s_suppkey.isin(sk)].merge(n, left_on="s_nationkey",
                                        right_on="n_nationkey")
    return out[["s_name", "s_address"]].sort_values("s_name").reset_index(drop=True)


def q21(t):
    s, li, o, n = t["supplier"], t["lineitem"], t["orders"], t["nation"]
    l1 = li[li.l_receiptdate > li.l_commitdate]
    o = o[o.o_orderstatus == "F"]
    n = n[n.n_name == "SAUDI ARABIA"]
    j = l1.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j = j.merge(s, left_on="l_suppkey", right_on="s_suppkey")
    j = j.merge(n, left_on="s_nationkey", right_on="n_nationkey")
    # exists: another supplier on the same order
    nsupp = li.groupby("l_orderkey").l_suppkey.nunique()
    j = j[j.l_orderkey.map(nsupp) > 1]
    # not exists: another supplier late on the same order
    late = li[li.l_receiptdate > li.l_commitdate]
    pair = late.groupby("l_orderkey").l_suppkey.nunique()
    only_late = j.l_orderkey.map(pair).fillna(0) == 1
    j = j[only_late]
    g = j.groupby("s_name", as_index=False).size() \
         .rename(columns={"size": "numwait"})
    return g.sort_values(["numwait", "s_name"],
                         ascending=[False, True]).head(100).reset_index(drop=True)


def q22(t):
    c, o = t["customer"], t["orders"]
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cc = c.c_phone.str[:2]
    sel = c[cc.isin(codes)]
    avg = sel[sel.c_acctbal > 0.0].c_acctbal.mean()
    sel = sel[sel.c_acctbal > avg]
    sel = sel[~sel.c_custkey.isin(o.o_custkey)]
    sel = sel.assign(cntrycode=sel.c_phone.str[:2])
    g = sel.groupby("cntrycode", as_index=False).agg(
        numcust=("c_acctbal", "size"), totacctbal=("c_acctbal", "sum"))
    return g.sort_values("cntrycode").reset_index(drop=True)


ORACLE = {i: globals()[f"q{i}"] for i in range(1, 23)}
