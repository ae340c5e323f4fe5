"""TPC-DS: schema materialisation, determinism, and the adapted query
corpus validated row-for-row against a pandas oracle on identical data
(the H2-oracle pattern of testing/trino-testing/QueryAssertions)."""

import numpy as np
import pandas as pd
import pytest

from presto1_tpu.exec.engine import Engine
from presto1_tpu.tpcds.catalog import TpcdsCatalog
from presto1_tpu.tpcds.queries import QUERIES
from presto1_tpu.tpcds.schema import TABLES, SF1_ROWS


@pytest.fixture(scope="module")
def cat():
    return TpcdsCatalog(sf=0.01)


@pytest.fixture(scope="module")
def engine(cat):
    return Engine(cat)


def _df(cat, table, cols=None):
    t = cat.table(table)
    return t.batch(cols).to_pandas()


def test_all_tables_schema_complete(cat):
    assert len(TABLES) == 25  # 24 spec tables + dbgen_version
    for name, cols in TABLES.items():
        t = cat.table(name)
        assert list(t.schema.keys()) == [c for c, _ in cols]
        assert t.num_rows >= 1


def test_deterministic(cat):
    other = TpcdsCatalog(sf=0.01)
    for table in ("store_sales", "item"):
        a = _df(cat, table).head(100)
        b = _df(other, table).head(100)
        pd.testing.assert_frame_equal(a, b)


def test_date_dim_is_real_calendar(cat):
    dd = _df(cat, "date_dim",
             ["d_date_sk", "d_date", "d_year", "d_moy", "d_dom",
              "d_day_name"])
    assert len(dd) == SF1_ROWS["date_dim"]
    # spec anchor: sk 2415022 = 1900-01-02 (a Tuesday)
    first = dd.iloc[0]
    assert first.d_date_sk == 2415022
    assert str(np.datetime64(first.d_date, "D")) == "1900-01-02"
    assert first.d_day_name == "Tuesday"
    # spot-check a known date
    row = dd[dd.d_date == np.datetime64("2000-02-29")]
    assert len(row) == 1
    assert int(row.d_year.iloc[0]) == 2000 and int(row.d_moy.iloc[0]) == 2
    assert int(row.d_dom.iloc[0]) == 29


def _oracle(cat, qid):
    """pandas implementation of each adapted query."""
    d = lambda t, c=None: _df(cat, t, c)  # noqa: E731
    if qid == 3:
        m = d("store_sales").merge(
            d("date_dim"), left_on="ss_sold_date_sk", right_on="d_date_sk"
        ).merge(d("item"), left_on="ss_item_sk", right_on="i_item_sk")
        m = m[(m.i_manufact_id == 5) & (m.d_moy == 11)]
        g = m.groupby(["d_year", "i_brand_id", "i_brand"], as_index=False)[
            "ss_ext_sales_price"].sum()
        g = g.rename(columns={"ss_ext_sales_price": "sum_agg"})
        return g.sort_values(["d_year", "sum_agg", "i_brand_id"],
                             ascending=[True, False, True]).head(100)
    if qid in (7, 26):
        fact, cd_key, dkey, year, gender, ms, edu = (
            ("store_sales", "ss_cdemo_sk", "ss_sold_date_sk", 1998, "M",
             "S", "College") if qid == 7 else
            ("catalog_sales", "cs_bill_cdemo_sk", "cs_sold_date_sk", 2000,
             "F", "W", "Primary"))
        p = "ss" if qid == 7 else "cs"
        m = d(fact).merge(d("customer_demographics"),
                          left_on=cd_key, right_on="cd_demo_sk")
        m = m.merge(d("date_dim"), left_on=dkey, right_on="d_date_sk")
        m = m.merge(d("item"), left_on=f"{p}_item_sk", right_on="i_item_sk")
        m = m.merge(d("promotion"), left_on=f"{p}_promo_sk",
                    right_on="p_promo_sk")
        m = m[(m.cd_gender == gender) & (m.cd_marital_status == ms)
              & (m.cd_education_status == edu)
              & ((m.p_channel_email == "N") | (m.p_channel_event == "N"))
              & (m.d_year == year)]
        g = m.groupby("i_item_id", as_index=False).agg(
            agg1=(f"{p}_quantity", "mean"),
            agg2=(f"{p}_list_price", "mean"),
            agg3=(f"{p}_coupon_amt", "mean"),
            agg4=(f"{p}_sales_price", "mean"))
        return g.sort_values("i_item_id").head(100)
    if qid == 19:
        m = d("date_dim").merge(d("store_sales"), left_on="d_date_sk",
                                right_on="ss_sold_date_sk")
        m = m.merge(d("item"), left_on="ss_item_sk", right_on="i_item_sk")
        m = m.merge(d("customer"), left_on="ss_customer_sk",
                    right_on="c_customer_sk")
        m = m.merge(d("customer_address"), left_on="c_current_addr_sk",
                    right_on="ca_address_sk")
        m = m.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        m = m[(m.i_manager_id == 2) & (m.d_moy == 11) & (m.d_year == 1999)]
        g = m.groupby(["i_brand_id", "i_brand", "i_manufact_id",
                       "i_manufact"], as_index=False)[
            "ss_ext_sales_price"].sum().rename(
            columns={"ss_ext_sales_price": "ext_price"})
        return g.sort_values(["ext_price", "i_brand_id"],
                             ascending=[False, True]).head(100)
    if qid in (42, 52, 55):
        m = d("date_dim").merge(d("store_sales"), left_on="d_date_sk",
                                right_on="ss_sold_date_sk")
        m = m.merge(d("item"), left_on="ss_item_sk", right_on="i_item_sk")
        if qid == 42:
            m = m[(m.i_manager_id == 1) & (m.d_moy == 11)
                  & (m.d_year == 1998)]
            g = m.groupby(["d_year", "i_category_id", "i_category"],
                          as_index=False)["ss_ext_sales_price"].sum() \
                .rename(columns={"ss_ext_sales_price": "s"})
            return g.sort_values(
                ["s", "d_year", "i_category_id", "i_category"],
                ascending=[False, True, True, True]).head(100)
        if qid == 52:
            m = m[(m.i_manager_id == 1) & (m.d_moy == 11)
                  & (m.d_year == 1998)]
            g = m.groupby(["d_year", "i_brand_id", "i_brand"],
                          as_index=False)["ss_ext_sales_price"].sum()
            g.columns = ["d_year", "brand_id", "brand", "ext_price"]
            return g.sort_values(["d_year", "ext_price", "brand_id"],
                                 ascending=[True, False, True]).head(100)
        m = m[(m.i_manager_id == 3) & (m.d_moy == 12) & (m.d_year == 1998)]
        g = m.groupby(["i_brand_id", "i_brand"], as_index=False)[
            "ss_ext_sales_price"].sum()
        g.columns = ["brand_id", "brand", "ext_price"]
        return g.sort_values(["ext_price", "brand_id"],
                             ascending=[False, True]).head(100)
    if qid == 96:
        m = d("store_sales").merge(
            d("household_demographics"), left_on="ss_hdemo_sk",
            right_on="hd_demo_sk")
        m = m.merge(d("time_dim"), left_on="ss_sold_time_sk",
                    right_on="t_time_sk")
        m = m.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        m = m[(m.t_hour == 20) & (m.t_minute >= 30) & (m.hd_dep_count == 5)
              & (m.s_store_sk <= 6)]
        return pd.DataFrame({"cnt": [len(m)]})
    if qid in (98, 12):
        fact, dk, ik, price, cats, lo, hi = (
            ("store_sales", "ss_sold_date_sk", "ss_item_sk",
             "ss_ext_sales_price", ["Sports", "Books", "Home"],
             "1999-02-22", "1999-03-24") if qid == 98 else
            ("web_sales", "ws_sold_date_sk", "ws_item_sk",
             "ws_ext_sales_price", ["Men", "Music", "Women"],
             "2000-01-25", "2000-02-24"))
        m = d(fact).merge(d("item"), left_on=ik, right_on="i_item_sk")
        m = m.merge(d("date_dim"), left_on=dk, right_on="d_date_sk")
        m = m[m.i_category.isin(cats)
              & (m.d_date >= np.datetime64(lo))
              & (m.d_date <= np.datetime64(hi))]
        g = m.groupby(["i_item_id", "i_item_desc", "i_category", "i_class",
                       "i_current_price"], as_index=False)[price].sum() \
            .rename(columns={price: "itemrevenue"})
        class_tot = g.groupby("i_class").itemrevenue.transform("sum")
        g["revenueratio"] = g.itemrevenue * 100.0 / class_tot
        return g.sort_values(["i_category", "i_class", "i_item_id",
                              "i_item_desc", "revenueratio"]).head(100)
    if qid == 89:
        m = d("item").merge(d("store_sales"), left_on="i_item_sk",
                            right_on="ss_item_sk")
        m = m.merge(d("date_dim"), left_on="ss_sold_date_sk",
                    right_on="d_date_sk")
        m = m.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        m = m[(m.d_year == 1999)
              & m.i_category.isin(["Books", "Electronics", "Sports"])]
        g = m.groupby(["i_category", "i_class", "i_brand", "s_store_name",
                       "s_company_name", "d_moy"], as_index=False)[
            "ss_sales_price"].sum().rename(
            columns={"ss_sales_price": "sum_sales"})
        g["avg_monthly_sales"] = g.groupby(
            ["i_category", "i_brand", "s_store_name", "s_company_name"]
        ).sum_sales.transform("mean")
        return g.sort_values(["sum_sales", "s_store_name"]).head(100)
    raise KeyError(qid)


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_query_vs_pandas(engine, cat, qid):
    got = engine.sql(QUERIES[qid]).to_pandas()
    exp = _oracle(cat, qid)
    assert len(got) == len(exp), (qid, len(got), len(exp))
    # compare as sorted multisets column-by-column (ORDER BY ties may
    # permute rows between implementations)
    for gc, ec in zip(got.columns, exp.columns):
        gv = got[gc].to_numpy()
        ev = exp[ec].to_numpy()
        if gv.dtype.kind in "fc" or ev.dtype.kind in "fc":
            assert np.allclose(sorted(map(float, gv)),
                               sorted(map(float, ev)),
                               rtol=1e-9), (qid, gc)
        else:
            assert sorted(map(str, gv)) == sorted(map(str, ev)), (qid, gc)
