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
    if qid == 6:
        item = d("item")
        cat_avg = item.groupby("i_category").i_current_price.transform(
            "mean")
        hot = item[item.i_current_price > 1.2 * cat_avg]
        m = d("customer_address").merge(
            d("customer"), left_on="ca_address_sk",
            right_on="c_current_addr_sk")
        m = m.merge(d("store_sales"), left_on="c_customer_sk",
                    right_on="ss_customer_sk")
        m = m.merge(d("date_dim"), left_on="ss_sold_date_sk",
                    right_on="d_date_sk")
        m = m.merge(hot, left_on="ss_item_sk", right_on="i_item_sk")
        m = m[(m.d_year == 1999) & (m.d_moy == 2)]
        g = m.groupby("ca_state", dropna=False, as_index=False).size() \
            .rename(columns={"size": "cnt", "ca_state": "state"})
        g = g[g.cnt >= 3]
        return g[["state", "cnt"]].sort_values(["cnt", "state"]).head(100)
    if qid == 13:
        m = d("store_sales").merge(d("store"), left_on="ss_store_sk",
                                   right_on="s_store_sk")
        m = m.merge(d("customer_demographics"), left_on="ss_cdemo_sk",
                    right_on="cd_demo_sk")
        m = m.merge(d("household_demographics"), left_on="ss_hdemo_sk",
                    right_on="hd_demo_sk")
        m = m.merge(d("customer_address"), left_on="ss_addr_sk",
                    right_on="ca_address_sk")
        m = m.merge(d("date_dim"), left_on="ss_sold_date_sk",
                    right_on="d_date_sk")
        m = m[m.d_year == 1998]
        demo = (((m.cd_marital_status == "M")
                 & (m.cd_education_status == "College")
                 & m.ss_sales_price.between(50.0, 150.0)
                 & (m.hd_dep_count == 3))
                | ((m.cd_marital_status == "S")
                   & (m.cd_education_status == "Secondary")
                   & m.ss_sales_price.between(10.0, 100.0)
                   & (m.hd_dep_count == 1)))
        addr = ((m.ca_state.isin(["TX", "OH", "MI"])
                 & m.ss_net_profit.between(0, 100))
                | (m.ca_state.isin(["CA", "WA", "GA"])
                   & m.ss_net_profit.between(50, 150))
                | (m.ca_state.isin(["NY", "FL", "AL"])
                   & m.ss_net_profit.between(0, 200)))
        m = m[demo & addr]
        return pd.DataFrame({
            "a1": [m.ss_quantity.mean()],
            "a2": [m.ss_ext_sales_price.mean()],
            "a3": [m.ss_ext_wholesale_cost.mean()],
            "a4": [m.ss_ext_wholesale_cost.sum()]})
    if qid == 15:
        m = d("catalog_sales").merge(
            d("customer"), left_on="cs_bill_customer_sk",
            right_on="c_customer_sk")
        m = m.merge(d("customer_address"), left_on="c_current_addr_sk",
                    right_on="ca_address_sk")
        m = m.merge(d("date_dim"), left_on="cs_sold_date_sk",
                    right_on="d_date_sk")
        zips = ["85669", "86197", "88274", "83405", "86475"]
        m = m[(m.ca_zip.str[:5].isin(zips)
               | m.ca_state.isin(["CA", "WA", "GA"])
               | (m.cs_sales_price > 500))
              & (m.d_qoy == 2) & (m.d_year == 2000)]
        g = m.groupby("ca_zip", dropna=False, as_index=False)[
            "cs_sales_price"].sum().rename(columns={"cs_sales_price": "s"})
        return g.sort_values("ca_zip").head(100)
    if qid == 25:
        dd = d("date_dim")
        sr = d("store_returns")
        sr = sr[sr.sr_customer_sk.notna() & sr.sr_item_sk.notna()
                & sr.sr_ticket_number.notna()]  # NULL keys never match
        m = d("store_sales").merge(
            sr,
            left_on=["ss_customer_sk", "ss_item_sk", "ss_ticket_number"],
            right_on=["sr_customer_sk", "sr_item_sk", "sr_ticket_number"])
        m = m.merge(d("catalog_sales"),
                    left_on=["sr_customer_sk", "sr_item_sk"],
                    right_on=["cs_bill_customer_sk", "cs_item_sk"])
        d1 = dd.add_prefix("d1_")
        d2 = dd.add_prefix("d2_")
        d3 = dd.add_prefix("d3_")
        m = m.merge(d1, left_on="ss_sold_date_sk", right_on="d1_d_date_sk")
        m = m.merge(d2, left_on="sr_returned_date_sk",
                    right_on="d2_d_date_sk")
        m = m.merge(d3, left_on="cs_sold_date_sk", right_on="d3_d_date_sk")
        m = m.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        m = m.merge(d("item"), left_on="ss_item_sk", right_on="i_item_sk")
        m = m[(m.d1_d_year == 1999)
              & m.d2_d_moy.between(1, 12) & m.d2_d_year.between(1999, 2000)
              & m.d3_d_moy.between(1, 12) & m.d3_d_year.between(1999, 2000)]
        g = m.groupby(["i_item_id", "i_item_desc", "s_store_id",
                       "s_store_name"], as_index=False).agg(
            store_sales_profit=("ss_net_profit", "sum"),
            store_returns_loss=("sr_net_loss", "sum"),
            catalog_sales_profit=("cs_net_profit", "sum"))
        return g.sort_values(["i_item_id", "i_item_desc", "s_store_id",
                              "s_store_name"]).head(100)
    if qid == 27:
        m = d("store_sales").merge(
            d("customer_demographics"), left_on="ss_cdemo_sk",
            right_on="cd_demo_sk")
        m = m.merge(d("date_dim"), left_on="ss_sold_date_sk",
                    right_on="d_date_sk")
        m = m.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        m = m.merge(d("item"), left_on="ss_item_sk", right_on="i_item_sk")
        m = m[(m.cd_gender == "F") & (m.cd_marital_status == "W")
              & (m.cd_education_status == "Primary") & (m.d_year == 1998)
              & (m.i_manager_id == 5)]

        def level(keys):
            if not keys:  # grand total
                g = pd.DataFrame({
                    "agg1": [m.ss_quantity.mean()],
                    "agg2": [m.ss_list_price.mean()],
                    "agg3": [m.ss_coupon_amt.mean()],
                    "agg4": [m.ss_sales_price.mean()]})
            else:
                g = m.groupby(keys, as_index=False).agg(
                    agg1=("ss_quantity", "mean"),
                    agg2=("ss_list_price", "mean"),
                    agg3=("ss_coupon_amt", "mean"),
                    agg4=("ss_sales_price", "mean"))
            for col in ("i_item_id", "s_state"):
                if col not in keys:
                    g[col] = None
            return g[["i_item_id", "s_state", "agg1", "agg2", "agg3",
                      "agg4"]]

        out = pd.concat([level(["i_item_id", "s_state"]),
                         level(["i_item_id"]), level([])],
                        ignore_index=True)
        return out.sort_values(["i_item_id", "s_state"],
                               na_position="last")
    if qid == 37:
        m = d("item").merge(d("inventory"), left_on="i_item_sk",
                            right_on="inv_item_sk")
        m = m.merge(d("date_dim"), left_on="inv_date_sk",
                    right_on="d_date_sk")
        m = m.merge(d("catalog_sales"), left_on="i_item_sk",
                    right_on="cs_item_sk")
        m = m[m.i_current_price.between(20, 50)
              & m.inv_quantity_on_hand.between(100, 500)
              & (m.d_date >= np.datetime64("2000-02-01"))
              & (m.d_date <= np.datetime64("2000-04-01"))]
        g = m.groupby(["i_item_id", "i_item_desc", "i_current_price"],
                      as_index=False).size().drop(columns="size")
        return g.sort_values("i_item_id").head(100)
    if qid == 43:
        m = d("date_dim").merge(d("store_sales"), left_on="d_date_sk",
                                right_on="ss_sold_date_sk")
        m = m.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        m = m[m.d_year == 1998]
        days = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
                "Friday", "Saturday"]
        g = m.groupby(["s_store_name", "s_store_id"], as_index=False).apply(
            lambda x: pd.Series(
                {f"{day[:3].lower()}_sales":
                 x.loc[x.d_day_name == day, "ss_sales_price"].sum()
                 for day in days}), include_groups=False)
        return g.sort_values(["s_store_name", "s_store_id"]).head(100)
    if qid == 65:
        m = d("store_sales").merge(d("date_dim"),
                                   left_on="ss_sold_date_sk",
                                   right_on="d_date_sk")
        m = m[m.d_year == 1999]
        sc = m.groupby(["ss_store_sk", "ss_item_sk"], as_index=False)[
            "ss_sales_price"].sum().rename(
            columns={"ss_sales_price": "revenue"})
        ave = sc.groupby("ss_store_sk", as_index=False).revenue.mean() \
            .rename(columns={"revenue": "ave"})
        j = sc.merge(ave, on="ss_store_sk")
        j = j[j.revenue <= 0.1 * j.ave]
        j = j.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        j = j.merge(d("item"), left_on="ss_item_sk", right_on="i_item_sk")
        return j[["s_store_name", "i_item_desc", "revenue"]].sort_values(
            ["s_store_name", "i_item_desc"]).head(100)
    if qid == 73:
        m = d("store_sales").merge(d("date_dim"),
                                   left_on="ss_sold_date_sk",
                                   right_on="d_date_sk")
        m = m.merge(d("store"), left_on="ss_store_sk", right_on="s_store_sk")
        m = m.merge(d("household_demographics"), left_on="ss_hdemo_sk",
                    right_on="hd_demo_sk")
        m = m[(m.hd_dep_count == 5) & (m.ss_store_sk <= 6)
              & (m.d_year == 1999)]
        dj = m.groupby(["ss_ticket_number", "ss_customer_sk"],
                       as_index=False).size().rename(columns={"size": "cnt"})
        dj = dj[dj.cnt.between(1, 5)]
        j = dj.merge(d("customer"), left_on="ss_customer_sk",
                     right_on="c_customer_sk")
        j = j[["c_last_name", "c_first_name", "c_salutation",
               "c_preferred_cust_flag", "ss_ticket_number", "cnt"]]
        return j.sort_values(["cnt", "c_last_name", "ss_ticket_number"],
                             ascending=[False, True, True]).head(100)
    if qid == 93:
        # SQL: NULL join keys never match; pandas merge matches NaN==NaN,
        # so strip null-keyed rows from the build side first
        sr = d("store_returns")
        sr = sr[sr.sr_item_sk.notna() & sr.sr_ticket_number.notna()]
        m = d("store_sales").merge(
            sr, how="left",
            left_on=["ss_item_sk", "ss_ticket_number"],
            right_on=["sr_item_sk", "sr_ticket_number"])
        act = np.where(m.sr_return_quantity.notna(),
                       (m.ss_quantity - m.sr_return_quantity)
                       * m.ss_sales_price,
                       m.ss_quantity * m.ss_sales_price)
        m = m.assign(act_sales=act)
        g = m.groupby("ss_customer_sk", dropna=False, as_index=False)[
            "act_sales"].sum().rename(columns={"act_sales": "sumsales"})
        return g[["ss_customer_sk", "sumsales"]].sort_values(
            ["sumsales", "ss_customer_sk"]).head(100)
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
    def _null(v):
        return v is None or (isinstance(v, float) and np.isnan(v))

    for gc, ec in zip(got.columns, exp.columns):
        gv = got[gc].to_numpy()
        ev = exp[ec].to_numpy()
        if gv.dtype.kind in "fc" or ev.dtype.kind in "fc":
            def _fsort(vals):  # NaN-safe deterministic sort (NaNs last)
                fs = [float("nan") if _null(v) else float(v) for v in vals]
                return sorted(fs, key=lambda v: (v != v, 0.0 if v != v else v))

            assert np.allclose(_fsort(gv), _fsort(ev),
                               rtol=1e-9, equal_nan=True), (qid, gc)
        else:
            assert sorted("NULL" if _null(v) else str(v) for v in gv) == \
                sorted("NULL" if _null(v) else str(v) for v in ev), (qid, gc)
