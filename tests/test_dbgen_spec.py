"""TPC-H data-generator conformance checks (spec §4.2.2/§4.2.3):
row counts, value domains, key structure, referential shape."""

import numpy as np
import pytest

from presto1_tpu.tpch.dbgen import TpchGenerator


@pytest.fixture(scope="module")
def gen():
    return TpchGenerator(0.01)


def test_row_counts(gen):
    assert gen.num_rows("region") == 5
    assert gen.num_rows("nation") == 25
    assert gen.num_rows("supplier") == 100
    assert gen.num_rows("part") == 2000
    assert gen.num_rows("partsupp") == 8000
    assert gen.num_rows("customer") == 1500
    assert gen.num_rows("orders") == 15000
    # lineitem: 1..7 lines per order, mean ~4
    n = gen.num_rows("lineitem")
    assert 15000 * 1 <= n <= 15000 * 7
    assert abs(n / 15000 - 4.0) < 0.1


def test_sparse_orderkeys(gen):
    ok = gen.column("orders", "o_orderkey")
    assert len(np.unique(ok)) == len(ok)
    assert ((ok - 1) % 32 < 8).all()  # 8 used keys per 32-key block


def test_customer_mortality(gen):
    ck = gen.column("orders", "o_custkey")
    assert (ck % 3 != 0).all()
    assert ck.min() >= 1 and ck.max() <= 1500


def test_value_domains(gen):
    qty = gen.column("lineitem", "l_quantity")
    assert qty.min() >= 100 and qty.max() <= 5000  # cents scale 2: 1..50
    disc = gen.column("lineitem", "l_discount")
    assert disc.min() >= 0 and disc.max() <= 10
    tax = gen.column("lineitem", "l_tax")
    assert tax.min() >= 0 and tax.max() <= 8
    size = gen.column("part", "p_size")
    assert size.min() >= 1 and size.max() <= 50
    nk = gen.column("customer", "c_nationkey")
    assert nk.min() >= 0 and nk.max() <= 24


def test_retailprice_formula(gen):
    pk = gen.column("part", "p_partkey")
    rp = gen.column("part", "p_retailprice")
    expect = 90000 + (pk // 10) % 20001 + 100 * (pk % 1000)
    assert (rp == expect).all()


def test_dates_consistent(gen):
    od = gen.column("orders", "o_orderdate").astype(np.int64)
    ok = gen.column("orders", "o_orderkey")
    lok = gen.column("lineitem", "l_orderkey")
    ship = gen.column("lineitem", "l_shipdate").astype(np.int64)
    commit = gen.column("lineitem", "l_commitdate").astype(np.int64)
    receipt = gen.column("lineitem", "l_receiptdate").astype(np.int64)
    # receipt within (ship, ship+30]; ship within (orderdate, orderdate+121]
    assert ((receipt - ship >= 1) & (receipt - ship <= 30)).all()
    od_by_key = dict(zip(ok, od))
    lod = np.array([od_by_key[k] for k in lok[:500]])
    assert ((ship[:500] - lod >= 1) & (ship[:500] - lod <= 121)).all()
    assert ((commit[:500] - lod >= 30) & (commit[:500] - lod <= 90)).all()


def test_partsupp_bridge(gen):
    pk = gen.column("partsupp", "ps_partkey")
    sk = gen.column("partsupp", "ps_suppkey")
    assert (np.bincount(pk)[1:] == 4).all()  # 4 suppliers per part
    assert len(np.unique(sk)) == 100  # all suppliers used
    # lineitem suppliers always come from the part's partsupp set
    lpk = gen.column("lineitem", "l_partkey")[:2000]
    lsk = gen.column("lineitem", "l_suppkey")[:2000]
    pairs = set(zip(pk.tolist(), sk.tolist()))
    assert all((a, b) in pairs for a, b in zip(lpk.tolist(), lsk.tolist()))


def test_derived_orderstatus(gen):
    status = gen.column("orders", "o_orderstatus")[:200]
    ok = gen.column("orders", "o_orderkey")[:200]
    lok = gen.column("lineitem", "l_orderkey")
    ls = gen.column("lineitem", "l_linestatus")
    by_order = {}
    for k, s in zip(lok, ls):
        by_order.setdefault(k, set()).add(s)
    for k, st in zip(ok, status):
        states = by_order[k]
        if states == {"F"}:
            assert st == "F"
        elif states == {"O"}:
            assert st == "O"
        else:
            assert st == "P"


def test_determinism_and_chunking(gen):
    full = gen.column("lineitem", "l_extendedprice")
    chunk = gen.column("lineitem", "l_extendedprice", 1000, 1500)
    assert (full[1000:1500] == chunk).all()
    g2 = TpchGenerator(0.01)
    assert (g2.column("orders", "o_totalprice")
            == gen.column("orders", "o_totalprice")).all()


def test_dbapi_shim():
    from presto1_tpu.client import dbapi
    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine

    conn = dbapi.connect(engine=Engine(TpchCatalog(sf=0.001)))
    cur = conn.cursor()
    cur.execute("select n_name from nation where n_nationkey = ?", [3])
    assert cur.fetchone()[0] == "CANADA"
    cur.execute("select count(*) from region")
    assert cur.fetchall() == [(5,)]
