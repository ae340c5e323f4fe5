"""Spilling (Grace join / partitioned aggregation through host RAM).

Reference parity: spiller/ + HashBuilderOperator spill states +
SpillableHashAggregationBuilder.  Every spilled result must match the
in-memory result row-for-row."""

import numpy as np
import pandas as pd
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.exec.session import Session


def _engines():
    plain = Engine(TpchCatalog(sf=0.001))
    s = Session()
    s.set("spill_threshold", 4096)  # tiny: force spill on every operator
    spilling = Engine(TpchCatalog(sf=0.001), session=s)
    return plain, spilling


PLAIN, SPILL = _engines()


def _cmp(sql):
    a = PLAIN.sql(sql).to_pandas()
    b = SPILL.sql(sql).to_pandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True),
        check_dtype=False, atol=1e-9)


def test_spilled_inner_join():
    _cmp("select o_orderkey, o_totalprice, c_name from orders "
         "join customer on o_custkey = c_custkey "
         "order by o_orderkey")


def test_spilled_left_join_with_nulls():
    _cmp("select c_custkey, c_name, o_orderkey from customer "
         "left join orders on c_custkey = o_custkey "
         "order by c_custkey, o_orderkey")


def test_spilled_semi_and_anti():
    _cmp("select c_custkey from customer where c_custkey in "
         "(select o_custkey from orders) order by c_custkey")
    _cmp("select c_custkey from customer where c_custkey not in "
         "(select o_custkey from orders) order by c_custkey")


def test_spilled_full_outer():
    _cmp("select c_custkey, o_orderkey from customer "
         "full outer join orders on c_custkey = o_custkey "
         "order by c_custkey, o_orderkey")


def test_spilled_join_with_residual():
    _cmp("select o_orderkey, l_linenumber from orders join lineitem "
         "on o_orderkey = l_orderkey and l_quantity > 25 "
         "order by o_orderkey, l_linenumber")


def test_spilled_aggregation():
    _cmp("select l_orderkey, count(*) c, sum(l_extendedprice) s, "
         "min(l_discount) mn, max(l_tax) mx from lineitem "
         "group by l_orderkey order by l_orderkey")


def test_spilled_agg_multi_key_with_avg():
    _cmp("select l_returnflag, l_linestatus, avg(l_quantity) a, count(*) c "
         "from lineitem group by l_returnflag, l_linestatus "
         "order by l_returnflag, l_linestatus")


def test_spilled_tpch_q3_shape():
    _cmp("select l_orderkey, sum(l_extendedprice * (1 - l_discount)) rev "
         "from customer, orders, lineitem "
         "where c_mktsegment = 'BUILDING' and c_custkey = o_custkey "
         "and l_orderkey = o_orderkey and o_orderdate < date '1995-03-15' "
         "group by l_orderkey order by rev desc limit 10")


def test_spill_records_partition_count():
    from presto1_tpu.exec.executor import Executor

    plan = SPILL.plan("select o_custkey, count(*) c from orders "
                      "group by o_custkey")
    ex = Executor(SPILL.catalog, spill_threshold=4096)
    ex.execute(plan)
    spilled = [r for r in ex.record.values() if r.get("spilled")]
    assert spilled and all(r["spill_partitions"] >= 2 for r in spilled)


# ----------------------------------------------- compiled grouped execution


def test_compiled_grouped_q1_shape():
    """Round-2 verdict item 6: grouped execution ON THE COMPILED PATH.
    The dominant table is row-sharded into K splits, ONE compiled partial
    program runs per split (<=2 distinct shapes), partials combine in a
    final stage — peak HBM ~ scan/K."""
    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine

    e = Engine(TpchCatalog(sf=0.005))
    sql = ("select l_returnflag, l_linestatus, sum(l_quantity) sq, "
           "count(*) c, avg(l_extendedprice) ap from lineitem "
           "where l_shipdate <= date '1998-09-02' "
           "group by l_returnflag, l_linestatus "
           "order by l_returnflag, l_linestatus")
    gq = e.compile_grouped(sql, n_groups=5)
    out = gq().to_pandas()
    ref = e.sql(sql).to_pandas()
    assert gq.info["runs"] == 5
    assert gq.info["table"] == "lineitem"
    assert gq.info["programs"] <= 2  # shard sizes differ by <= 1 row
    import numpy as np
    for col in ref.columns:
        a, b = out[col].to_numpy(), ref[col].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float))
        else:
            assert (a == b).all()


def test_compiled_grouped_join_shape():
    """Q9/Q18 class: only the probe (dominant) table shards; build sides
    stay whole so every split joins against the complete build."""
    from presto1_tpu.exec.catalog import TpchCatalog
    from presto1_tpu.exec.engine import Engine

    e = Engine(TpchCatalog(sf=0.005))
    sql = ("select o_orderpriority, count(*) c, sum(l_extendedprice) s "
           "from lineitem, orders where l_orderkey = o_orderkey "
           "group by o_orderpriority order by o_orderpriority")
    gq = e.compile_grouped(sql, n_groups=3)
    out = gq().to_pandas()
    ref = e.sql(sql).to_pandas()
    assert gq.info["table"] == "lineitem"
    assert gq.info["runs"] == 3
    import numpy as np
    assert list(out.o_orderpriority) == list(ref.o_orderpriority)
    assert (out.c.to_numpy() == ref.c.to_numpy()).all()
    assert np.allclose(out.s.astype(float), ref.s.astype(float))
