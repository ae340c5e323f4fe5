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
