"""Catalog-driven uniqueness statistics (round-1 verdict item 9): the
optimizer's build-side N:1 detection consumes Table.unique_keys reported
by the connector (reference: plugin/trino-tpch/.../statistics/,
ConnectorMetadata.getTableStatistics) instead of a hardcoded TPC-H dict,
so TPC-DS and other catalogs get the same plans."""

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.sql.logical import Join
from presto1_tpu.tpcds.catalog import TpcdsCatalog


def _joins(plan):
    out = []

    def walk(n):
        if isinstance(n, Join):
            out.append(n)
        for c in n.children:
            walk(c)

    walk(plan)
    return out


def test_tpch_pk_still_detected():
    eng = Engine(TpchCatalog(sf=0.001))
    plan = eng.plan(
        "select o_orderkey from lineitem join orders "
        "on l_orderkey = o_orderkey")
    js = _joins(plan)
    assert js and all(j.build_unique for j in js)


def test_tpcds_dimension_pk_detected():
    eng = Engine(TpcdsCatalog(sf=1))
    plan = eng.plan(
        "select d_year from store_sales join date_dim "
        "on ss_sold_date_sk = d_date_sk")
    js = _joins(plan)
    assert js and all(j.build_unique for j in js)


def test_tpcds_composite_fact_pk_detected():
    eng = Engine(TpcdsCatalog(sf=1))
    plan = eng.plan(
        "select sr.sr_return_amt from store_sales ss join store_returns sr "
        "on ss.ss_item_sk = sr.sr_item_sk "
        "and ss.ss_ticket_number = sr.sr_ticket_number")
    js = _joins(plan)
    assert js and all(j.build_unique for j in js)


def test_non_key_join_not_marked_unique():
    eng = Engine(TpchCatalog(sf=0.001))
    plan = eng.plan(
        "select 1 x from lineitem l1 join lineitem l2 "
        "on l1.l_partkey = l2.l_partkey")
    js = _joins(plan)
    assert js and not any(j.build_unique for j in js)
