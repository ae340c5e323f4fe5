"""Pattern-matching rule DSL (lib/trino-matching + IterativeOptimizer
analogs)."""

import jax  # noqa: F401  (conftest pins cpu)
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.sql import logical as L
from presto1_tpu.sql.matching import (
    CLEANUP_RULES, Capture, Pattern, Rule, apply_rules,
)


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_pattern_match_and_capture(engine):
    plan = engine.plan("select n_name from nation where n_nationkey > 3")
    cap = Capture("filter")
    pat = Pattern.node(L.Output).with_child(
        Pattern.node(L.Project).with_child(
            Pattern.node(L.Filter).capturedAs(cap)))
    m = pat.match(plan)
    assert m is not None
    assert isinstance(m.get(cap), L.Filter)
    assert Pattern.node(L.Sort).match(plan) is None


def test_merge_filters_rule():
    from presto1_tpu.expr import ir
    from presto1_tpu.types import BIGINT, BOOLEAN

    scan = L.Scan("t", {"a": "a"}, {"a": BIGINT})
    p1 = ir.call(">", ir.ColumnRef("a", BIGINT), ir.Literal(1, BIGINT))
    p2 = ir.call("<", ir.ColumnRef("a", BIGINT), ir.Literal(9, BIGINT))
    plan = L.Filter(L.Filter(scan, p1), p2)
    trace = []
    out = apply_rules(plan, CLEANUP_RULES, trace=trace)
    assert isinstance(out, L.Filter) and isinstance(out.child, L.Scan)
    assert "MergeFilters" in trace


def test_merge_limits_and_push_through_project():
    from presto1_tpu.expr import ir
    from presto1_tpu.types import BIGINT

    scan = L.Scan("t", {"a": "a"}, {"a": BIGINT})
    proj = L.Project(scan, [("b", ir.ColumnRef("a", BIGINT))])
    plan = L.Limit(L.Limit(proj, 10), 5)
    trace = []
    out = apply_rules(plan, CLEANUP_RULES, trace=trace)
    assert "MergeLimits" in trace and "PushLimitThroughProject" in trace
    # limit(5) ends up under the projection
    assert isinstance(out, L.Project)
    assert isinstance(out.child, L.Limit) and out.child.n == 5


def test_identity_projection_removed():
    from presto1_tpu.expr import ir
    from presto1_tpu.types import BIGINT

    scan = L.Scan("t", {"a": "sym"}, {"sym": BIGINT})
    plan = L.Project(scan, [("sym", ir.ColumnRef("sym", BIGINT))])
    out = apply_rules(plan, CLEANUP_RULES)
    assert isinstance(out, L.Scan)


def test_rules_preserve_query_results(engine):
    # end-to-end sanity: the cleanup pass is active inside optimize()
    out = engine.sql(
        "select * from (select n_name, n_nationkey from nation limit 10) t "
        "where n_nationkey > 2 and n_nationkey > 1 limit 5").to_pandas()
    assert len(out) == 5
    assert (out.n_nationkey > 2).all()
