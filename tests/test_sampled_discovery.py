"""Sampled-discovery compiled queries vs the eager engine, row-for-row.

Round-5: discovery (the eager capacity-recording pass) was the SF10+
scalability wall; ``exec/sampling.py`` runs it on a prefix sample of the
dominant table and extrapolates.  These tests force sampling at tiny
scale and require EXACT result parity with full (eager) execution — the
extrapolated capacities/ranges must never change results, only shapes.
The guarded failure path (growth past extrapolated values raises, never
truncates) is exercised by an adversarially tiny margin.
"""

import numpy as np
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.exec.executor import CompiledQuery, ExecError
from presto1_tpu.tpch.queries import QUERIES

from test_tpch import assert_frames_match

SAMPLE = {"lineitem": 8}


@pytest.fixture(scope="module")
def env():
    catalog = TpchCatalog(sf=0.01)
    return Engine(catalog)


# q18 = HAVING on a prefix-clustered group (the selectivity-preservation
# case); q9/q5 = deep join chains over unsampled dimensions; q17 =
# correlated avg subquery; q1/q3/q6 = the bench anchors; q20 = semi-join
# pushdown chain
@pytest.mark.parametrize("qid", [1, 3, 5, 6, 9, 17, 18, 20])
def test_sampled_matches_eager(env, qid):
    engine = env
    plan = engine.plan(QUERIES[qid])
    cq = CompiledQuery(engine.catalog, plan, sample=SAMPLE)
    actual = cq().to_pandas()
    expected = engine.sql(QUERIES[qid]).to_pandas()
    assert_frames_match(actual, expected, ordered=True)


def test_sampled_overflow_guard_raises_not_truncates(env):
    """An absurdly small margin under-extrapolates; the compiled program
    must detect the overflow (traced guards), not silently truncate."""
    engine = env
    plan = engine.plan(QUERIES[3])
    cq = CompiledQuery(engine.catalog, plan, sample={"lineitem": 64})
    from presto1_tpu.exec import sampling

    floor = sampling.CAP_FLOOR
    try:
        sampling.CAP_FLOOR = 1
        cq_small = CompiledQuery(engine.catalog, plan,
                                 sample={"lineitem": 64},
                                 sample_margin=0.001)
    finally:
        sampling.CAP_FLOOR = floor
    with pytest.raises(ExecError):
        cq_small()
    # and the honest margin still runs
    out = cq().to_pandas()
    assert len(out) > 0


def test_auto_policy_spares_small_catalogs(env):
    from presto1_tpu.exec.sampling import choose_sample

    engine = env
    plan = engine.plan(QUERIES[1])
    assert choose_sample(engine.catalog, plan) is None  # tiny: no sampling


def test_choose_sample_targets_largest_table(env):
    from presto1_tpu.exec.sampling import choose_sample

    engine = env
    plan = engine.plan(QUERIES[3])
    s = choose_sample(engine.catalog, plan, threshold=10_000, target=5_000)
    assert s is not None and list(s) == ["lineitem"]
    n = engine.catalog.table("lineitem").num_rows
    assert s["lineitem"] == max(2, int(np.ceil(n / 5_000)))
