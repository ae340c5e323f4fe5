"""TPC-H correctness: engine vs pandas oracle on identical generated data.

The analog of the reference's AbstractTestQueries + H2QueryRunner row-for-row
comparison (``testing/trino-testing/.../QueryAssertions.java:97``), over the
deterministic dbgen output at tiny scale.
"""

import numpy as np
import pandas as pd
import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine
from presto1_tpu.tpch.queries import QUERIES
from presto1_tpu.tpch.schema import TABLES

from tpch_oracle import ORACLE

SF = 0.01


@pytest.fixture(scope="module")
def env():
    catalog = TpchCatalog(sf=SF)
    engine = Engine(catalog)
    frames = {}
    for name in TABLES:
        frames[name] = catalog.table(name).batch().to_pandas()
    return engine, frames


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = range(len(out.columns))
    for c in out.columns:
        col = out[c]
        if col.dtype == object:
            try:
                out[c] = col.astype(np.float64)
                continue
            except (TypeError, ValueError):
                pass
            out[c] = col.astype(str)
        elif str(col.dtype).startswith("datetime"):
            out[c] = col.astype(str)
    return out


def assert_frames_match(actual: pd.DataFrame, expected: pd.DataFrame, ordered):
    assert len(actual.columns) == len(expected.columns), (
        f"column count {len(actual.columns)} != {len(expected.columns)}")
    a, e = normalize(actual), normalize(expected)
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    if not ordered:
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        e = e.sort_values(list(e.columns)).reset_index(drop=True)
    for c in a.columns:
        av, ev = a[c].to_numpy(), e[c].to_numpy()
        if av.dtype.kind == "f" or ev.dtype.kind == "f":
            av = av.astype(np.float64)
            ev = ev.astype(np.float64)
            ok = np.isclose(av, ev, rtol=1e-6, atol=1e-6, equal_nan=True)
        else:
            ok = av == ev
        bad = np.flatnonzero(~ok)
        assert bad.size == 0, (
            f"column {c} mismatch at rows {bad[:5]}: "
            f"{av[bad[:5]]} != {ev[bad[:5]]}")


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_tpch_query(env, qid):
    engine, frames = env
    actual = engine.sql_pandas(QUERIES[qid])
    expected = ORACLE[qid](frames)
    assert_frames_match(actual, expected, ordered=True)
