"""Wide-decimal sum exactness + overflow guard (round-1 verdict weak #7:
sums past scale 4 silently degraded to DOUBLE; reference sums exactly at
decimal(38,s) and raises on overflow, spi/type/Decimals.java)."""

import pytest

from presto1_tpu.exec.catalog import TpchCatalog
from presto1_tpu.exec.engine import Engine


@pytest.fixture(scope="module")
def engine():
    return Engine(TpchCatalog(sf=0.001))


def test_wide_scale_sum_exact(engine):
    # 3 x (1e10 + 1e-6) at scale 6: the true sum 30000000000.000003 is NOT
    # representable in float64 (eps at 3e10 is ~6.6e-6), so the old DOUBLE
    # fallback provably loses the last digit; the exact path keeps it.
    out = engine.sql(
        "select sum(cast(10000000000 as decimal(38,6)) "
        "         + cast(0.000001 as decimal(38,6))) s "
        "from nation where n_nationkey < 3")
    col = out["s"]
    assert col.type.kind == "decimal" and col.type.scale == 6
    assert int(col.data[0]) == 30_000_000_000_000_003  # unscaled, exact


def test_small_scale_sum_still_decimal(engine):
    out = engine.sql("select sum(cast(1.25 as decimal(10,2))) s "
                     "from nation where n_nationkey < 4")
    col = out["s"]
    assert col.type.kind == "decimal"
    assert int(col.data[0]) == 500  # 4 * 1.25 at scale 2


def test_sum_overflow_raises(engine):
    # 25 x 1e18 unscaled wraps int64; must raise, not return garbage
    with pytest.raises(ArithmeticError, match="overflow"):
        engine.sql(
            "select sum(cast(100000000 as decimal(28,10))) s from nation")


def test_group_by_wide_sum_exact(engine):
    out = engine.sql(
        "select n_regionkey, "
        "sum(cast(10000000000 as decimal(38,6)) "
        "  + cast(0.000001 as decimal(38,6))) s "
        "from nation group by n_regionkey order by n_regionkey")
    counts = engine.sql(
        "select n_regionkey, count(*) c from nation "
        "group by n_regionkey order by n_regionkey").to_pandas()
    col = out["s"]
    assert col.type.scale == 6
    import numpy as np

    data = np.asarray(col.data[:out.num_rows])
    for i, c in enumerate(counts.c):
        assert int(data[i]) == c * 10_000_000_000_000_001
