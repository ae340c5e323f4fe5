"""Parquet/CSV file catalog (lib/trino-parquet reader + hive-file analog)."""

import numpy as np
import pandas as pd
import pytest

from presto1_tpu.exec.engine import Engine
from presto1_tpu.exec.file_catalog import FileCatalog, write_parquet


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    d = tmp_path_factory.mktemp("files")
    df = pd.DataFrame({
        "id": np.arange(1000, dtype=np.int64),
        "grp": np.arange(1000) % 7,
        "val": np.arange(1000, dtype=np.float64) * 1.5,
        "name": [f"name_{i % 13}" for i in range(1000)],
        "d": pd.date_range("2020-01-01", periods=1000).values,
        "maybe": [None if i % 5 == 0 else float(i) for i in range(1000)],
    })
    df.to_parquet(d / "events.parquet")
    df2 = pd.DataFrame({"k": [1, 2, 3, 4], "s": ["a", "b", None, "d"],
                        "x": [0.5, None, 2.5, 3.5]})
    df2.to_csv(d / "lookup.csv", index=False)
    return str(d)


@pytest.fixture(scope="module")
def engine(root):
    return Engine(FileCatalog(root))


def test_parquet_scan_agg(engine):
    out = engine.sql(
        "select grp, count(*) c, sum(val) s, count(maybe) nn from events "
        "group by grp order by grp").to_pandas()
    assert len(out) == 7
    assert int(out.c.sum()) == 1000
    assert int(out.nn.sum()) == 800  # 1 in 5 is NULL
    exp = sum(i * 1.5 for i in range(1000))
    assert np.isclose(out.s.sum(), exp)


def test_parquet_strings_dates(engine):
    out = engine.sql(
        "select name, min(d) lo, max(d) hi from events "
        "where name like 'name_1%' group by name order by name").to_pandas()
    assert list(out.name) == ["name_1", "name_10", "name_11", "name_12"]
    out2 = engine.sql(
        "select count(*) c from events where d >= date '2021-01-01'"
    ).to_pandas()
    assert int(out2.c[0]) == 1000 - 366


def test_csv_join(engine):
    out = engine.sql(
        "select k, s, count(*) c from lookup join events on k = grp "
        "group by k, s order by k").to_pandas()
    assert len(out) == 4
    assert (out.c > 0).all()
    # CSV NULL survives the pipeline (pandas renders object-None as NaN)
    assert pd.isna(out.s[2])


def test_write_parquet_roundtrip(engine, root):
    out = engine.sql("select grp, count(*) c from events group by grp")
    n = write_parquet(out, root + "/summary.parquet")
    assert n == 7
    cat2 = FileCatalog(root)
    e2 = Engine(cat2)
    back = e2.sql("select sum(c) t from summary").to_pandas()
    assert int(back.t[0]) == 1000


def test_parquet_decimal_exact_decode(tmp_path):
    """Decimal128 decodes via exact unscaled integers: values with >16
    significant digits survive (a float64 round-trip would corrupt them)."""
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from presto1_tpu.exec.file_catalog import ParquetTable

    vals = [decimal.Decimal("123456789012345.67"),
            decimal.Decimal("-999999999999999.99"), None]
    path = str(tmp_path / "dec.parquet")
    pq.write_table(
        pa.table({"d": pa.array(vals, type=pa.decimal128(18, 2))}), path)
    c = ParquetTable("t", path).host_column("d")
    assert int(c.data[0]) == 12345678901234567
    assert int(c.data[1]) == -99999999999999999
    assert list(c.validity) == [True, True, False]
