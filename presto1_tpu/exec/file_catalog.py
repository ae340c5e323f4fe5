"""File-backed catalog: Parquet and CSV tables (lib/trino-parquet /
trino-hive file-format analog).

A directory becomes a catalog: every ``*.parquet`` / ``*.csv`` file is a
table named after its stem.  Columns materialise lazily per query (the
LazyBlock-at-scan design), mapped onto the engine's device model:

* integers -> bigint/integer, floats -> double, bools -> boolean
* decimal128 -> decimal(p,s) as scaled int64
* date32/timestamp -> date (days)
* strings/binary -> sorted dictionary codes (device int32 + host values)

Writes go through ``write_parquet`` (ConnectorPageSink analog).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..types import (
    BIGINT, BOOLEAN, DATE, DOUBLE, DecimalType, INTEGER, SqlType, VARCHAR,
)
from ..batch import Column, RecordBatch, encode_dictionary
from .catalog import Catalog, Table


def _sql_type(arrow_type) -> SqlType:
    import pyarrow as pa

    if pa.types.is_decimal(arrow_type):
        return DecimalType(arrow_type.precision, arrow_type.scale)
    if pa.types.is_boolean(arrow_type):
        return BOOLEAN
    if pa.types.is_int32(arrow_type) or pa.types.is_int16(arrow_type) \
            or pa.types.is_int8(arrow_type):
        return INTEGER
    if pa.types.is_integer(arrow_type):
        return BIGINT
    if pa.types.is_floating(arrow_type):
        return DOUBLE
    if pa.types.is_date(arrow_type) or pa.types.is_timestamp(arrow_type):
        return DATE
    return VARCHAR  # strings, binary, everything else via str()


class ParquetTable(Table):
    def __init__(self, name: str, path: str):
        import pyarrow.parquet as pq

        self.path = path
        self._pf = pq.ParquetFile(path)
        schema = []
        arrow = self._pf.schema_arrow
        self._arrow_types = {}
        for field in arrow:
            t = _sql_type(field.type)
            schema.append((field.name, t))
            self._arrow_types[field.name] = field.type
        super().__init__(name, schema)

    @property
    def num_rows(self) -> int:
        return self._pf.metadata.num_rows

    def host_column(self, column: str) -> Column:
        import pyarrow as pa

        t = self.schema[column]
        arr = self._pf.read([column]).column(column)
        validity = None
        if arr.null_count:
            validity = ~np.asarray(arr.is_null())
        if t.is_string:
            vals = arr.to_pandas().astype(str).to_numpy()
            if validity is not None:
                vals = np.where(validity, vals, "")
            dictionary, codes = encode_dictionary(np.asarray(vals, dtype="U"))
            return Column(codes, t, validity=validity, dictionary=dictionary)
        at = self._arrow_types[column]
        if t.kind == "decimal":
            # decode decimal128 exactly via python Decimals (the reference
            # reads decimal128 unscaled ints exactly; a float64 cast
            # corrupts values beyond ~15-16 significant digits). Unscaled
            # values that overflow int64 raise instead of corrupting.
            import decimal as _dec

            vals = arr.to_pylist()
            out = np.zeros(len(vals), dtype=np.int64)
            with _dec.localcontext() as ctx:
                ctx.prec = 76  # wide enough for decimal128 rescales
                for i, v in enumerate(vals):
                    if v is None:
                        continue
                    u = int(v.scaleb(t.scale).to_integral_value())
                    if not (-(2 ** 63) <= u < 2 ** 63):
                        raise OverflowError(
                            f"decimal value {v} does not fit int64 at "
                            f"scale {t.scale} (column {column})")
                    out[i] = u
            data = out
        elif t.kind == "date":
            if pa.types.is_timestamp(at):
                arr = pa.compute.cast(arr, pa.date32())
            data = np.asarray(arr.to_pandas().fillna(
                np.datetime64("1970-01-01"))).astype(
                "datetime64[D]").astype(np.int32)
        else:
            data = arr.to_pandas()
            fill = False if t.kind == "boolean" else 0
            data = np.asarray(data.fillna(fill)).astype(t.np_dtype)
        return Column(data, t, validity=validity)

    def _load(self, column: str) -> Column:
        c = self.host_column(column)
        return Column(jnp.asarray(c.data), c.type,
                      validity=None if c.validity is None
                      else jnp.asarray(c.validity),
                      dictionary=c.dictionary)


class CsvTable(Table):
    def __init__(self, name: str, path: str):
        import pandas as pd

        self.path = path
        self._df = pd.read_csv(path)
        import pandas as pd

        schema = []
        for col in self._df.columns:
            dt = self._df[col].dtype
            if pd.api.types.is_bool_dtype(dt):
                t = BOOLEAN
            elif pd.api.types.is_integer_dtype(dt):
                t = BIGINT
            elif pd.api.types.is_float_dtype(dt):
                t = DOUBLE
            elif pd.api.types.is_datetime64_any_dtype(dt):
                t = DATE
            else:
                t = VARCHAR
            schema.append((col, t))
        super().__init__(name, schema)

    @property
    def num_rows(self) -> int:
        return len(self._df)

    def host_column(self, column: str) -> Column:
        t = self.schema[column]
        s = self._df[column]
        validity = None
        if s.isna().any():
            validity = ~s.isna().to_numpy()
        if t.is_string:
            vals = s.fillna("").astype(str).to_numpy()
            dictionary, codes = encode_dictionary(np.asarray(vals, dtype="U"))
            return Column(codes, t, validity=validity, dictionary=dictionary)
        if t.kind == "date":
            data = s.fillna(np.datetime64("1970-01-01")).to_numpy().astype(
                "datetime64[D]").astype(np.int32)
        else:
            fill = False if t.kind == "boolean" else 0
            data = s.fillna(fill).to_numpy().astype(t.np_dtype)
        return Column(data, t, validity=validity)

    def _load(self, column: str) -> Column:
        c = self.host_column(column)
        return Column(jnp.asarray(c.data), c.type,
                      validity=None if c.validity is None
                      else jnp.asarray(c.validity),
                      dictionary=c.dictionary)


class FileCatalog(Catalog):
    """Every *.parquet / *.csv under ``root`` is a table (stem = name)."""

    def __init__(self, root: str):
        super().__init__()
        self.root = root
        for fn in sorted(os.listdir(root)):
            path = os.path.join(root, fn)
            stem, ext = os.path.splitext(fn)
            if ext == ".parquet":
                self.tables[stem] = ParquetTable(stem, path)
            elif ext == ".csv":
                self.tables[stem] = CsvTable(stem, path)


def write_parquet(batch: RecordBatch, path: str) -> int:
    """RecordBatch -> parquet file (ConnectorPageSink analog)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = int(batch.num_rows) if not isinstance(batch.num_rows, int) \
        else batch.num_rows
    arrays, names = [], []
    for name, c in batch.columns.items():
        vals = c.decode(n)
        arrays.append(pa.array(list(vals)))
        names.append(name)
    pq.write_table(pa.table(arrays, names=names), path)
    return n
