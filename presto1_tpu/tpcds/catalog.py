"""TPC-DS catalog: lazy-column tables over the deterministic generator
(the plugin/trino-tpcds connector analog; same Table/Catalog SPI as the
TPC-H connector in exec/catalog.py)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..batch import Column, encode_dictionary
from ..exec.catalog import Catalog, Table
from .dbgen import TpcdsGenerator
from .schema import PRIMARY_KEYS, TABLES


class TpcdsTable(Table):
    def __init__(self, name: str, gen: TpcdsGenerator):
        super().__init__(name, TABLES[name])
        self.unique_keys = PRIMARY_KEYS.get(name, [])
        self.gen = gen

    @property
    def num_rows(self) -> int:
        return self.gen.num_rows(self.name)

    def host_column(self, column: str) -> Column:
        t = self.schema[column]
        values, validity = self.gen.column(self.name, column)
        if t.is_string:
            dictionary, codes = encode_dictionary(
                np.asarray(values, dtype="U"))
            return Column(codes, t, validity=validity, dictionary=dictionary)
        dt = np.int64 if t.kind == "decimal" else t.np_dtype
        return Column(np.asarray(values).astype(dt, copy=False), t,
                      validity=validity)

    def _load(self, column: str) -> Column:
        c = self.host_column(column)
        return Column(jnp.asarray(c.data), c.type,
                      validity=None if c.validity is None
                      else jnp.asarray(c.validity),
                      dictionary=c.dictionary)


class TpcdsCatalog(Catalog):
    """schema 'tiny' = SF0.01 (like the reference's tpch tiny)."""

    def __init__(self, schema: str = "tiny", sf: Optional[float] = None):
        super().__init__()
        if sf is None:
            sf = 0.01 if schema == "tiny" else float(
                schema.replace("sf", ""))
        self.sf = sf
        gen = TpcdsGenerator(sf)
        for name in TABLES:
            self.tables[name] = TpcdsTable(name, gen)
