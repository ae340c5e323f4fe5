"""Writable in-memory tables.

The analog of the reference's trino-memory plugin
(``plugin/trino-memory``, MemoryPagesStore): CREATE TABLE / INSERT targets
used heavily in tests, plus the blackhole-style sink.  Rows accumulate as
host numpy columns; device Columns materialise lazily and invalidate on
write (same lazy-scan contract as the TPC-H catalog).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..batch import Column, RecordBatch, encode_dictionary
from ..types import SqlType
from .catalog import Table


class MemoryTable(Table):
    def __init__(self, name: str, schema: List[Tuple[str, SqlType]]):
        super().__init__(name, schema)
        self._data: Dict[str, np.ndarray] = {
            c: np.empty(0, dtype=object if t.is_string else t.np_dtype)
            for c, t in schema
        }
        self._rows = 0

    @property
    def num_rows(self) -> int:
        return self._rows

    def append(self, batch: RecordBatch) -> int:
        n = batch.num_rows if isinstance(batch.num_rows, int) \
            else int(batch.num_rows)
        cols = list(batch.columns.values())
        for (cname, t), src in zip(self.schema.items(), cols):
            vals = src.decode(n)
            if t.is_string:
                vals = np.asarray(vals, dtype=object)
            elif t.kind == "decimal":
                vals = np.round(np.asarray(vals, dtype=np.float64)
                                * 10 ** t.scale).astype(np.int64)  # type: ignore[attr-defined]
            elif t.kind == "date":
                vals = (np.asarray(vals, dtype="datetime64[D]")
                        - np.datetime64("1970-01-01", "D")).astype(np.int32)
            else:
                vals = np.asarray(vals).astype(t.np_dtype)
            self._data[cname] = np.concatenate([self._data[cname], vals])
        self._rows += n
        self._cache.clear()  # invalidate lazily-materialised device columns
        self._ranges.clear()
        return n

    def page_sink(self):
        """Writable half of the connector SPI
        (``spi/connector/ConnectorPageSink.java``): pages buffer
        invisibly; ``finish()`` commits them in one append (readers never
        observe a partial write — the TableFinishOperator contract)."""
        table = self

        from ..spi.connector import ConnectorPageSink

        class _Sink(ConnectorPageSink):
            def __init__(self):
                self._pages: list = []
                self._done = False

            def append(self, batch: RecordBatch) -> int:
                assert not self._done, "sink already finished/aborted"
                n = batch.num_rows if isinstance(batch.num_rows, int) \
                    else int(batch.num_rows)
                self._pages.append(batch)
                return n

            def finish(self) -> int:
                self._done = True
                total = 0
                for b in self._pages:
                    total += table.append(b)
                self._pages.clear()
                return total

            def abort(self) -> None:
                self._done = True
                self._pages.clear()

        return _Sink()

    def _load(self, column: str) -> Column:
        t = self.schema[column]
        vals = self._data[column]
        if t.is_string:
            dictionary, codes = encode_dictionary(
                np.asarray(vals, dtype="U") if len(vals) else
                np.empty(0, dtype="U1"))
            pad = max(len(codes), 1)
            codes = np.resize(codes, pad) if len(codes) else np.zeros(1, np.int32)
            return Column(jnp.asarray(codes), t, dictionary=dictionary)
        arr = vals.astype(t.np_dtype, copy=False)
        if len(arr) == 0:
            arr = np.zeros(1, dtype=t.np_dtype)
        return Column(jnp.asarray(arr), t)
