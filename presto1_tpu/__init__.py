"""presto1_tpu — a TPU-native distributed SQL query-execution engine.

A from-scratch re-design of the reference engine (Trino 352) for TPU hardware:

* Columnar table shards are dicts of fixed-width JAX device arrays in HBM
  (replacing ``io.trino.spi.Page`` / ``Block``; see reference
  ``core/trino-spi/src/main/java/io/trino/spi/Page.java:18``).
* A plan fragment compiles to one jitted SPMD XLA program over a
  ``jax.sharding.Mesh`` (replacing Trino's Driver/TaskExecutor loop,
  reference ``core/trino-main/.../operator/Driver.java:262``).
* Hot operators (hash join, group-by aggregation, sort, filter/project)
  are XLA-native designs — sort/segment-reduce aggregation, sorted-build +
  vectorized-searchsorted join probe — with Pallas kernels for the
  data-dependent inner loops.
* The distributed exchange is hash-partitioning + XLA collectives over ICI
  (replacing Trino's HTTP page shuffle, reference
  ``core/trino-main/.../operator/ExchangeClient.java:56``).
* The SQL frontend (lexer → parser → analyzer → logical planner →
  optimizer → fragmenter) is pure Python, mirroring the reference stack
  ``core/trino-parser`` / ``sql/analyzer`` / ``sql/planner``.
"""

import jax

# The engine requires 64-bit integers (BIGINT keys, scaled-decimal money
# arithmetic) and 64-bit floats (SQL DOUBLE).  TPC-H orderkeys exceed int32
# at SF>=30.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .types import (  # noqa: E402
    BIGINT, INTEGER, DOUBLE, BOOLEAN, DATE, VARCHAR, DecimalType, SqlType,
)
from .batch import Column, RecordBatch  # noqa: E402

__all__ = [
    "BIGINT", "INTEGER", "DOUBLE", "BOOLEAN", "DATE", "VARCHAR",
    "DecimalType", "SqlType", "Column", "RecordBatch",
]
