"""Custom connector via the Python Data Source API (Spark 4).

The reference engine has exactly one source — a CSV file loaded whole
into memory (reference ``src/table.rs:87-109``, ``src/main.rs:27-29``).
Spark's extension point for "a source the built-ins don't cover" is the
Python Data Source API (``pyspark.sql.datasource``): a pure-Python
connector that still gets the full distributed treatment — the driver
plans one :class:`InputPartition` per split, every executor calls
``read(partition)`` independently, and supported predicates are *pushed
into the connector* before a single row is produced.

``ReadingsDataSource`` is a deterministic synthetic "sensor readings"
connector built on that API.  It exists to prove the plumbing, so it is
designed for verifiability end-to-end:

- **Deterministic rows.** Row ``i`` is a pure function of ``i`` (no RNG,
  no clock), so an independent engine can regenerate the exact table —
  the DuckDB oracle rebuilds it from ``range()`` with the same closed
  forms and the gate hash-matches values.
- **Partition-parallel.** ``partitions()`` splits the id range into
  ``numPartitions`` contiguous slices; each executor generates its slice
  vectorized (numpy → one Arrow RecordBatch per 64k rows).  At 100 TB
  this is the shape that matters: no driver-side row generation, no
  skew (slices are equal width), and Arrow batches avoid per-row Python.
- **Real predicate pushdown.** ``pushFilters`` absorbs range predicates
  on ``reading_id`` (``>`` ``>=`` ``<`` ``<=`` ``=``) by *narrowing the
  generated id range* — the connector-side analogue of parquet row-group
  pruning: filtered-out rows are never materialized anywhere.  Filters
  it cannot handle (e.g. on ``kind``) are returned to Spark, which
  evaluates them post-scan — the documented cooperative contract.

Row formulas (shared with the DuckDB oracle in ``operators/storage.py``
— keep in sync):

    reading_id = i
    sensor_id  = i % 97
    kind       = ('temp', 'humidity', 'pressure')[i % 3]
    reading    = ((i * 37) % 1000) / 10.0
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.session import SparkSession

READINGS_SCHEMA_DDL = (
    "reading_id BIGINT, sensor_id BIGINT, kind STRING, reading DOUBLE"
)
KINDS = ("temp", "humidity", "pressure")
_BATCH_ROWS = 65536


@dataclass
class _IdSlice(InputPartition):
    """One contiguous [start, end) slice of the reading_id range."""

    start: int
    end: int


def _generate_batch(start: int, end: int):
    """Vectorized generation of rows [start, end) as one Arrow batch."""
    import numpy as np
    import pyarrow as pa

    ids = np.arange(start, end, dtype=np.int64)
    kinds = np.array(KINDS)[ids % 3]
    return pa.record_batch(
        [
            pa.array(ids, type=pa.int64()),
            pa.array(ids % 97, type=pa.int64()),
            pa.array(kinds, type=pa.string()),
            pa.array(((ids * 37) % 1000) / 10.0, type=pa.float64()),
        ],
        names=["reading_id", "sensor_id", "kind", "reading"],
    )


class ReadingsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.lo = 0
        self.hi = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb reading_id range predicates into [lo, hi); yield the rest.

        Yielded filters are re-evaluated by Spark after the scan, so
        declining a filter is always safe — absorbing one is the
        optimization.  IsNotNull is absorbed on any column (the generator
        never produces nulls).
        """
        for f in filters:
            if isinstance(f, IsNotNull):
                continue
            if getattr(f, "attribute", None) == ("reading_id",):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            yield f

    def partitions(self) -> Sequence[InputPartition]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.num_partitions)
        width, extra = divmod(hi - lo, n)
        slices, cursor = [], lo
        for i in range(n):
            step = width + (1 if i < extra else 0)
            if step == 0:
                break
            slices.append(_IdSlice(cursor, cursor + step))
            cursor += step
        return slices or [_IdSlice(lo, lo)]

    def read(self, partition: _IdSlice):
        for start in range(partition.start, partition.end, _BATCH_ROWS):
            yield _generate_batch(start, min(start + _BATCH_ROWS, partition.end))


class ReadingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sqe_readings"

    def schema(self) -> str:
        return READINGS_SCHEMA_DDL

    def reader(self, schema) -> ReadingsReader:
        return ReadingsReader(self.options)


def register_readings_source(spark: SparkSession) -> None:
    """Register the connector (idempotent — re-registration replaces).

    Also enables Python-source filter pushdown on sessions not built by
    :func:`simple_query_engine_spark.session.get_spark` (the conf is
    runtime-settable; without it Spark refuses to plan a reader that
    implements ``pushFilters``).
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ReadingsDataSource)
