"""Tests for the custom Python Data Source connector.

Unit-level: filter-absorption narrows the generated id range, declined
filters are yielded back, partitions split the (narrowed) range without
gaps/overlap.  End-to-end: the connector's distributed read matches an
independently computed expected table, with predicates both absorbed and
declined in the same query.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
)

from simple_query_engine_spark.sources.pydatasource import (
    KINDS,
    ReadingsReader,
    register_readings_source,
)


def _reader(rows=1000, partitions=4) -> ReadingsReader:
    return ReadingsReader({"rows": str(rows), "numPartitions": str(partitions)})


def test_push_filters_narrow_range_and_decline_rest():
    reader = _reader(rows=1000)
    declined = list(
        reader.pushFilters(
            [
                GreaterThan(("reading_id",), 99),
                LessThan(("reading_id",), 500),
                IsNotNull(("kind",)),
                EqualTo(("kind",), "temp"),
            ]
        )
    )
    assert reader.lo == 100 and reader.hi == 500
    assert declined == [EqualTo(("kind",), "temp")]


def test_push_equal_to_pins_single_id():
    reader = _reader(rows=1000)
    assert list(reader.pushFilters([EqualTo(("reading_id",), 42)])) == []
    assert (reader.lo, reader.hi) == (42, 43)
    [part] = reader.partitions()
    assert (part.start, part.end) == (42, 43)


def test_partitions_cover_range_without_overlap():
    reader = _reader(rows=1003, partitions=4)
    list(reader.pushFilters([GreaterThanOrEqual(("reading_id",), 3)]))
    parts = reader.partitions()
    assert len(parts) == 4
    cursor = 3
    for p in parts:
        assert p.start == cursor and p.end > p.start
        cursor = p.end
    assert cursor == 1003
    widths = [p.end - p.start for p in parts]
    assert max(widths) - min(widths) <= 1  # no skewed slice


def test_empty_range_yields_one_empty_partition():
    reader = _reader(rows=10)
    list(reader.pushFilters([GreaterThanOrEqual(("reading_id",), 50)]))
    [part] = reader.partitions()
    assert part.start == part.end


def test_end_to_end_matches_formulas(spark):
    register_readings_source(spark)
    n = 500
    df = (
        spark.read.format("sqe_readings")
        .option("rows", n)
        .option("numPartitions", 3)
        .load()
        .filter((F.col("reading_id") >= 100) & (F.col("kind") == "humidity"))
    )
    got = {r["reading_id"]: r for r in df.collect()}
    expected_ids = [i for i in range(100, n) if i % 3 == 1]
    assert sorted(got) == expected_ids
    for i in expected_ids:
        row = got[i]
        assert row["sensor_id"] == i % 97
        assert row["kind"] == KINDS[i % 3]
        assert abs(row["reading"] - ((i * 37) % 1000) / 10.0) < 1e-12
