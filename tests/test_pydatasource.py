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


def test_stream_restart_resumes_from_committed_offset(spark, tmp_path):
    """Exactly-once across restart: run 1 sees 300 ids, stops; the source
    'grows' to 500; run 2 on the same checkpoint must emit only 300..499 —
    no duplicates, no gaps."""
    register_readings_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain(rows):
        q = (
            spark.readStream.format("sqe_readings")
            .option("rows", rows)
            .option("numPartitions", 4)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(300)
    drain(500)
    ids = sorted(r["reading_id"] for r in spark.read.parquet(out).collect())
    assert ids == list(range(500))


def test_manifest_sink_roundtrip_ignores_orphans(spark, tmp_path):
    """Only manifest-listed files are readable: an orphan parquet file in
    data/ (a crashed task's leftovers) must not leak into reads."""
    from simple_query_engine_spark.sources.pydatasource import (
        read_manifest_parquet,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    path = str(tmp_path / "sink")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("doubled")
    )
    df.write.format("sqe_manifest_parquet").mode("append").save(path)
    back = read_manifest_parquet(spark, path)
    assert sorted(r["id"] for r in back.collect()) == list(range(100))
    # drop an orphan (same schema) into data/ — crashed-task simulation
    df.limit(7).write.mode("append").parquet(str(tmp_path / "orphan"))
    import glob
    import shutil

    orphan = glob.glob(str(tmp_path / "orphan" / "*.parquet"))[0]
    shutil.copy(orphan, f"{path}/data/part-99999-deadbeef.parquet")
    assert read_manifest_parquet(spark, path).count() == 100


def test_manifest_writer_abort_removes_task_files(tmp_path):
    import pyarrow as pa

    from simple_query_engine_spark.sources.pydatasource import (
        ManifestParquetWriter,
        _FileCommit,
    )

    writer = ManifestParquetWriter({"path": str(tmp_path / "w")})
    batch = pa.record_batch([pa.array([1, 2, 3])], names=["x"])
    msg = writer.write(iter([batch]))
    assert msg.rows == 3
    import os

    assert os.path.exists(f"{tmp_path}/w/data/{msg.filename}")
    writer.abort([msg, None])
    assert not os.path.exists(f"{tmp_path}/w/data/{msg.filename}")
    # empty partition produces no file and commit skips it
    empty = writer.write(iter([]))
    assert empty == _FileCommit(None, 0)
    writer.commit([msg2 := writer.write(iter([batch])), empty])
    import json

    with open(f"{tmp_path}/w/manifest.json") as fh:
        manifest = json.load(fh)
    assert manifest["total_rows"] == 3
    assert [f["name"] for f in manifest["files"]] == [msg2.filename]


def test_manifest_sink_second_append_merges_not_replaces(spark, tmp_path):
    """Appending twice to the same path must accumulate BOTH jobs' rows —
    replacing the manifest would silently orphan the first job's files."""
    from simple_query_engine_spark.sources.pydatasource import (
        read_manifest_parquet,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    path = str(tmp_path / "sink")
    spark.range(0, 5).write.format("sqe_manifest_parquet").mode("append").save(path)
    spark.range(5, 9).write.format("sqe_manifest_parquet").mode("append").save(path)
    got = sorted(r.id for r in read_manifest_parquet(spark, path).collect())
    assert got == list(range(9))


def test_manifest_sink_empty_commit_reads_back_empty(spark, tmp_path):
    """A committed zero-row write is valid output: the reader must return
    an empty DataFrame with the recorded schema, not refuse to read."""
    from simple_query_engine_spark.sources.pydatasource import (
        read_manifest_parquet,
        register_manifest_sink,
    )

    register_manifest_sink(spark)
    path = str(tmp_path / "sink_empty")
    spark.range(0, 5).filter(F.lit(False)).write.format(
        "sqe_manifest_parquet"
    ).mode("append").save(path)
    df = read_manifest_parquet(spark, path)
    assert df.count() == 0
    assert df.columns == ["id"]


def test_stream_reader_refuses_offset_regression():
    """A shrunken source (rows lowered below the committed offset) must
    fail fast, not plan an empty batch that lets Spark commit the
    regressed offset and replay old ids when the source grows again."""
    import pytest

    from simple_query_engine_spark.sources.pydatasource import (
        ReadingsStreamReader,
    )

    reader = ReadingsStreamReader({"rows": "300"})
    with pytest.raises(ValueError, match="offset regression"):
        reader.partitions({"next": 500}, {"next": 300})


def _race_sink_commit(path, barrier, writer_id, results):
    """One 'driver commit' process in the concurrent-append race below."""
    from simple_query_engine_spark.sources.pydatasource import (
        ManifestParquetWriter,
        _FileCommit,
    )

    writer = ManifestParquetWriter({"path": path})
    barrier.wait()  # maximize contention: all commits merge "at once"
    try:
        writer.commit([_FileCommit(f"part-writer-{writer_id}.parquet", 10)])
        results.put(("ok", writer_id))
    except Exception as exc:  # pragma: no cover - diagnostic aid
        results.put(("err", repr(exc)))


def test_manifest_sink_concurrent_commits_lose_no_files(tmp_path):
    """N real processes committing appends to the same path concurrently:
    the merged manifest must list ALL N files (the unlocked read-merge-write
    this guards against let the last os.replace orphan earlier jobs'
    files — a silent lost update)."""
    import json
    import multiprocessing
    import os

    path = str(tmp_path / "sink_race")
    ctx = multiprocessing.get_context("fork")
    n_writers = 8
    barrier = ctx.Barrier(n_writers)
    results = ctx.Queue()
    procs = [
        ctx.Process(target=_race_sink_commit, args=(path, barrier, i, results))
        for i in range(n_writers)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    outcomes = [results.get(timeout=5) for _ in range(n_writers)]
    assert all(verdict == "ok" for verdict, _ in outcomes), outcomes
    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    names = [f["name"] for f in manifest["files"]]
    assert sorted(names) == sorted(
        f"part-writer-{i}.parquet" for i in range(n_writers)
    )
    assert manifest["total_rows"] == 10 * n_writers
    # No stray temp manifests left behind by the serialized merges.
    leftovers = [
        f for f in os.listdir(path) if f.startswith(".manifest.") and f.endswith(".tmp")
    ]
    assert leftovers == []
