"""Managed-table DML: snapshot versioning, copy-on-write file hygiene,
atomic commits, time travel, and merge semantics."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from simple_query_engine_spark.sources.managed import (
    ManagedTable,
    TableVersionConflict,
)


@pytest.fixture
def people(spark):
    return spark.createDataFrame(
        [(i, f"name_{i}", i * 10.0, "even" if i % 2 == 0 else "odd") for i in range(20)],
        ["id", "name", "balance", "parity"],
    )


def _rows(df):
    return sorted(map(tuple, df.select("id", "name", "balance", "parity").collect()))


def test_create_read_roundtrip_and_versions(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    assert t.versions() == [0]
    assert _rows(t.read()) == _rows(people)
    with pytest.raises(ValueError, match="already exists"):
        ManagedTable.create(spark, str(tmp_path / "t"), people)


def test_insert_appends_without_touching_existing_files(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    before = set(t._files(0))
    extra = spark.createDataFrame(
        [(100, "name_100", 1000.0, "even")], ["id", "name", "balance", "parity"]
    )
    version = t.insert(extra)
    assert version == 1
    after = t._files(1)
    assert before <= set(after)  # every v0 file carried over by reference
    assert t.read().count() == 21
    assert t.read(version=0).count() == 20  # time travel unaffected


def test_delete_rewrites_only_affected_files(spark, tmp_path, people):
    # Build a table whose even and odd rows live in disjoint files (create
    # evens, insert odds — inserts never rewrite), then delete the odds and
    # assert every even file carried over by reference, untouched.
    evens = people.filter(F.col("parity") == "even").coalesce(1)
    odds = people.filter(F.col("parity") == "odd").coalesce(1)
    t = ManagedTable.create(spark, str(tmp_path / "t"), evens)
    even_files = set(t._files(0))
    t.insert(odds)
    assert even_files <= set(t._files(1))

    t.delete_where(F.col("parity") == "odd")
    v2_files = set(t._files(2))
    assert even_files <= v2_files, "files without matches must carry over"
    assert not (set(t._files(1)) - even_files) & v2_files, "odd files rewritten"
    remaining = t.read().collect()
    assert all(r.parity == "even" for r in remaining)
    assert len(remaining) == 10
    # Deleted rows still visible at earlier versions (snapshot isolation).
    assert t.read(version=1).count() == 20


def test_update_sets_only_matching_rows(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    t.update(F.col("id") < 5, {"balance": F.col("balance") + 1000.0})
    got = {r.id: r.balance for r in t.read().collect()}
    for i in range(20):
        assert got[i] == i * 10.0 + (1000.0 if i < 5 else 0.0)


def test_merge_upserts(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    source = spark.createDataFrame(
        [(3, "updated_3", 999.0, "odd"), (200, "name_200", 2000.0, "even")],
        ["id", "name", "balance", "parity"],
    )
    t.merge(
        source,
        on="id",
        update_assignments={"name": F.col("s.name"), "balance": F.col("s.balance")},
    )
    got = {r.id: (r.name, r.balance) for r in t.read().collect()}
    assert len(got) == 21
    assert got[3] == ("updated_3", 999.0)  # matched → updated
    assert got[4] == ("name_4", 40.0)  # unmatched target → untouched
    assert got[200] == ("name_200", 2000.0)  # unmatched source → inserted


def test_merge_matched_probe_survives_null_data_columns(spark, tmp_path):
    """A matched source row whose data columns are all NULL must still
    count as matched (the probe is an explicit marker, not a data column)."""
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    t = ManagedTable.create(spark, str(tmp_path / "t"), target)
    source = spark.createDataFrame([(1, None)], "id: bigint, val: string")
    t.merge(source, on="id", update_assignments={"val": F.col("s.val")})
    got = {r.id: r.val for r in t.read().collect()}
    assert got == {1: None, 2: "b"}


def test_merge_rejects_duplicate_source_keys(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    source = spark.createDataFrame(
        [(1, "a", 1.0, "odd"), (1, "b", 2.0, "odd")], people.schema
    )
    with pytest.raises(ValueError, match="multiple rows"):
        t.merge(source, on="id", update_assignments={"name": F.col("s.name")})


def test_concurrent_commit_conflict(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    extra = spark.createDataFrame([(42, "x", 0.0, "even")], people.schema)
    t.insert(extra)
    # Simulate a racing writer that resolved the same base version.
    stale_files = t._files(0)
    with pytest.raises(TableVersionConflict):
        t._commit(1, stale_files)


def test_empty_snapshot_keeps_schema(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    t.delete_where(F.lit(True))
    assert t.read().count() == 0
    assert t.read().columns == ["id", "name", "balance", "parity"]


def test_manifest_files_all_exist(spark, tmp_path, people):
    t = ManagedTable.create(spark, str(tmp_path / "t"), people)
    t.delete_where(F.col("id") >= 15)
    t.insert(spark.createDataFrame([(50, "z", 5.0, "even")], people.schema))
    for version in t.versions():
        for path in t._files(version):
            assert os.path.exists(path), (version, path)
