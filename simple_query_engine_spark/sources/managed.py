"""Managed tables: snapshot-versioned DML over immutable Parquet files.

The reference dataset is immutable after load (reference ``src/main.rs:29-30``
— no CREATE/INSERT/UPDATE/DELETE anywhere in its grammar), so this layer is a
pure extension: the mutation surface a lake engine (Delta/Iceberg-style)
builds on top of Spark, re-implemented here with nothing but Parquet files
and JSON manifests.

Design — the three disciplines that make DML work at 100 TB:

- **Immutable data files + manifest snapshots.**  A table is a directory of
  Parquet files plus a ``_manifests/v<N>.json`` chain; each manifest lists
  exactly the files that make up that version.  Readers resolve a manifest
  once and scan only its files — writers never modify a file in place, so
  readers are isolated from concurrent commits for free (snapshot
  isolation), and any historical version stays readable (time travel).
- **Copy-on-write at file granularity.**  DELETE/UPDATE/MERGE first find
  which files actually contain affected rows (a metadata-cheap scan of the
  match predicate over ``_metadata.file_path``), rewrite ONLY those files,
  and carry every untouched file into the new manifest by reference.  A
  predicate touching 0.1% of a 100 TB table rewrites ~0.1% of its files;
  the other 99.9% move as manifest strings.
- **Atomic commit by manifest rename.**  A commit is: write data files,
  then create ``v<N>.json`` with O_EXCL.  Two racing writers both targeting
  version N — one wins, one gets ``TableVersionConflict`` and retries on
  the new snapshot (optimistic concurrency).  On an object store the
  equivalent is a conditional PUT or a metastore CAS; the protocol is the
  same.

Everything heavy is a plain DataFrame write — Catalyst plans the rewrite,
AQE sizes the shuffle, and no row ever passes through the driver.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class TableVersionConflict(RuntimeError):
    """Another writer committed this version first — reread and retry."""


class ManagedTable:
    """A snapshot-versioned Parquet table supporting INSERT / DELETE /
    UPDATE / MERGE with copy-on-write rewrites and time-travel reads."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._manifest_dir = os.path.join(path, "_manifests")

    # -- creation / versions -------------------------------------------------

    @classmethod
    def create(cls, spark: SparkSession, path: str, df: DataFrame) -> "ManagedTable":
        """Materialize ``df`` as version 0 of a new managed table."""
        table = cls(spark, path)
        if table.versions():
            raise ValueError(f"managed table already exists at {path}")
        files = table._write_data_files(df)
        table._commit(0, files)
        return table

    def versions(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        out = []
        for name in os.listdir(self._manifest_dir):
            if name.startswith("v") and name.endswith(".json"):
                out.append(int(name[1:-5]))
        return sorted(out)

    def current_version(self) -> int:
        versions = self.versions()
        if not versions:
            raise FileNotFoundError(f"no managed table at {self.path}")
        return versions[-1]

    # -- read ----------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest snapshot)."""
        files = self._files(self.current_version() if version is None else version)
        if not files:
            # An empty snapshot still needs a schema: replay version 0.
            empty = self.spark.read.parquet(*self._files(0)).limit(0)
            return empty
        return self.spark.read.parquet(*files)

    # -- mutations (each commits one new version) ----------------------------

    def insert(self, df: DataFrame) -> int:
        """Append rows — new files only, no existing file touched."""
        base = self.current_version()
        new_files = self._write_data_files(df)
        return self._commit(base + 1, self._files(base) + new_files)

    def delete_where(self, condition: Column) -> int:
        """Delete matching rows by rewriting only the files that hold them."""
        return self._rewrite(condition, lambda df: df.filter(~condition))

    def update(self, condition: Column, assignments: dict[str, Column]) -> int:
        """Set ``assignments`` on matching rows; untouched files carry over."""

        def apply(df: DataFrame) -> DataFrame:
            return df.withColumns(
                {
                    name: F.when(condition, expr).otherwise(F.col(name))
                    for name, expr in assignments.items()
                }
            )

        return self._rewrite(condition, apply)

    def merge(
        self,
        source: DataFrame,
        on: str,
        update_assignments: dict[str, Column] | None = None,
        insert_not_matched: bool = True,
    ) -> int:
        """Upsert ``source`` by equality on key column ``on``.

        Matched target rows get ``update_assignments`` — expressions
        evaluated in the joined scope, where the target is aliased ``t``
        and the source ``s`` (e.g. ``{"bal": F.col("s.bal")}``); unmatched
        source rows are appended when ``insert_not_matched``.  One commit —
        rewritten match-files plus appended insert-files land in the same
        manifest, so readers never observe a half-applied merge.
        """
        base = self.current_version()
        target_cols = self.read(base).columns
        # SQL MERGE semantics: more than one source row per key is an
        # error, not a silent fan-out of the matched target rows.
        dup = (
            source.groupBy(on)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"merge source has multiple rows for key {on}={dup[0][0]!r}"
            )
        keys = source.select(on).distinct()
        affected = self._affected_files(
            self._with_file_path(base).join(keys, on, "left_semi")
        )

        new_files: list[str] = []
        if affected:
            # __matched marks source presence explicitly — probing a data
            # column would misread legitimately-NULL values as "no match".
            marked = source.withColumn("__matched", F.lit(True))
            joined = (
                self.spark.read.parquet(*affected)
                .alias("t")
                .join(
                    marked.alias("s"),
                    F.col(f"t.{on}") == F.col(f"s.{on}"),
                    "left",
                )
            )
            matched = F.col("s.__matched").isNotNull()
            projected = joined.select(
                *[
                    (
                        F.when(matched, update_assignments[name])
                        .otherwise(F.col(f"t.{name}"))
                        .alias(name)
                        if update_assignments and name in update_assignments
                        else F.col(f"t.{name}").alias(name)
                    )
                    for name in target_cols
                ]
            )
            new_files.extend(self._write_data_files(projected))

        if insert_not_matched:
            existing_keys = self.read(base).select(on).distinct()
            inserts = source.join(existing_keys, on, "left_anti")
            new_files.extend(self._write_data_files(inserts.select(*target_cols)))

        untouched = [f for f in self._files(base) if f not in set(affected)]
        return self._commit(base + 1, untouched + new_files)

    # -- internals -----------------------------------------------------------

    def _rewrite(self, condition: Column, transform) -> int:
        base = self.current_version()
        affected = self._affected_files(self._with_file_path(base).filter(condition))
        new_files: list[str] = []
        if affected:
            rewritten = transform(self.spark.read.parquet(*affected))
            new_files = self._write_data_files(rewritten)
        untouched = [f for f in self._files(base) if f not in set(affected)]
        return self._commit(base + 1, untouched + new_files)

    def _with_file_path(self, version: int) -> DataFrame:
        files = self._files(version)
        if not files:
            return self.read(version).withColumn("file_path", F.lit(None).cast("string"))
        return self.spark.read.parquet(*files).withColumn(
            "file_path", F.col("_metadata.file_path")
        )

    def _affected_files(self, matching_rows: DataFrame) -> list[str]:
        """The distinct data files holding ``matching_rows`` — only file
        PATHS cross to the driver (bounded by file count, never row count),
        normalized back to manifest form (``_metadata.file_path`` yields
        ``file:`` URIs on a local filesystem)."""
        from urllib.parse import unquote, urlparse

        def local(p: str) -> str:
            parsed = urlparse(p)
            return unquote(parsed.path) if parsed.scheme == "file" else p

        return sorted(
            local(row.file_path)
            for row in matching_rows.select("file_path").distinct().collect()
            if row.file_path is not None
        )

    def _write_data_files(self, df: DataFrame) -> list[str]:
        """Write ``df`` as immutable Parquet files; return their paths."""
        subdir = os.path.join(self.path, "data", uuid.uuid4().hex)
        df.write.parquet(subdir)
        return sorted(
            os.path.join(subdir, name)
            for name in os.listdir(subdir)
            if name.endswith(".parquet")
        )

    def _commit(self, version: int, files: list[str]) -> int:
        os.makedirs(self._manifest_dir, exist_ok=True)
        manifest = os.path.join(self._manifest_dir, f"v{version:05d}.json")
        try:
            # O_EXCL create = the commit point.  Exactly one writer can
            # create a given version file; losers see the conflict and
            # retry against the new snapshot.
            with open(manifest, "x") as fh:
                json.dump({"version": version, "files": files}, fh)
        except FileExistsError:
            raise TableVersionConflict(
                f"version {version} of {self.path} was committed concurrently"
            ) from None
        return version

    def _files(self, version: int) -> list[str]:
        manifest = os.path.join(self._manifest_dir, f"v{version:05d}.json")
        with open(manifest) as fh:
            return json.load(fh)["files"]
