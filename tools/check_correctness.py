"""Local emulation of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry at a scale factor, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + column names + order-insensitive values (columns sorted by
name, rows sorted, floats compared to 1e-9).

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from simple_query_engine_spark.sources.catalog import TABLE_NAMES


def normalize(rows: list[tuple]) -> list[tuple]:
    def key(row):
        return tuple(
            (val is None, str(type(val)), str(val)) for val in row
        )

    return sorted(rows, key=key)


def values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b or str(a) == str(b)


def compare(spark_rows, duck_rows, spark_cols, duck_cols) -> str | None:
    if sorted(spark_cols) != sorted(duck_cols):
        return f"schema mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    spark_order = [spark_cols.index(c) for c in sorted(spark_cols)]
    duck_order = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_rows = normalize([tuple(r[i] for i in spark_order) for r in spark_rows])
    d_rows = normalize([tuple(r[i] for i in duck_order) for r in duck_rows])
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for sv, dv, col in zip(sr, dr, sorted(spark_cols)):
            if not values_equal(sv, dv):
                return f"value mismatch at sorted-row {i} col {col}: spark={sv!r} duck={dv!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:]

    import __spark_entry__ as entrymod
    from simple_query_engine_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures, passes, rows_only = [], [], []
    for name, fn in queries.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        start = time.time()
        try:
            result = fn(spark, sf_dir)
            spark_cols = result.columns
            spark_rows = [tuple(r) for r in result.collect()]
        except Exception as error:
            failures.append((name, f"SPARK ERROR: {error}"))
            print(f"FAIL  {name}: spark error: {str(error)[:300]}")
            continue
        elapsed = time.time() - start
        if name not in oracles:
            rows_only.append(name)
            print(f"rows-only  {name}: {len(spark_rows)} rows  ({elapsed:.1f}s)")
            continue
        try:
            duck = con.sql(oracles[name])
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as error:
            failures.append((name, f"DUCKDB ERROR: {error}"))
            print(f"FAIL  {name}: duckdb error: {str(error)[:300]}")
            continue
        problem = compare(spark_rows, duck_rows, spark_cols, duck_cols)
        if problem:
            failures.append((name, problem))
            print(f"FAIL  {name}: {problem}")
        else:
            passes.append(name)
            print(f"ok    {name}: {len(spark_rows)} rows  ({elapsed:.1f}s)")

    print(
        f"\n{len(passes)} ok, {len(rows_only)} rows-only, {len(failures)} failed"
    )
    for name, problem in failures:
        print(f"  FAIL {name}: {problem[:200]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
