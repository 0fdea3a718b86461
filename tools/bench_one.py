"""Focused micro-bench: one or more catalog queries, best-of-N with calibration.

Usage: python tools/bench_one.py <query_name>[,<query_name>...] [runs] [sf_dir]

Same measurement discipline as bench.py (cached inputs, noop sink, warm
codegen, JVM-sum calibration probe) but for a chosen subset with more
repetitions — the tool for chasing a per-query regression without paying
for the whole suite.  Prints one JSON line per query with every run's
seconds, the min, and the calibration, plus the formatted physical plan
to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    from simple_query_engine_spark.session import get_spark
    from simple_query_engine_spark.sources.catalog import load_tables

    import __spark_entry__ as entrymod

    # Same driver-heap sizing as bench.py: the 1g local default OOMs once
    # the cached input tables plus an entry's session caches coexist.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark(
        app_name="sqe-bench-one",
        extra_conf={"spark.driver.memory": driver_mem},
    )
    queries = entrymod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1
    for df in load_tables(spark, sf_dir).values():
        df.cache().count()

    def run(name: str) -> float:
        start = time.time()
        df = queries[name](spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return round(time.time() - start, 3)

    probe = lambda: spark.range(500_000_000, numPartitions=32).selectExpr(
        "sum(id * 2)"
    ).collect()
    probe()  # codegen warm-up

    for name in names:
        times = [run(name) for _ in range(runs + 1)][1:]  # first run warms codegen
        start = time.time()
        probe()
        calibration = round(time.time() - start, 3)
        queries[name](spark, sf_dir).explain("formatted")
        print(
            json.dumps(
                {
                    "query": name,
                    "runs": times,
                    "min": min(times),
                    "calibration_jvm_sum_sec": calibration,
                    "min_normalized": round(min(times) / calibration, 2),
                    "sf_dir": sf_dir,
                }
            )
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
