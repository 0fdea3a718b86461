"""End-to-end tour for users coming from the reference engine.

Run: python examples/demo.py [sf_dir]      (defaults to /root/testdata/sf0.001)

Shows the three API layers:
1. the reference's PROJECT/FILTER mini-language on a CSV (what the
   reference REPL does),
2. the same queries + full SQL over a multi-table parquet catalog,
3. the operator catalog (dedup / similarity / streaming) programmatically.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_query_engine_spark import execute, get_spark, load_tables, parse
from simple_query_engine_spark.repl import format_result
from simple_query_engine_spark.sources.readers import read_csv

CITIES_CSV = """city,country,population,area_km2
Metroville,Freedonia,4100000,512.5
Portsbury,Freedonia,1900000,210.0
Lakewood,Sylvania,2750000,340.8
Hillford,Sylvania,800000,95.2
Bayton,Atlantis,3300000,410.0
"""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="sqe-demo")

    # --- 1. reference parity: mini-language over one CSV -----------------
    csv_path = os.path.join(tempfile.mkdtemp(), "cities.csv")
    with open(csv_path, "w") as f:
        f.write(CITIES_CSV)
    cities = read_csv(spark, csv_path)
    for text in (
        "PROJECT city, country FILTER population > 2000000",
        'PROJECT city FILTER country = "Sylvania"',
        "PROJECT city FILTER area_km2 > 300",  # float column: deviation §7.1.3
    ):
        print(f"\n>>> {text}")
        print(format_result(execute(parse(text), cities)))

    # --- 2. multi-table catalog + SQL ------------------------------------
    tables = load_tables(spark, sf_dir)
    print("\n>>> catalog tables:", ", ".join(sorted(tables)))
    print(
        format_result(
            spark.sql(
                """
                SELECT r_name, COUNT(*) AS nations
                FROM region JOIN nation ON r_regionkey = n_regionkey
                GROUP BY r_name ORDER BY r_name
                """
            )
        )
    )

    # --- 3. the operator catalog ------------------------------------------
    from simple_query_engine_spark.operators.dedup import q_dedup_minhash_lsh
    from simple_query_engine_spark.operators.similarity import q_sim_topk_bruteforce

    near_dups = q_dedup_minhash_lsh(spark, sf_dir)
    print(f"\n>>> MinHash-LSH near-duplicate pairs: {near_dups.count()}")
    near_dups.show(5)

    top_k = q_sim_topk_bruteforce(spark, sf_dir)
    print(">>> cosine top-k for query vector 0:")
    top_k.filter("query_id = 0").orderBy("sim_rank").show(5)

    # --- 4. layout + composed pipeline ------------------------------------
    from simple_query_engine_spark.operators.pipeline import (
        q_pipeline_corpus_curation,
    )
    from simple_query_engine_spark.operators.storage import (
        q_events_partition_prune,
    )

    print(">>> date-partitioned events, one-week window (pruned scan):")
    q_events_partition_prune(spark, sf_dir).orderBy("event_type").show()

    print(">>> corpus curation (quality gate → exact dedup → LSH near-dup drop):")
    q_pipeline_corpus_curation(spark, sf_dir).orderBy("lang").show()

    # --- 4b. behavioral analytics + production-threshold near-dup gates ---
    from simple_query_engine_spark.operators.dedup import (
        q_dedup_containment_planted,
    )
    from simple_query_engine_spark.operators.sessions import (
        q_events_sessionize_gap,
        q_events_user_streaks,
    )

    print(">>> gap sessions (30-min idle breaks), longest first:")
    q_events_sessionize_gap(spark, sf_dir).orderBy(
        "n_events", ascending=False
    ).show(5)
    print(">>> longest consecutive-day activity streaks:")
    q_events_user_streaks(spark, sf_dir).orderBy(
        "longest_streak", ascending=False
    ).show(5)
    print(">>> containment near-dups at the production 0.9 threshold")
    print("    (planted corpus — each pair is an original + its copy):")
    q_dedup_containment_planted(spark, sf_dir).show(5)

    # --- 5. managed-table DML (snapshot versioning + time travel) ---------
    from pyspark.sql import functions as F

    from simple_query_engine_spark.sources.catalog import table
    from simple_query_engine_spark.sources.managed import ManagedTable

    with tempfile.TemporaryDirectory(prefix="sqe_demo_dml_") as scratch:
        t = ManagedTable.create(
            spark, os.path.join(scratch, "orders"), table(spark, sf_dir, "orders")
        )
        t.delete_where(F.col("o_orderstatus") == "F")
        t.update(
            F.col("o_orderpriority") == "1-URGENT",
            {"o_totalprice": F.col("o_totalprice") * 1.1},
        )
        print(">>> managed orders table: v0 (created) → v1 (DELETE) → v2 (UPDATE)")
        for version in t.versions():
            n = t.read(version=version).count()
            print(f"    version {version}: {n} rows (time travel)")

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
