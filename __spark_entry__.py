"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ extensions),
one callable per name.
``oracle_sql()`` — DuckDB-equivalent SQL per query name; names absent here
are non-SQL-expressible (engine-specific hashing / approximate ANN /
pandas-UDF ops) and get the driver's rows-only check.

Implementation lives in ``simple_query_engine_spark/``; this module only
adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# Keep the package importable even when this module is loaded by file path
# from a different working directory.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary at sf0.001 (rows > 0)."""
    from simple_query_engine_spark.operators.relational import q_agg_pricing_summary
    from simple_query_engine_spark.session import configure

    configure(spark)
    return q_agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from simple_query_engine_spark.operators import all_queries
    from simple_query_engine_spark.session import configure

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        run.__name__ = fn.__name__
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from simple_query_engine_spark.operators import all_oracles

    return all_oracles()
