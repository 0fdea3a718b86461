"""Extended user-defined-execution surface: grouped-map applyInPandas,
grouped-agg pandas UDAF, Python UDTF, and the salted skew join as a
catalog query.

The reference has no UDF surface at all (the only "functions" are two
comparison operators — reference ``src/query.rs:62-84``); round 1 covered
the scalar Arrow UDF (`udf_pandas_score`).  This module completes the
taxonomy:

- **grouped map** (`applyInPandas`): per-group pandas transform — one
  Arrow batch per group, output re-assembled distributively.  The exhibit
  z-scores document lengths within each language.
- **grouped aggregate** (`pandas_udf` GROUPED_AGG): a custom vectorized
  aggregate — here a weighted average — evaluated per group JVM→Arrow→
  numpy.  NB: unlike built-in aggregates there is NO map-side partial
  aggregation — every raw row shuffles to its group's reducer — so at
  scale this API fits bounded-cardinality/bounded-size groups; decompose
  into built-in partial aggregates (as the oracle does) when groups are
  unbounded.
- **UDTF** (1 row → N rows table function, Spark ≥ 3.5): emits word
  bigrams per document via LATERAL join.  Row-at-a-time Python by nature,
  so the exhibit runs over a bounded slice (doc_id < UDTF_MAX_DOC_ID) —
  the equivalent set-based explode (`text_*` operators) is the hot path;
  this pins the API surface.
- **salted skew join**: `functions.joins.salted_join` promoted to an
  oracle-checked catalog entry — the salt is internal plumbing, so the
  oracle is the PLAIN join SQL, proving salting is semantically invisible.

Every entry is deterministic and oracle-checked.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simple_query_engine_spark.functions.joins import salted_join
from simple_query_engine_spark.sources.catalog import table

UDTF_MAX_DOC_ID = 50

_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("z_score", T.DoubleType()),
    ]
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Population z-score within one language group (ddof=0 to match the
    oracle's stddev_pop); groups of one get z=0 rather than NaN."""
    import numpy as np

    values = pdf["n_chars"].to_numpy(dtype="float64")
    std = float(values.std(ddof=0))
    z = (values - values.mean()) / std if std > 0.0 else np.zeros(len(values))
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "lang": pdf["lang"],
            "n_chars": pdf["n_chars"],
            "z_score": np.round(z, 4),
        }
    )


def q_udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-language z-score of document length.

    Plan shape: one shuffle on the grouping key, then each group is a
    single Arrow batch through Python.  At 100 TB the constraint to design
    for is that ONE GROUP must fit in one worker's memory — fine for
    bounded-cardinality groups like language; for unbounded groups
    pre-aggregate instead (the oracle shows the equivalent window form).
    """
    documents = table(spark, sf_dir, "documents")
    return (
        documents.select("doc_id", "lang", "n_chars")
        .groupBy("lang")
        .applyInPandas(_zscore_group, _ZSCORE_SCHEMA)
    )


# NB: returnType must be a DataType instance, not a DDL string — string
# parsing needs an active SparkContext, and executors re-import this
# module without one.
def q_zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe twin of :func:`q_udf_grouped_map_zscore`: identical
    per-language z-scores computed entirely JVM-side with window
    aggregates — no Python, no one-group-per-worker memory constraint.
    This is the production path; the grouped-map UDF pins the API."""
    from pyspark.sql.window import Window

    documents = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang")
    mean = F.avg("n_chars").over(w)
    std = F.stddev_pop("n_chars").over(w)
    z = F.when(std > 0.0, (F.col("n_chars") - mean) / std).otherwise(0.0)
    return documents.select(
        "doc_id", "lang", "n_chars", F.round(z, 4).alias("z_score")
    )


@F.pandas_udf(T.DoubleType())
def _weighted_avg(values: pd.Series, weights: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF: sum(v·w)/sum(w) in float64.

    Sums use ``math.fsum`` (exactly-rounded, order-insensitive), not
    numpy's pairwise summation: the oracle's engine sums sequentially, and
    on knife-edge groups the pairwise result can differ in the last ulp —
    enough to flip a ROUND(..., 4) under a strict hash compare."""
    import math

    v = values.to_numpy(dtype="float64")
    w = weights.to_numpy(dtype="float64")
    total = math.fsum(w)
    return math.fsum(v * w) / total if total else 0.0


def q_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDAF: quantity-weighted average extended price
    per return flag.  Round to 4 (arithmetic result; see gotchas on
    rounding computed vs pass-through values)."""
    lineitem = table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            F.round(
                _weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("weighted_avg_price")
        )
    )


def _make_bigram_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, bigram: string")
    class BigramUDTF:
        def eval(self, doc_id: int, text: str):
            words = text.lower().split()
            for pos in range(len(words) - 1):
                yield doc_id, pos, f"{words[pos]} {words[pos + 1]}"

    return BigramUDTF


def _make_split_fields_udtf():
    """POLYMORPHIC UDTF: the output schema is not declared statically —
    ``analyze()`` derives it at plan time from the (constant) column-name
    argument, the Spark 4 table-function contract that lets one UDTF
    serve any field layout (the API `CREATE FUNCTION ... RETURNS TABLE`
    users rely on)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitFieldsUDTF:
        @staticmethod
        def analyze(text: AnalyzeArgument, names: AnalyzeArgument) -> AnalyzeResult:
            if not names.isConstantExpression or not isinstance(names.value, str):
                raise ValueError(
                    "split_fields_udtf: the field-name list must be a "
                    "constant string — it becomes the output schema"
                )
            schema = StructType()
            for col in names.value.split(","):
                schema = schema.add(col.strip(), StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, names: str):
            # Leading fields map to leading tokens; the FINAL field maps to
            # the LAST token (mirroring the oracle's split_part(..., -1)),
            # so a 3+-token name yields the same (first, last) pair in both
            # engines instead of silently diverging (ADVICE r09 low).
            n = len(names.split(","))
            parts = (text or "").split(" ")
            head = tuple(parts[i] if i < len(parts) else None for i in range(n - 1))
            yield head + (parts[-1] if parts else None,)

    return SplitFieldsUDTF


def q_udtf_split_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (analyze-time schema): splits part names
    into caller-NAMED fields — ``split_fields_udtf(p_name,
    'modifier, noun')`` yields columns ``modifier``/``noun`` because
    ``analyze()`` built that schema from the literal argument at plan
    time.  The aggregate over the emitted columns is oracle-checked
    against DuckDB's ``split_part``; the schema-from-argument behavior
    itself is pinned in tests/test_udx.py (same UDTF, different field
    list → different schema).

    Row-at-a-time Python like every UDTF — fine for the bounded
    vocabulary here; the set-based ``split()`` projection remains the
    production path (same stance as ``udtf_bigrams``)."""
    split_fields = _make_split_fields_udtf()
    spark.udtf.register("split_fields_udtf", split_fields)
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT s.noun,
               COUNT(*) AS n_parts,
               COUNT(DISTINCT s.modifier) AS n_modifiers,
               MIN(s.modifier) AS first_modifier
        FROM part p,
             LATERAL split_fields_udtf(p.p_name, 'modifier, noun') s
        GROUP BY s.noun
        """
    )


def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: 1 document row → N bigram rows.

    Bounded exhibit (doc_id < UDTF_MAX_DOC_ID): UDTFs are row-at-a-time
    Python — the set-based explode/transform form (text operators) is the
    production path for corpus-wide n-grams.
    """
    bigrams = _make_bigram_udtf()
    spark.udtf.register("bigrams_udtf", bigrams)
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        f"""
        SELECT b.doc_id, b.pos, b.bigram
        FROM documents d,
             LATERAL bigrams_udtf(d.doc_id, regexp_replace(trim(d.text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+', ' ')) b
        WHERE d.doc_id < {UDTF_MAX_DOC_ID}
        """
    )


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join as a catalog query: lineitem ⋈ orders on the
    (potentially hot) order key, salt spread over 8 buckets, then a
    per-priority aggregate.  The oracle is the PLAIN join — salting must
    be semantically invisible."""
    lineitem = table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        salted_join(
            lineitem,
            orders,
            "o_orderkey",
            salt_buckets=8,
            # Key + line number vary per row and are already read — the
            # salt costs no extra scan columns (pruning stays effective).
            salt_cols=["o_orderkey", "l_linenumber"],
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


QUERIES = {
    "udf_grouped_map_zscore": q_udf_grouped_map_zscore,
    "zscore_window": q_zscore_window,
    "udaf_weighted_avg": q_udaf_weighted_avg,
    "udtf_bigrams": q_udtf_bigrams,
    "udtf_split_fields": q_udtf_split_fields,
    "join_salted_skew": q_join_salted_skew,
}

_ZSCORE_ORACLE = """
        SELECT doc_id, lang, n_chars,
               ROUND(CASE WHEN stddev_pop(n_chars) OVER (PARTITION BY lang) > 0
                          THEN (n_chars - AVG(n_chars) OVER (PARTITION BY lang))
                               / stddev_pop(n_chars) OVER (PARTITION BY lang)
                          ELSE 0.0 END, 4) AS z_score
        FROM documents
    """

ORACLES = {
    # The window form is the set-based equivalent of the grouped-map UDF —
    # a deliberately DIFFERENT formulation for the UDF entry (guards
    # against oracle-author bias), and the direct translation for the
    # built-in window twin.
    "udf_grouped_map_zscore": _ZSCORE_ORACLE,
    "zscore_window": _ZSCORE_ORACLE,
    "udaf_weighted_avg": """
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
                   AS weighted_avg_price
        FROM lineitem GROUP BY l_returnflag
    """,
    # The UDTF's split-into-named-fields collapses to split_part.
    "udtf_split_fields": """
        SELECT split_part(p_name, ' ', -1) AS noun,
               COUNT(*) AS n_parts,
               COUNT(DISTINCT split_part(p_name, ' ', 1)) AS n_modifiers,
               MIN(split_part(p_name, ' ', 1)) AS first_modifier
        FROM part
        GROUP BY 1
    """,
    "udtf_bigrams": f"""
        WITH w AS (
            SELECT doc_id,
                   string_split(lower(trim(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), ' ') AS ws
            FROM documents WHERE doc_id < {UDTF_MAX_DOC_ID}
        )
        SELECT doc_id,
               CAST(i - 1 AS INT) AS pos,
               concat_ws(' ', ws[i], ws[i + 1]) AS bigram
        FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) t
    """,
    "join_salted_skew": """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_items,
               ROUND(CAST(SUM(l.l_quantity) AS DOUBLE), 2) AS total_qty
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
}
