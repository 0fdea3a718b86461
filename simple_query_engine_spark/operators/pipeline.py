"""End-to-end training-data curation pipeline — the composition exhibit.

One query chains the pipeline a pretraining corpus actually runs:

1. quality gate  — keep documents with ≥ 20 whitespace tokens
2. exact dedup   — keep the lowest doc_id per md5(text)
3. near-dup drop — remove the higher-id member of every n-gram-Jaccard
                   pair ≥ threshold (survivor = lowest id, transitively)
4. corpus stats  — per-language doc count + token mass of the survivors

Every stage composes from operators that are independently oracle-checked
(text_quality_score, dedup_exact, dedup_ngram_jaccard); the whole chain is
itself SQL-expressible, so the driver verifies the *composition*, not just
the parts.  At 100 TB each stage is the shuffle shape documented on its
operator; nothing here adds a new one — filters are scan-side, the
near-dup drop is a broadcast-able anti-join against a pair list orders of
magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_query_engine_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    q_dedup_exact,
    q_dedup_ngram_jaccard,
)
from simple_query_engine_spark.operators.text import _normalized
from simple_query_engine_spark.sources.catalog import table

MIN_TOKENS = 20


def q_pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = table(spark, sf_dir, "documents")
    tokens = F.split(_normalized(F.col("text")), " ")
    quality = documents.select(
        "doc_id", "lang", F.size(tokens).alias("n_tokens")
    ).filter(F.col("n_tokens") >= MIN_TOKENS)

    exact_keepers = q_dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    near_dup_losers = q_dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_id_b").alias("doc_id")
    ).distinct()

    survivors = (
        quality.join(exact_keepers, "doc_id", "left_semi")
        .join(F.broadcast(near_dup_losers), "doc_id", "left_anti")
    )
    return survivors.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


QUERIES = {"pipeline_corpus_curation": q_pipeline_corpus_curation}

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

ORACLES = {
    "pipeline_corpus_curation": f"""
        WITH quality AS (
            SELECT doc_id, lang,
                   CAST(len(string_split({_NORM}, ' ')) AS INT) AS n_tokens
            FROM documents
            WHERE len(string_split({_NORM}, ' ')) >= {MIN_TOKENS}
        ), exact_keepers AS (
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ), docs AS (
            SELECT doc_id, string_split({_NORM}, ' ') w FROM documents
        ), sh AS (
            SELECT doc_id, unnest(list_distinct(
                CASE WHEN len(w) >= 3
                     THEN list_transform(range(1, len(w)-1),
                                         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                     ELSE [array_to_string(w, ' ')] END)) AS shingle
            FROM docs
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id
        ), pairs AS (
            SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), near_dup_losers AS (
            SELECT DISTINCT idb AS doc_id
            FROM pairs
            JOIN sizes sa ON ida = sa.doc_id
            JOIN sizes sb ON idb = sb.doc_id
            WHERE ROUND(common * 1.0 / (sa.set_size + sb.set_size - common), 4)
                  >= {JACCARD_THRESHOLD}
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(AVG(n_tokens), 4) AS avg_tokens
        FROM quality
        WHERE doc_id IN (SELECT doc_id FROM exact_keepers)
          AND doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
        GROUP BY lang
    """,
}
