"""Text-operator edge cases the corpus doesn't contain: Spark and the
DuckDB oracle must agree on empty and whitespace-only documents
(string_split('', '') is [''] in DuckDB but [] in Spark — every char-split
oracle needs an explicit guard)."""

from __future__ import annotations

import duckdb
import pytest

from simple_query_engine_spark.operators import text as TX


@pytest.fixture(scope="module")
def tricky_docs(spark):
    rows = [
        (1, "hello world", "en", "s", 11),
        (2, "", "en", "s", 0),
        (3, "   ", "en", "s", 3),  # whitespace-only normalizes to ''
        (4, "a", "en", "s", 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'hello world', 'en', 's', 11), (2, '', 'en', 's', 0), "
        "(3, '   ', 'en', 's', 3), (4, 'a', 'en', 's', 1)"
        ") t(doc_id, text, lang, source, n_chars)"
    )
    return df, con


def test_rolling_hash_agrees_on_empty_docs(spark, tricky_docs, tmp_path):
    df, con = tricky_docs
    path = str(tmp_path / "documents.parquet")
    df.write.parquet(path)
    spark_rows = sorted(
        map(tuple, TX.q_rolling_hash(spark, str(tmp_path)).collect())
    )
    duck_rows = sorted(
        map(tuple, con.execute(TX.ORACLES["text_rolling_hash"]).fetchall())
    )
    assert spark_rows == duck_rows
    by_id = dict(spark_rows)
    assert by_id[2] == 0 and by_id[3] == 0  # empty/whitespace → fold seed


def test_token_count_agrees_on_empty_docs(spark, tricky_docs, tmp_path):
    df, con = tricky_docs
    path = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    spark_rows = sorted(
        map(tuple, TX.q_token_count(spark, str(tmp_path)).collect())
    )
    duck_rows = sorted(
        map(tuple, con.execute(TX.ORACLES["text_token_count"]).fetchall())
    )
    assert spark_rows == duck_rows
