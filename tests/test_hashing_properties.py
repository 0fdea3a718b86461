"""Cross-engine property test for the md5-hex-prefix hash construction.

``functions/hashing.py`` is the single definition both engines share —
every MinHash/SimHash base, hash sample, and stratified ordering in the
oracle gate rides ``int(md5(x)[:width], 16)``.  A drift here would break
hash-match everywhere at once, so the pair is pinned directly: Spark's
column vs DuckDB's fragment over adversarial strings (unicode, quotes,
backslashes, newlines, empty) at every legal width.
"""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import given, settings
from hypothesis import strategies as st


texts = st.lists(
    st.text(
        alphabet=st.characters(
            exclude_categories=("Cs",),  # no lone surrogates (not UTF-8)
            max_codepoint=0x2FFF,
        ),
        max_size=24,
    ),
    min_size=1,
    max_size=24,
    unique=True,
)


@settings(max_examples=12, deadline=None)
@given(strings=texts, width=st.sampled_from([1, 8, 15]))
def test_md5_prefix_long_matches_duckdb(spark, strings, width):
    import duckdb
    from pyspark.sql import functions as F

    from simple_query_engine_spark.functions.hashing import (
        md5_prefix_long,
        md5_prefix_long_sql,
    )

    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", md5_prefix_long(F.col("s"), width).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    want = dict(
        con.execute(
            f"SELECT s, {md5_prefix_long_sql('s', width)} FROM t"
        ).fetchall()
    )
    assert got == want


def test_md5_prefix_long_adversarial_literals(spark):
    """Fixed adversarial set (quote/backslash/newline/ascii-control/empty)
    — the cases string-embedding bugs would hit first."""
    import duckdb
    from pyspark.sql import functions as F

    from simple_query_engine_spark.functions.hashing import (
        md5_prefix_long,
        md5_prefix_long_sql,
    )

    strings = ["", "'", '"', "\\", "a'b''c", "line\nbreak", "tab\there",
               "naïve café", "ドキュメント", "a" * 200]
    df = spark.createDataFrame([(s,) for s in strings], "s STRING")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", md5_prefix_long(F.col("s"), 15).alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in strings])
    want = dict(
        con.execute(f"SELECT s, {md5_prefix_long_sql('s', 15)} FROM t").fetchall()
    )
    assert got == want
