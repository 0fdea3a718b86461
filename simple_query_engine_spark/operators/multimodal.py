"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is stubbed
(``decode_image`` raises ``NotImplementedError``; the pipeline runs a
clearly-marked deterministic fake featurizer instead).  Everything
Spark-side is real and tested: the binary column schema, the Arrow-batched
``mapInPandas`` featurizer signature, batch shaping, and the downstream
aggregation.

At 100 TB: binary payloads stay columnar in parquet; ``mapInPandas``
processes whole Arrow batches per partition (no per-row Python), and only
the small extracted feature vectors shuffle — payload bytes never do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from simple_query_engine_spark.sources.catalog import table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real media decode — intentionally stubbed: no codec libs in this
    environment.  The Spark plumbing around it (binary column, mapInPandas
    batching) is real; swap this function for PIL/librosa/ffmpeg bindings
    in production."""
    raise NotImplementedError("media codecs unavailable; see fake_features")


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Model a multimodal table: payload as ``binary`` + typed metadata.

    (The synthetic corpus has no real media, so the payload is the UTF-8
    encoding of the text column — the schema and plan shapes are the point.)
    """
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def fake_featurizer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a real decoder+featurizer.

    Operates on whole Arrow batches (vectorized numpy over the payload
    bytes) — the exact shape a real image featurizer would use.
    """
    import numpy as np

    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len).astype("int64")
        byte_mean = payloads.map(
            lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else 0.0
        ).round(4)
        byte_max = payloads.map(
            lambda b: int(np.frombuffer(b, dtype=np.uint8).max()) if len(b) else 0
        ).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "byte_mean": byte_mean,
                "byte_max": byte_max,
            }
        )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over the binary payload (pure JVM path)."""
    payloads = with_binary_payload(table(spark, sf_dir, "documents"))
    return payloads.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched fake featurization over the binary column
    (mapInPandas; deterministic, so the byte-stat outputs are oracle-able)."""
    payloads = with_binary_payload(table(spark, sf_dir, "documents"))
    return payloads.select("doc_id", "payload").mapInPandas(
        fake_featurizer, FEATURE_SCHEMA
    )


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_features": q_multimodal_features,
}

ORACLES = {
    "multimodal_meta": """
        SELECT doc_id,
               'text/plain' AS mime,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes
        FROM documents
    """,
    # multimodal_features: Arrow-batched pandas featurizer (the class of op
    # the contract marks rows-only); exact byte-stat values are verified
    # against a pure-Python recomputation in tests/test_multimodal.py.
}
