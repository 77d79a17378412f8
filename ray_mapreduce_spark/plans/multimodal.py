"""Multimodal-column queries (SURVEY.md §2d): image/audio/video are
opaque ``binary`` columns with typed metadata. The decode/feature
steps are STUBBED (no media libs in this container — see
``operators/multimodal.py`` for the mapInPandas plumbing with a
deterministic fake decoder); the Spark-side schema, partitioning and
batch shape are real and tested.

The oracle-checked queries here exercise the binary column path that
IS fully runnable: bytes <-> text, digests, byte lengths, metadata
extraction — documents.text doubles as the payload source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# Binary payload + typed metadata: the canonical multimodal row shape
# (payload BINARY, mime STRING, n_bytes BIGINT, digest STRING).
@register(
    "multimodal_binary_meta",
    tags=("multimodal", "binary"),
    oracle="""
    SELECT
      doc_id,
      'text/plain'                       AS mime,
      CAST(strlen(text) AS BIGINT)       AS n_bytes,
      sha256(text)                       AS digest
    FROM documents
    """,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )


# Grouped payload-size profile per source — the partition-sizing query
# a multimodal pipeline runs first (are shards balanced? max blob?).
@register(
    "multimodal_size_profile",
    tags=("multimodal", "binary", "aggregate"),
    oracle="""
    SELECT source,
           count(*)                          AS n_blobs,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(max(strlen(text)) AS BIGINT) AS max_bytes,
           round(avg(strlen(text)), 4)       AS avg_bytes
    FROM documents
    GROUP BY source
    """,
)
def multimodal_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nb = F.octet_length(F.encode("text", "utf-8"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(nb).cast("bigint").alias("total_bytes"),
        F.max(nb).cast("bigint").alias("max_bytes"),
        F.round(F.avg(nb), 4).alias("avg_bytes"),
    )


# Decode + feature-extract pipeline (STUB decoder): mapInPandas over
# binary payloads -> fixed-schema features. rows-only driver check;
# exactness of the fake decoder pinned in pytest.
@register(
    "multimodal_decode_features",
    oracle=None,
    tags=("multimodal", "binary", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_features

    d = load_table(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
    )
    return decode_features(blobs)
