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
# binary payloads -> fixed-schema features. The fake decoder derives
# every feature from sha256(payload) (operators/multimodal.py), so
# the WHOLE Arrow round-trip is oracle-checkable: DuckDB recomputes
# width/height/luma from the same digest via hex-digit arithmetic
# (upgraded from rows-only in r3 — this was the one partial row in
# the r2 coverage table). mean_luma = h[2]/255 rounded to 6: k/255
# never lands on a 6-decimal half-boundary (255·odd ≠ even), so
# Python round and DuckDB round always agree.
_HEXD = "strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1"


def _hex_byte(i: int) -> str:
    """SQL for byte i (0-based) of the hex digest as an int."""
    return f"16 * ({_HEXD.format(i=2 * i + 1)}) + ({_HEXD.format(i=2 * i + 2)})"


@register(
    "multimodal_decode_features",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, sha256(text) AS hx,
             CAST(strlen(text) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT doc_id,
           'image/fake' AS mime,
           n_bytes,
           CAST(64 + ({_hex_byte(0)}) % 192 AS INTEGER) AS width,
           CAST(64 + ({_hex_byte(1)}) % 192 AS INTEGER) AS height,
           round(({_hex_byte(2)}) / 255.0, 6) AS mean_luma,
           CAST(NULL AS VARCHAR) AS decode_error
    FROM h
    """,
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
    # mode='fake' pins the registered query to the deterministic
    # decoder so the oracle holds in ANY environment; production
    # callers use the operator's mode='auto' (real PIL when present).
    return decode_features(blobs, mode="fake")


# Resize pipeline as a first-class query: binary in -> binary out via
# Arrow batches; verification compares the resized payload's leading
# digest (the stub 'resized' blob is sha256(payload || '{W}x{H}')
# tiled x4 — deterministic, so DuckDB can recompute it from text).
@register(
    "multimodal_resize_meta",
    tags=("multimodal", "binary", "pandas-udf"),
    oracle="""
    SELECT doc_id,
           64 AS width,
           64 AS height,
           CAST(128 AS BIGINT) AS n_bytes_out,
           sha256(text || '64x64') AS digest
    FROM documents
    """,
)
def multimodal_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_images

    d = load_table(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
    )
    out = resize_images(blobs, 64, 64)
    return out.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("payload").cast("bigint").alias("n_bytes_out"),
        F.lower(F.hex(F.expr("substring(payload, 1, 32)"))).alias("digest"),
    )


# Frame sampling as a first-class query: 1 blob -> 4 frame rows
# (fan-out via mapInPandas); frame digests recomputed in DuckDB over
# a lateral range() — pins the fan-out count, timestamps and payload
# derivation end-to-end.
@register(
    "multimodal_frame_sample",
    tags=("multimodal", "binary", "pandas-udf", "fanout"),
    oracle="""
    SELECT d.doc_id,
           CAST(t.k AS INTEGER) AS frame_no,
           CAST(t.k * 1000 AS BIGINT) AS ts_ms,
           sha256(d.text || CAST(t.k AS VARCHAR)) AS frame_digest
    FROM documents d, range(4) t(k)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    blobs = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("video/fake").alias("mime"),
    )
    out = sample_frames(blobs, n_frames=4, fps=1.0)
    return out.select(
        "doc_id",
        "frame_no",
        "ts_ms",
        F.lower(F.hex("frame_payload")).alias("frame_digest"),
    )
