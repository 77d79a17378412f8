"""Binary-file source (SURVEY.md §2d "Multimodal columns" row —
``spark.read.format("binaryFile")``): ingest raw media files as
(path, length, content) rows feeding the multimodal decode operators.

Scale notes: binaryFile is non-splittable per file (each blob is one
record), so parallelism = file count; `pathGlobFilter` prunes at
listing time (no bytes read for filtered-out files), and
`maxPartitionBytes`-style packing bins many small files per task.
For crawl-scale media, the production layout is blobs packed into
parquet `binary` columns (the `multimodal_*` queries' shape) — this
source is the INGEST step that gets loose files there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Read files under ``path`` as (doc_path, n_bytes, payload).

    ``glob`` prunes by filename pattern at listing time (e.g.
    ``*.jpg``). Any Hadoop filesystem scheme works (file://, s3a://…).
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    df = r.load(path)
    return df.select(
        F.col("path").alias("doc_path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )


def binary_files_to_features(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """End-to-end ingest: loose media files -> decoded feature rows
    (the multimodal decode pipeline fed straight from disk). Paths are
    hashed to a stable doc_id (xxhash64 of the path, deterministic)."""
    from ..operators.multimodal import decode_features

    files = read_binary_files(spark, path, glob)
    blobs = files.select(
        F.xxhash64("doc_path").alias("doc_id"),
        "payload",
        F.lit("application/octet-stream").alias("mime"),
    )
    return decode_features(blobs)
