"""Sinks (SURVEY.md §2c "Sinks" row — ABSENT in the reference, which
only driver-prints results, reference basic_mr_month_count.py:46).

Thin, typed wrappers over ``df.write`` that encode the scale defaults:
parquet first, explicit partitioning columns for pruning, and a
bucketed saveAsTable path for shuffle-free downstream joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Columnar sink. ``partition_by`` creates hive-style directories
    so downstream reads get partition pruning on those columns."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted saveAsTable: both sides of a recurring join
    written with the same bucketing never shuffle for that join — the
    pre-partitioning pattern that replaces the reference's fixed
    mapper->reducer sharding (reference mapreduce.py:68-71) with a
    durable on-disk layout."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the other splittable columnar interchange format
    Spark ships natively (some lakehouse stacks standardize on it)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """ORC source: schema travels in the file footer (no inference
    pass), predicate pushdown and column pruning work as with
    parquet."""
    return spark.read.orc(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_mb: int = 256,
    shuffle: bool = True,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_mb``-sized files; returns the output file count.

    The 100 TB maintenance op: streaming sinks and fine-grained
    ingestion leave thousands of KB-scale files per partition, and
    scan startup cost is per-file — compaction restores scan
    throughput. File count = ceil(input bytes / target), sized from
    the scan's own statistics (file-footer based; no data pass).
    ``shuffle=True`` repartitions for evenly-sized output (full
    shuffle — the default, since compaction jobs are about layout);
    ``shuffle=False`` coalesces instead (no shuffle, but file sizes
    inherit input skew). Writes to a NEW directory — swap-in belongs
    to the caller's metastore/manifest layer, keeping the rewrite
    atomic-by-rename like every serious table format does."""
    import math

    df = spark.read.parquet(src)
    size_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n = max(1, math.ceil(size_bytes / (target_mb * 1024 * 1024)))
    out = df.repartition(n) if shuffle else df.coalesce(n)
    out.write.mode("overwrite").parquet(dst)
    return len([f for f in spark.read.parquet(dst).inputFiles()])
