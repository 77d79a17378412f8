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
