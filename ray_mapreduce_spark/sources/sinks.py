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


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 4,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-interleaved) layout writer: clusters rows so
    that files are tight in EVERY listed column at once, which is
    what makes multi-column min/max data skipping work (a range sort
    on col A gives perfect skipping on A and none on B; Z-ordering
    splits the benefit across all of them — the Delta/Iceberg
    OPTIMIZE ZORDER capability, reproduced on plain parquet).

    Mechanics: each column is quantile-bucketed into 2**bits levels
    using cut points from approxQuantile (driver collects only
    2**bits-1 doubles per column — no data pass beyond the sketch),
    the per-column bucket ids are bit-interleaved into a Morton code
    with Python-int shift counts (F.shiftleft takes plain ints), and
    the frame is repartitionByRange'd on (code, *cols) into n_files
    and written. Quantile (not min/max-linear) bucketing keeps the
    code balanced under skew. The write is layout-only: content is
    byte-identical to the input rows."""
    nq = (1 << bits) - 1
    probs = [i / (nq + 1) for i in range(1, nq + 1)]
    from pyspark.sql import functions as F

    code = F.lit(0).cast("bigint")
    for ci, c in enumerate(cols):
        cuts = df.approxQuantile(c, probs, 0.001)
        bucket = F.lit(0)
        for cut in cuts:
            bucket = bucket + F.when(F.col(c) > cut, 1).otherwise(0)
        # interleave this column's bits at positions ci, ci+k, ci+2k, ...
        k = len(cols)
        for bit in range(bits):
            code = code + F.shiftleft(
                F.shiftright(bucket, bit).bitwiseAND(F.lit(1)).cast("bigint"),
                ci + bit * k,
            )
    (
        df.withColumn("__zcode", code)
        .repartitionByRange(n_files, "__zcode", *cols)
        .drop("__zcode")
        .write.mode(mode)
        .parquet(path)
    )


def merge_upsert_parquet(
    spark: SparkSession,
    base: str,
    updates: DataFrame,
    dst: str,
    key: str | list[str],
    delete_col: str | None = None,
) -> dict[str, int]:
    """Copy-on-write MERGE (upsert + optional delete) into a plain
    parquet table — the Delta/Iceberg MERGE INTO capability without a
    table format: rows in ``updates`` replace base rows on ``key``,
    new keys append, and (when ``delete_col`` names a boolean column)
    delete-marked keys drop. Writes the merged table to a NEW
    directory; swap-in belongs to the caller's metastore/manifest
    layer (the compact_parquet atomicity contract). Returns
    {"inserted", "updated", "deleted", "total"} counts.

    Scale shape: ONE left-anti join of base against the update keys
    (hash equi-join; the update batch is broadcast whenever it fits —
    the common CDC case) unioned with the surviving updates — base
    rows that don't collide stream through untouched, nothing is
    rewritten per-row, and the only shuffle is the anti join's (none
    when broadcast). At 100 TB with hive-partitioned bases, partition
    pruning confines the rewrite to partitions the update batch
    touches — pass the pruned base path in; this function stays
    layout-agnostic. Updates must be key-unique (enforced — a
    duplicate-keyed MERGE is undefined in every table format; we
    raise instead of picking silently)."""
    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    b = spark.read.parquet(base)
    dup = updates.groupBy(*keys).count().filter(F.col("count") > 1)
    if dup.limit(1).count() > 0:
        raise ValueError("updates contain duplicate merge keys")
    if delete_col is not None:
        survivors = updates.filter(~F.col(delete_col)).drop(delete_col)
        dels = updates.filter(F.col(delete_col)).select(*keys)
    else:
        survivors = updates
        dels = None
    kept = b.join(updates.select(*keys), keys, "left_anti")
    merged = kept.select(*b.columns).union(survivors.select(*b.columns))
    merged.write.mode("overwrite").parquet(dst)

    n_updated = survivors.join(b.select(*keys), keys, "left_semi").count()
    n_inserted = survivors.count() - n_updated
    n_deleted = (
        b.join(dels, keys, "left_semi").count() if dels is not None else 0
    )
    return {
        "inserted": n_inserted,
        "updated": n_updated,
        "deleted": n_deleted,
        "total": spark.read.parquet(dst).count(),
    }
