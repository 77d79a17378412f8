"""Partitioning helpers shared across plans."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Spread rows across cores before a compute-heavy narrow stage.

    The local testdata tables are single parquet files -> ONE input
    split, which would serialize hash/dot-product-heavy stages onto one
    core. At cluster scale the input already has many splits and this
    round-robin repartition stays cheap relative to the per-row compute
    it feeds (it shuffles only the projected columns)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
