"""Pandas-UDF surface (SURVEY.md §2c "UDF surface" row): the engine's
user-extension points, mirroring the reference's two-UDF API
(generator ``map_fcn`` / holistic ``reduce_fcn``,
reference mapreduce.py:14-18) with their Arrow-vectorized Spark
analogs:

- ``mapInPandas``     ~= map_fcn   (batchwise generator over rows)
- ``applyInPandas``   ~= reduce_fcn (whole group materialized)
- scalar ``pandas_udf`` = per-column vectorized projection

Each carries an oracle: the UDF bodies are deterministic numpy/pandas
expressions DuckDB can reproduce, so the correctness gate covers the
Python path too — the slow path must still be the *correct* path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# --------------------------------------------------------------------------
# applyInPandas as the reduce_fcn analog: whole-group median/IQR.
@register(
    "udaf_applyinpandas_median",
    tags=("udf", "pandas-udf", "holistic", "aggregate"),
    oracle="""
    SELECT event_type,
           round(median(CAST(value AS DOUBLE)), 4) AS med,
           round(quantile_cont(CAST(value AS DOUBLE), 0.75)
               - quantile_cont(CAST(value AS DOUBLE), 0.25), 4) AS iqr,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def udaf_applyinpandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "med": [round(float(v.median()), 4)],
                "iqr": [round(float(v.quantile(0.75) - v.quantile(0.25)), 4)],
                "n": [len(v)],
            }
        )

    return e.groupBy("event_type").applyInPandas(
        reduce_group, schema="event_type string, med double, iqr double, n bigint"
    )


# --------------------------------------------------------------------------
# mapInPandas as the map_fcn analog: batchwise generator, multi-emit
# allowed (here 1:1 token stats per doc).
@register(
    "udf_mapinpandas_tokens",
    tags=("udf", "pandas-udf", "text"),
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))  AS n_tokens,
           length(text)                  AS n_chars_actual
    FROM documents
    """,
)
def udf_mapinpandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").map(len),
                    "n_chars_actual": pdf["text"].str.len(),
                }
            )

    return d.mapInPandas(gen, schema="doc_id bigint, n_tokens int, n_chars_actual int")


# --------------------------------------------------------------------------
# Scalar pandas_udf: vectorized per-row math (Arrow batches, no
# per-row pickling).
@register(
    "udf_scalar_log_value",
    tags=("udf", "pandas-udf", "math"),
    oracle="""
    SELECT event_id, round(ln(1 + value), 6) AS log1p_value
    FROM events
    WHERE value >= 0
    """,
)
def udf_scalar_log_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log1p_round(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(v), 6))

    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("value") >= 0)
        .select("event_id", log1p_round("value").alias("log1p_value"))
    )
