from __future__ import annotations

from pyspark.sql import functions as F

from ray_mapreduce_spark.operators.skew import salted_aggregate
from ray_mapreduce_spark.sources import load_table


def test_salted_aggregate_matches_plain(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["s"], r["n"])
        for r in l.groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 2).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = salted_aggregate(
        l,
        ["l_returnflag"],
        aggs=lambda: [F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n")],
        combine=lambda: [F.round(F.sum("s"), 2).alias("s"), F.sum("n").alias("n")],
    )
    got = {(r["l_returnflag"],): (r["s"], r["n"]) for r in salted.collect()}
    assert got == plain


def test_salted_aggregate_on_single_hot_key(spark):
    """One monster group — the exact shape that pins a reducer."""
    df = spark.range(100_000).select(
        F.lit("hot").alias("k"), F.col("id").cast("double").alias("v")
    )
    out = salted_aggregate(
        df,
        ["k"],
        aggs=lambda: [F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")],
        combine=lambda: [F.sum("s").alias("s"), F.sum("n").alias("n")],
        n_salts=32,
    ).collect()
    assert len(out) == 1
    assert out[0]["n"] == 100_000
    assert out[0]["s"] == float(sum(range(100_000)))
