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


def test_salted_join_matches_plain_inner(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    from ray_mapreduce_spark.operators.skew import salted_join

    plain = sorted(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in o.join(c, o.o_custkey == c.c_custkey).collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_mktsegment"])
        for r in salted_join(o, c, "o_custkey", "c_custkey", n_salts=8).collect()
    )
    assert salted == plain


def test_salted_join_left_keeps_unmatched_fact_rows(spark):
    from ray_mapreduce_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(1, "a"), (2, "b"), (99, "orphan")], "k int, v string")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "dk int, dv string")
    out = salted_join(fact, dim, "k", "dk", n_salts=4, how="left").collect()
    assert len(out) == 3
    by_k = {r["k"]: r["dv"] for r in out}
    assert by_k[1] == "x" and by_k[2] == "y" and by_k[99] is None


def test_salted_join_single_hot_key(spark):
    """Every fact row hits ONE dim key — the reducer-pinning shape; the
    salted join must still return exactly one match per fact row."""
    from ray_mapreduce_spark.operators.skew import salted_join

    fact = spark.range(50_000).select(F.lit(7).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(7, "hot")], "dk int, dv string")
    out = salted_join(fact, dim, "k", "dk", n_salts=32)
    assert out.count() == 50_000
    assert out.select("dv").distinct().collect()[0]["dv"] == "hot"
