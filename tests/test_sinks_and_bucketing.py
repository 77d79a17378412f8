"""Sinks round-trips + the bucketed-join no-shuffle guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from ray_mapreduce_spark.sources import load_table
from ray_mapreduce_spark.sources.sinks import (
    write_bucketed_table,
    write_csv,
    write_json,
    write_parquet,
)


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "nation_pq")
    write_parquet(src, p)
    back = spark.read.parquet(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    p = str(tmp_path / "orders_part")
    write_parquet(src, p, partition_by=["o_orderstatus"])
    back = spark.read.parquet(p).filter(F.col("o_orderstatus") == "F")
    # partition pruning: the physical plan must carry the partition filter
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan
    expected = src.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "region")
    write_csv(src, str(tmp_path / "region_csv"))
    write_json(src, str(tmp_path / "region_json"))
    csv_back = spark.read.option("header", "true").option("inferSchema", "true").csv(
        str(tmp_path / "region_csv")
    )
    json_back = spark.read.json(str(tmp_path / "region_json"))
    assert csv_back.count() == src.count()
    assert json_back.count() == src.count()
    assert set(json_back.columns) == set(src.columns)


def test_bucketed_join_no_shuffle(spark, sf_dir):
    """Both sides bucketed on the join key -> sort-merge join with NO
    exchange: the physical plan the same join must produce on a 100 TB
    warehouse table."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed_table(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                         "orders_b", "o_custkey", 8)
    write_bucketed_table(customer.select("c_custkey", "c_mktsegment"),
                         "customer_b", "c_custkey", 8)
    try:
        # Disable auto-broadcast so the test pins the SMJ-without-
        # exchange shape (broadcast would trivially avoid the shuffle).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the right thing
        expected = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
