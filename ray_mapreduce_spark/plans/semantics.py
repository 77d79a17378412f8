"""Semantic-corner queries: null propagation, cartesian products,
IN-subqueries, deterministic collection aggregation, nested
conditionals. These pin the engine-vs-oracle agreement on the
semantics that differ most often between SQL engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# Nulls from an outer join: coalesce/nullif/null-safe-equality counts.
@register(
    "null_semantics",
    tags=("null", "outer-join"),
    oracle="""
    SELECT
      count(*)                                         AS n_rows,
      count(o.o_orderkey)                              AS n_matched,
      count(*) - count(o.o_orderkey)                   AS n_null,
      count(nullif(c.c_mktsegment, 'BUILDING'))        AS n_not_building,
      CAST(sum(CASE WHEN o.o_orderkey IS NULL AND c.c_acctbal < 0
                    THEN 1 ELSE 0 END) AS BIGINT)      AS n_null_and_negative
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 480000.0) o
      ON o.o_custkey = c.c_custkey
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000.0)
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_matched"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("n_null"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias("n_not_building"),
        F.sum(
            F.when(F.col("o_orderkey").isNull() & (F.col("c_acctbal") < 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_null_and_negative"),
    )


# Explicit cartesian product (tiny x tiny — the only legitimate shape).
@register(
    "cross_join_regions",
    tags=("join", "cross-join"),
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    WHERE a.r_name <> b.r_name
    """,
)
def cross_join_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    a = r.select(F.col("r_name").alias("region_a"))
    b = r.select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b).filter(F.col("region_a") != F.col("region_b"))


# IN-subquery (uncorrelated) -> semi join.
@register(
    "in_subquery_custkeys",
    tags=("subquery", "semi-join"),
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    """,
)
def in_subquery_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rich = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey"
    )
    return (
        o.join(rich, o.o_custkey == rich.c_custkey, "left_semi")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


# Deterministic collection aggregation: sorted distinct string concat.
# (collect_list order is nondeterministic — array_sort(collect_set)
# is the deterministic form; DuckDB mirrors with ORDER BY in string_agg.)
@register(
    "listagg_priorities",
    tags=("aggregate", "collect"),
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
           count(DISTINCT o_orderpriority) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def listagg_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


# Nested CASE / boolean logic matrix.
@register(
    "nested_case_matrix",
    tags=("conditional",),
    oracle="""
    SELECT
      CASE
        WHEN l_quantity < 10 THEN
          CASE WHEN l_discount > 0.05 THEN 'small-discounted' ELSE 'small-full' END
        WHEN l_quantity < 30 THEN 'medium'
        ELSE CASE WHEN l_returnflag = 'R' THEN 'large-returned' ELSE 'large-kept' END
      END AS bucket,
      count(*) AS n,
      round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY 1
    """,
)
def nested_case_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.when(
            F.col("l_quantity") < 10,
            F.when(F.col("l_discount") > 0.05, "small-discounted").otherwise("small-full"),
        )
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise(
            F.when(F.col("l_returnflag") == "R", "large-returned").otherwise("large-kept")
        )
    )
    return l.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_extendedprice"), 2).alias("total"),
    )


# Correlated EXISTS through the SQL entry path: Catalyst decorrelates
# to a left-semi join (same physical plan the DataFrame semi-join
# query declares directly — pinned by both going green).
@register(
    "exists_correlated_sql",
    tags=("subquery", "exists", "sql"),
    oracle="""
    SELECT s_suppkey, s_nationkey
    FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9000
    )
    """,
)
def exists_correlated_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_ex")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex")
    return spark.sql(
        """
        SELECT s_suppkey, s_nationkey
        FROM supplier_ex s
        WHERE EXISTS (
          SELECT 1 FROM customer_ex c
          WHERE c.c_nationkey = s.s_nationkey AND c.c_acctbal > 9000
        )
        """
    )
