from __future__ import annotations

from ray_mapreduce_spark.engine import Engine


def test_engine_surface(spark, sf_dir):
    eng = Engine(spark=spark, sf_dir=sf_dir)
    assert eng.table("lineitem").count() > 0
    assert "q1_pricing_summary" in eng.query_names()
    assert eng.query_names(tag="dedup")  # tag filtering
    assert eng.query("month_count").count() > 0


def test_engine_sql_over_all_tables(spark, sf_dir):
    eng = Engine(spark=spark, sf_dir=sf_dir)
    row = eng.sql(
        """
        SELECT c.c_mktsegment, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY n DESC LIMIT 1
        """
    ).collect()[0]
    assert row["n"] > 0
    # events view carries the rebuilt timestamp type through SQL
    ts_type = dict(eng.sql("SELECT * FROM events").dtypes)["ts"]
    assert ts_type == "timestamp"
