"""Physical-plan hygiene: the properties that make these queries
viable at 100 TB, pinned as assertions so a regression in plan shape
fails CI, not the cluster.
"""

from __future__ import annotations

from ray_mapreduce_spark.plans import all_queries


def _plan(spark, name, sf_dir) -> str:
    df = all_queries()[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "filter_project_revenue", sf_dir)
    assert "PushedFilters: [" in plan
    # shipdate range + discount + quantity predicates pushed to parquet
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # 7 needed columns, not all 11 — pruning worked
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, "q5_local_supplier_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3  # c, s, n, r sides
    # the orders x lineitem fact join must NOT broadcast at scale; it
    # is either SMJ or (under AQE at test sizes) a runtime conversion.


def test_aggregates_are_partial(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    # two HashAggregate nodes (partial + final) around the exchange
    assert plan.count("HashAggregate") >= 2


def test_topn_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, "sort_limit_top100", sf_dir)
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT k


def test_no_python_udfs_in_relational_paths(spark, sf_dir):
    for name in (
        "q1_pricing_summary",
        "q5_local_supplier_revenue",
        "month_count",
        "dedup_exact",
        "text_quality_score",
        "string_functions",
    ):
        plan = _plan(spark, name, sf_dir)
        assert "BatchEvalPython" not in plan, f"{name} fell off the JVM path"
        assert "ArrowEvalPython" not in plan, f"{name} fell off the JVM path"


def test_whole_stage_codegen_active(spark, sf_dir):
    df = all_queries()["q1_pricing_summary"].builder(spark, sf_dir)
    df.collect()  # AQE finalizes (and codegen-annotates) the plan on execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WholeStageCodegen" in plan or "*(" in plan
