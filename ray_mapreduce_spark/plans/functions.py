"""Scalar-function queries: string / date / math / JSON (SURVEY.md §2c
rows "String functions", "Date/time functions", "Math functions",
"Array/map/JSON functions"; reference user-space patterns U4-U11,
reference basic_mr_month_count.py:15-27, mapreduce_unittest.py:7-8).

Everything stays JVM-side (whole-stage codegen) — no Python UDFs in
any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# --------------------------------------------------------------------------
# The flagship: the reference's one production query re-expressed.
# basic_mr_month_count.py groups a crawl TSV by (variant, month) and
# counts (reference basic_mr_month_count.py:15-30); here events plays
# that role: (event_type, month(ts)) -> count. Scale: algebraic count,
# partial-aggregated map-side; one shuffle of O(groups).
@register(
    "month_count",
    bench=True,
    tags=("flagship", "aggregate", "date"),
    oracle="""
    SELECT
      event_type,
      strftime(ts, '%Y-%m') AS month,
      count(*)              AS n
    FROM events
    GROUP BY event_type, strftime(ts, '%Y-%m')
    """,
)
def month_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# U11 error-branch pattern: malformed rows become sentinel groups
# instead of failing the job (reference basic_mr_month_count.py:18-25).
# Declarative version: CASE WHEN on parse results; json nulls divert to
# 'no_key'; non-positive values to 'bad_value'.
@register(
    "error_branch_classify",
    tags=("flagship", "error-handling", "json"),
    oracle="""
    SELECT
      CASE
        WHEN json_extract_string(props, '$.k') IS NULL THEN 'no_key'
        WHEN value < 0 THEN 'bad_value'
        ELSE event_type
      END      AS bucket,
      count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def error_branch_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    bucket = (
        F.when(k.isNull(), F.lit("no_key"))
        .when(F.col("value") < 0, F.lit("bad_value"))
        .otherwise(F.col("event_type"))
    )
    return e.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# String functions: split/token extraction/substring/concat/regexp
# (reference U7-U10 patterns done declaratively).
@register(
    "string_functions",
    tags=("string",),
    oracle="""
    SELECT
      p_partkey,
      upper(p_brand)                                   AS brand_upper,
      string_split(p_type, ' ')[1]                     AS type_first,
      string_split(p_type, ' ')[-1]                    AS type_last,
      substr(p_name, 1, 5)                             AS name_prefix,
      concat(p_brand, '|', p_type)                     AS brand_type,
      length(p_name)                                   AS name_len,
      len(regexp_extract_all(p_name, '[aeiou]'))       AS n_vowels
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    toks = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        toks.getItem(0).alias("type_first"),
        F.element_at(toks, -1).alias("type_last"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).alias("n_vowels"),
    )


# --------------------------------------------------------------------------
# Date/time functions: trunc, extract, diff, format (reference U9 was a
# 7-char string slice; real timestamp semantics here).
@register(
    "date_functions",
    tags=("date",),
    oracle="""
    SELECT
      year_month,
      n_orders,
      round(total, 2) AS total
    FROM (
      SELECT
        strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS year_month,
        count(*)            AS n_orders,
        sum(o_totalprice)   AS total
      FROM orders
      WHERE extract(year FROM o_orderdate) BETWEEN 1996 AND 1999
        AND date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) > 400
      GROUP BY 1
    )
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            F.year("o_orderdate").between(1996, 1999)
            & (F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")) > 400)
        )
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("year_month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total"),
        )
        .select("year_month", "n_orders", F.round("total", 2).alias("total"))
    )


# --------------------------------------------------------------------------
# Math functions: pmod bucketing (reference U5 `data % 9`,
# mapreduce_unittest.py:8), pow/sqrt (U4, reference mapreduce.py:36-38).
@register(
    "math_functions",
    tags=("math",),
    oracle="""
    SELECT
      l_orderkey % 9                                 AS bucket,
      count(*)                                       AS n,
      round(sum(sqrt(l_quantity)), 4)                AS sum_sqrt_qty,
      round(sum(pow(l_discount, 2)), 6)              AS sum_disc_sq,
      round(max(pow(l_quantity, 2)), 2)              AS max_qty_sq,
      round(avg(abs(l_extendedprice - 1000.0)), 4)   AS avg_abs_dev
    FROM lineitem
    GROUP BY 1
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.pmod("l_orderkey", F.lit(9)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.sqrt("l_quantity")), 4).alias("sum_sqrt_qty"),
            F.round(F.sum(F.pow("l_discount", F.lit(2))), 6).alias("sum_disc_sq"),
            F.round(F.max(F.pow("l_quantity", F.lit(2))), 2).alias("max_qty_sq"),
            F.round(F.avg(F.abs(F.col("l_extendedprice") - 1000.0)), 4).alias("avg_abs_dev"),
        )
    )


# --------------------------------------------------------------------------
# JSON extraction on events.props (SURVEY.md §2c Array/map/JSON row).
@register(
    "json_extract_agg",
    tags=("json", "aggregate"),
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      count(*)              AS n,
      round(avg(value), 4)  AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k_bucket = (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_bucket")
    return e.groupBy(k_bucket).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


# --------------------------------------------------------------------------
# Interval arithmetic: shift timestamps by calendar units (month-end
# clamping semantics agree between engines) and bucket by the shifted
# month.
@register(
    "interval_shift",
    tags=("date", "interval"),
    oracle="""
    SELECT
      strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS next_month_day,
      strftime(o_orderdate - INTERVAL 7 DAY, '%Y-%m-%d')   AS week_before,
      count(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def interval_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.add_months("o_orderdate", 1), "yyyy-MM-dd").alias("next_month_day"),
            F.date_format(F.date_sub("o_orderdate", 7), "yyyy-MM-dd").alias("week_before"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# min_by/max_by (argmin/argmax) aggregates. The ordering key is the
# COMPOSITE (value, event_id): plain min_by/max_by on value alone is
# nondeterministic under ties, and the r3 sf0.1 sweep caught exactly
# that (duplicate values appear at 10x the data and each engine picked
# a different event). Spark expresses the composite with a struct key;
# DuckDB's arg_min/arg_max take scalar keys only, so the oracle spells
# the same semantics as rank-1 rows of two windows.
@register(
    "agg_min_max_by",
    tags=("aggregate",),
    oracle="""
    WITH r AS (
      SELECT event_type, event_id, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value ASC, event_id ASC
             ) AS rn_min,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id DESC
             ) AS rn_max
      FROM events
    )
    SELECT event_type,
           max(CASE WHEN rn_max = 1 THEN event_id END) AS max_value_event,
           max(CASE WHEN rn_min = 1 THEN event_id END) AS min_value_event,
           round(max(value), 4) AS max_value
    FROM r
    GROUP BY event_type
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.max_by("event_id", F.struct("value", "event_id")).alias("max_value_event"),
        F.min_by("event_id", F.struct("value", "event_id")).alias("min_value_event"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


# --------------------------------------------------------------------------
# Map-type construction + lookup + conditional aggregation.
@register(
    "map_functions",
    tags=("map", "aggregate"),
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE value >= 50)             AS n_high,
           count(*) FILTER (WHERE value < 50)              AS n_low,
           round(sum(CASE WHEN value >= 50 THEN value END), 2) AS high_sum
    FROM events
    GROUP BY event_type
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Builds a per-row map {bucket -> value}, then aggregates by
    lookup — exercises create_map/element_at plus count_if."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.when(F.col("value") >= 50, F.lit("high")).otherwise(F.lit("low")),
        F.col("value"),
    )
    tagged = e.select("event_type", m.alias("vm"))
    return tagged.groupBy("event_type").agg(
        F.count_if(F.element_at("vm", "high").isNotNull()).alias("n_high"),
        F.count_if(F.element_at("vm", "low").isNotNull()).alias("n_low"),
        F.round(F.sum(F.element_at("vm", "high")), 2).alias("high_sum"),
    )


# --------------------------------------------------------------------------
# try_cast under ANSI mode: malformed values become NULL instead of
# failing the 100 TB job (the declarative face of the reference's U11
# catch-and-divert pattern; ANSI is ON in Spark 4, so plain CAST would
# throw).
@register(
    "try_cast_parsing",
    tags=("cast", "error-handling"),
    oracle="""
    SELECT
      p_partkey,
      TRY_CAST(string_split(p_type, ' ')[1] AS INTEGER) AS first_word_as_int,
      TRY_CAST(p_size AS VARCHAR)                        AS size_str,
      count(*) OVER ()                                   AS n_total
    FROM part
    """,
)
def try_cast_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The global total is an aggregate broadcast-cross-joined back onto
    # every row — NOT a count(*) OVER () empty-partition window, which
    # funnels the whole table through one task at scale.
    p = load_table(spark, sf_dir, "part")
    total = p.agg(F.count(F.lit(1)).alias("n_total"))
    return p.select(
        "p_partkey",
        F.split("p_type", " ").getItem(0).try_cast("int").alias("first_word_as_int"),
        F.col("p_size").cast("string").alias("size_str"),
    ).crossJoin(F.broadcast(total))


# --------------------------------------------------------------------------
# regexp_replace normalization chain (text cleaning primitive).
@register(
    "regexp_normalize",
    tags=("string", "regex"),
    oracle="""
    SELECT p_partkey,
           regexp_replace(lower(p_name), '[aeiou]', '_', 'g')  AS devoweled,
           regexp_replace(trim(p_type), ' +', ' ', 'g')        AS type_norm
    FROM part
    """,
)
def regexp_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.lower("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.regexp_replace(F.trim("p_type"), " +", " ").alias("type_norm"),
    )


# --------------------------------------------------------------------------
# from_json into a typed struct + array/map construction + explode
# (reference has no array/map types at all; §2c ABSENT row).
@register(
    "array_map_explode",
    tags=("array", "explode", "json"),
    oracle="""
    SELECT t.event_type, u.tag, count(*) AS n
    FROM (
      SELECT event_type,
             [event_type, CASE WHEN value >= 50 THEN 'high' ELSE 'low' END] AS tags
      FROM events
    ) t, unnest(t.tags) AS u(tag)
    GROUP BY t.event_type, u.tag
    """,
)
def array_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tags = F.array(
        F.col("event_type"),
        F.when(F.col("value") >= 50, F.lit("high")).otherwise(F.lit("low")),
    )
    return (
        e.select("event_type", F.explode(tags).alias("tag"))
        .groupBy("event_type", "tag")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Fixed-width histogram: bucket = floor(value/width) — pure arithmetic
# bucketing, one shuffle on the bucket id (the profile query behind
# any numeric-distribution dashboard).
@register(
    "histogram_event_values",
    tags=("aggregate", "histogram"),
    oracle="""
    SELECT CAST(floor(value / 10) AS BIGINT) AS bucket,
           count(*)                          AS n,
           round(min(value), 2)              AS lo,
           round(max(value), 2)              AS hi
    FROM events
    GROUP BY 1
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 10).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# Higher-order array functions as API surface: transform / filter /
# aggregate / zip_with declared inline. NOTE the engine's own hot
# paths avoid HOFs (interpreted per element — CLAUDE.md gotcha #2);
# this query exists because users write them for small/medium arrays,
# and the declarative forms must match ANSI list semantics.
@register(
    "array_hof_functions",
    tags=("array", "higher-order"),
    oracle="""
    WITH t AS (
      SELECT p_partkey, string_split(p_name, ' ') AS words FROM part
    )
    SELECT p_partkey,
           array_to_string([CAST(length(w) AS VARCHAR) FOR w IN words], ',')
                                                              AS word_lens,
           len(list_filter(words, w -> length(w) > 5))        AS n_long,
           CAST(list_sum([length(w) FOR w IN words]) AS BIGINT) AS total_len,
           CAST(list_sum([length(x[1] || x[2]) FOR x IN list_zip(words, list_reverse(words))])
                AS BIGINT)                                    AS palindrome_len
    FROM t
    """,
)
def array_hof_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    # word_lens exports as a comma-joined STRING: array-typed output
    # columns are driver-hash hostile (round-1 approx_percentiles
    # lesson) and engine-specific in collation — flat scalars only.
    return p.select(
        "p_partkey",
        F.concat_ws(
            ",", F.transform(words, lambda w: F.length(w).cast("string"))
        ).alias("word_lens"),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).alias("n_long"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
        )
        # DuckDB list_sum over INT lists yields DOUBLE; both engines export
        # BIGINT so the driver's typed value hash agrees (pairing rule #3 —
        # this exact query was r3's one red row).
        .cast("bigint")
        .alias("total_len"),
        F.aggregate(
            F.zip_with(words, F.reverse(words), lambda a, b: F.length(F.concat(a, b))),
            F.lit(0),
            lambda a, x: a + x,
        )
        .cast("bigint")
        .alias("palindrome_len"),
    )


# --------------------------------------------------------------------------
# VARIANT (Spark 4 semi-structured type): parse the JSON props column
# into VARIANT once, extract typed fields with variant_get — the
# open-schema ingestion path for event payloads whose shape drifts
# (new keys appear without migrations; extraction is late-bound and
# typed at query time). DuckDB mirrors with its JSON extraction.
@register(
    "variant_props_extract",
    tags=("json", "variant", "aggregate"),
    oracle="""
    SELECT
      CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod,
      count(*) AS n,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        AS sum_k,
      round(max(value), 4) AS max_value
    FROM events
    GROUP BY 1
    """,
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props -> VARIANT -> typed bigint extraction -> aggregate. At
    scale the parse_json cost is paid once per row in the scan
    projection and the shuffle carries only the extracted group key
    and partial aggregates; a real deployment stores the VARIANT
    column at ingest so queries skip the parse entirely."""
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        e.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 7).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )


# --------------------------------------------------------------------------
# Table profiling (the ANALYZE / data-quality capability): one pass
# over `documents` produces per-column null counts, exact distinct
# counts, and average stringified length — the screen a pipeline runs
# before trusting a new drop of crawl data.
_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@register(
    "profile_documents_columns",
    tags=("aggregate", "profiling", "multi-distinct"),
    oracle="""
    WITH a AS (
      SELECT count(*) AS n_rows,
    """
    + ",\n".join(
        f"""        CAST(count(*) - count({c}) AS BIGINT) AS nulls_{c},
        CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c},
        CAST(sum(length(CAST({c} AS VARCHAR))) AS BIGINT) AS len_{c}"""
        for c in _PROFILE_COLS
    )
    + """
      FROM documents
    )
    """
    + "\nUNION ALL\n".join(
        f"""    SELECT '{c}' AS col_name, CAST(n_rows AS BIGINT) AS n_rows,
           nulls_{c} AS n_nulls, nd_{c} AS n_distinct,
           round(CAST(len_{c} AS DOUBLE) / n_rows + 1e-9, 4) AS avg_len
    FROM a"""
        for c in _PROFILE_COLS
    ),
)
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, avg_len) for every
    documents column. Scale shape: ONE scan; Spark plans the five
    count(DISTINCT)s as an Expand (5x the rows, one shuffle keyed by
    the expand id + value — each distinct stream partial-aggregates
    map-side, so the shuffle carries near-distinct cardinality, not
    5x corpus rows). The stringified-length sum is an exact integer;
    avg divides once at output. At crawl scale swap exact distincts
    for approx_count_distinct (the engine keeps this exact because
    the driver hashes values; agg_approx_count_distinct is the
    sketch-path row). The final stack() unpivot is a narrow
    projection of the 1-row aggregate."""
    d = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            (F.count(F.lit(1)) - F.count(F.col(c))).cast("bigint").alias(f"nulls_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"nd_{c}"))
        aggs.append(
            F.sum(F.length(F.col(c).cast("string")))
            .cast("bigint")
            .alias(f"len_{c}")
        )
    a = d.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, nd_{c}, len_{c}" for c in _PROFILE_COLS
    )
    return a.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS (col_name, n_nulls, n_distinct, len_sum)",
    ).select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "n_nulls",
        "n_distinct",
        F.round(F.col("len_sum").cast("double") / F.col("n_rows") + F.lit(1e-9), 4).alias(
            "avg_len"
        ),
    )


# --------------------------------------------------------------------------
# Rule-based data validation (the dbt-test / Deequ capability): one
# pass over lineitem LEFT-joined to orders evaluates referential
# integrity plus domain rules, emitting one row per rule. Violation
# counts are exact integers; the only division is the final rate.
# "ship_before_order" is genuinely non-zero in this data (the q12
# delay-band finding: dates generate near-independently), so the op
# is verified against a rule that actually fires.
_LINEITEM_RULES = (
    ("orphan_lineitem", "o_orderkey IS NULL"),
    ("ship_before_order",
     "o_orderkey IS NOT NULL AND l_shipdate < o_orderdate"),
    ("discount_out_of_range", "l_discount < 0 OR l_discount > 1"),
    ("tax_out_of_range", "l_tax < 0 OR l_tax > 1"),
    ("nonpositive_quantity", "l_quantity <= 0"),
    ("nonpositive_price", "l_extendedprice <= 0"),
)


@register(
    "lineitem_consistency_rules",
    tags=("validation", "join", "aggregate", "profiling"),
    oracle="""
    WITH j AS (
      SELECT l.*, o.o_orderkey, o.o_orderdate
      FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_checked,
    """
    + ",\n".join(
        f"        CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS v{i}"
        for i, (_, cond) in enumerate(_LINEITEM_RULES)
    )
    + """
      FROM j
    )
    """
    + "\nUNION ALL\n".join(
        f"""    SELECT '{name}' AS rule, n_checked, v{i} AS n_violations,
           round(CAST(v{i} AS DOUBLE) / n_checked + 1e-9, 6) AS viol_rate
    FROM a"""
        for i, (name, _) in enumerate(_LINEITEM_RULES)
    ),
)
def lineitem_consistency_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule, n_checked, n_violations, viol_rate): six data-quality
    rules over lineitem — referential integrity against orders plus
    five domain checks — in ONE scan + ONE fact-fact join. Scale
    shape: the left join shuffles on orderkey once; every rule is a
    conditional count folded into the same 1-row partial-aggregated
    rollup, so adding rules costs zero extra passes (the Deequ
    design); the stack() unpivot touches one row. At crawl scale the
    same plan validates a day's ingest before it reaches the
    training tables."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = l.join(o, l.l_orderkey == o.o_orderkey, "left")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_checked")]
    for i, (_, cond) in enumerate(_LINEITEM_RULES):
        aggs.append(
            F.sum(F.when(F.expr(cond), 1).otherwise(0)).cast("bigint").alias(f"v{i}")
        )
    a = j.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', v{i}" for i, (name, _) in enumerate(_LINEITEM_RULES)
    )
    return a.selectExpr(
        "n_checked",
        f"stack({len(_LINEITEM_RULES)}, {stack_args}) AS (rule, n_violations)",
    ).select(
        "rule",
        "n_checked",
        "n_violations",
        F.round(
            F.col("n_violations").cast("double") / F.col("n_checked") + F.lit(1e-9),
            6,
        ).alias("viol_rate"),
    )
