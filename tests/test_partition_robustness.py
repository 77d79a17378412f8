"""Partition-count robustness: results must be IDENTICAL under any
shuffle-partition setting — the invariant that catches accidental
dependence on physical layout (per-partition ids, first()-style
nondeterminism, partition-local state leaking into results).

Exercises the queries whose implementations touch partition-sensitive
machinery: monotonically_increasing_id (header skip),
spark_partition_id (2-pass global ranking), applyInPandas group fan-in
(packing), LSH self-joins, and the iterative clustering loop.
"""

from __future__ import annotations

import pytest

from ray_mapreduce_spark.plans import all_queries

CASES = [
    "window_distribution",      # spark_partition_id + range partitioning
    "pack_sequences_greedy",    # applyInPandas per-class fold
    "dedup_minhash_pairs",      # LSH self-join + persist/checkpoint
    "dedup_clusters",           # iterative label propagation
    "sample_hash_deterministic",
    "stream_session_counts",
    "timeseries_ohlc",          # min_by/max_by composite-key argmin
    "text_tfidf_top_terms",     # broadcast total + ranked window
    "explode_outer_long_words", # null-preserving generator
    "join_salted_skew",         # monotonically_increasing_id salt
    "sample_weighted_mixture",  # broadcast rates + arithmetic hash
    "funnel_view_click_purchase",  # chained conditional-min joins
    "decontaminate_ngram_overlap",  # shingle window + inverted index
    "events_retention_cohorts",     # cohort join + distinct
    "sql_recursive_month_spine",    # recursive CTE execution
    "variant_props_extract",        # VARIANT parse/extract
    "cluster_kmeans_assign",        # iterative Lloyd + min_by argmin (r6)
    "text_bm25_topdocs",            # window df/dlen + ranked window (r6)
    "text_unigram_logprob",         # window ctf + float avg rounding (r6)
    "dedup_ngram_jaccard",          # window df + self-join reuse (r6 rework)
    "dedup_containment_pairs",      # shared inverted index, directed ratios (r7)
    "text_quality_classifier",      # integer-margin hashed features (r7)
    "text_bigram_pmi",              # checkpointed fan-out + TakeOrdered ties (r7)
    "dedup_semantic_kmeans",        # Lloyd + same-cluster self-join (r7)
    "graph_pagerank_neardup",       # fixed-point integer iteration (r7)
    "graph_triangle_count",         # checkpointed wedge self-joins (r7)
    "quality_calibration_deciles",  # ntile with composite tiebreak (r7)
    "dedup_survivors_quality",      # CC + quality argmax windows (r7)
    "events_key_skew_profile",      # checkpointed counts + TakeOrdered (r7)
    "events_winsorize_stats",       # holistic percentile + broadcast rejoin (r7)
    "text_bigram_logprob",          # persisted adjacency + checkpointed bc (r7)
    "q2_best_supplier_per_part",    # argmax window + ordered limit (r8)
    "text_ngram_novelty",           # min() window over shingle hash (r8)
    "orders_market_basket_pairs",   # self-join + ranked limit + lift ties (r8)
    "text_distinctive_terms",       # checkpointed counts + rank on rounded score (r8)
    "events_cusum_changepoint",     # running-sum order + argmax tiebreak (r8)
    "sample_temperature_mixture",   # checkpointed rates + hash threshold (r8)
]


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partitions(spark, sf_dir, name):
    spec = all_queries()[name]
    baseline = sorted(map(tuple, spec.builder(spark, sf_dir).collect()))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("3", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            got = sorted(map(tuple, spec.builder(spark, sf_dir).collect()))
            assert got == baseline, f"{name} changed under shuffle.partitions={parts}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


AQE_CASES = [
    "window_distribution",   # checkpointed range partitioning
    "dedup_minhash_pairs",   # lazy-persist reuse under one job
    "join_salted_skew",      # salted equi-join
    "pipeline_training_batch",  # composed mixture->cap->pack
]


@pytest.mark.parametrize("name", AQE_CASES)
def test_result_invariant_under_aqe_toggle(spark, sf_dir, name):
    """AQE re-planning (coalescing, skew splits, runtime broadcast
    conversion) is pure physical strategy — results must be identical
    with it disabled."""
    spec = all_queries()[name]
    baseline = sorted(map(tuple, spec.builder(spark, sf_dir).collect()))
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        got = sorted(map(tuple, spec.builder(spark, sf_dir).collect()))
        assert got == baseline, f"{name} changed with AQE disabled"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
