#!/usr/bin/env python
"""Regenerate EXPLAINS.md: the formatted physical plan of every
headline (bench=True) query plus the round's scale-sensitive
additions, as reviewable evidence that the plan-shape claims in
SCALING.md / docstrings hold (PushedFilters, ReadSchema pruning,
broadcast placement, partial aggregation, TakeOrderedAndProject).

Run: python tools/explain_audit.py  (writes EXPLAINS.md at repo root)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ray_mapreduce_spark.plans import all_queries  # noqa: E402
from ray_mapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

EXTRA = (
    "sample_weighted_mixture",
    "join_salted_skew",
    "decontaminate_ngram_overlap",
    "dedup_incremental_merge",
    "similarity_topk_lsh",
    "pipeline_training_batch",
    "funnel_view_click_purchase",
    "dedup_clusters_exact",
    "multimodal_decode_features",
    "events_retention_cohorts",
    "events_zscore_outliers",
    "sql_recursive_month_spine",
    "variant_props_extract",
    "cluster_kmeans_assign",
    "text_bm25_topdocs",
    "text_unigram_logprob",
    "hybrid_neardup_scores",
    "chunk_documents_overlap",
    "sample_split_assign",
    "text_unigram_incremental",
    "text_bm25_incremental",
    "events_sessionize_gap",
    "dedup_repeated_spans",
    "events_decayed_score",
    "corpus_composition_report",
    "decontaminate_embedding",
    "similarity_topk_ivf_kmeans",
    "dedup_containment_pairs",
    "text_quality_classifier",
    "text_bigram_pmi",
    "dedup_semantic_kmeans",
    "graph_pagerank_neardup",
    "graph_triangle_count",
    "quality_calibration_deciles",
    "dedup_survivors_quality",
    "events_key_skew_profile",
    "events_winsorize_stats",
    "text_bigram_logprob",
    # late-r7 continuation additions
    "events_anomaly_mad",
    "text_token_entropy",
    "sample_weighted_priority",
    "dedup_jaccard_prefixfilter",
    "similarity_pq_codes",
    "similarity_pq_adc_topk",
    "similarity_pq_rerank_topk",
    "events_linreg_trend",
    "corpus_source_kl",
    "dedup_cross_source_matrix",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "text_heavy_hitters_mg",
    "corpus_snapshot_diff",
    "text_vocab_coverage",
    "similarity_tfidf_cosine_pairs",
    "events_markov_transitions",
    "orders_rfm_segments",
    "embedding_covariance",
    "dedup_exact_normalized",
    "events_hourly_seasonality",
    "embedding_power_iteration",
    "events_funnel_time_to_convert",
    "orders_repeat_purchase_rate",
    "q7_nation_trade_matrix",
    "dedup_rate_by_source",
    "events_value_autocorr",
    "orders_pareto_share",
    "events_wau_rolling",
    "events_top_paths",
    "text_oov_rate",
    "text_quality_length_corr",
    # round 8 additions
    "q4_order_priority",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q22_idle_capital",
    "q2_best_supplier_per_part",
    "orders_market_basket_pairs",
    "events_user_overlap",
    "embedding_dim_stats",
    "text_truncation_loss",
    "text_ngram_novelty",
    "events_session_length_stats",
    "sample_temperature_mixture",
    "embedding_znorm_outliers",
    "events_cusum_changepoint",
    "orders_revenue_momentum",
    "events_user_gini",
    "orders_priority_drift",
    "text_length_weighted_quantiles",
    "text_distinctive_terms",
    "orders_cohort_ltv",
    "events_bot_score",
    "q8_national_market_share",
    # round 9 additions
    "q16_part_supplier_variety",
    "q21_late_sole_suppliers",
    "dedup_minhash_estimate_pairs",
    "decontaminate_substring_spans",
    "sample_epoch_mixture_plan",
    "q9_product_profit",
    "q11_important_part_value",
    "q12_ship_class_priority",
    "q15_top_supplier",
    "q20_dominant_suppliers",
    "supplier_reliability_wilson",
    "profile_documents_columns",
    "graph_degree_assortativity",
    "embedding_sq8_error",
    "stream_dedup_ids",
    "orders_open_backlog_daily",
    "embedding_pca_histogram",
    "events_ab_test_zscore",
    "text_gopher_filters",
    "lineitem_consistency_rules",
    "embedding_truncation_fidelity",
    "graph_clustering_coefficient",
    "events_seasonal_forecast_smape",
    "text_tokenizer_fertility",
    "events_attribution_linear",
    "dedup_edit_distance_pairs",
    "events_ewma_volatility",
    "sample_kcenter_coreset",
    "graph_kcore_peel",
    "similarity_rrf_fusion",
    "privacy_k_anonymity",
    "orders_benford_digits",
    "dedup_split_leakage",
    "embedding_label_agreement",
    "events_psi_drift",
    "orders_seasonal_index",
    "text_compression_quality",
    "embedding_diversity_gram",
    "dedup_funnel_report",
    "text_langid_confusion",
    "events_next_event_accuracy",
    "supplier_brand_hhi",
    "events_dau_wau_stickiness",
    # fourth r9 session
    "events_tukey_fences",
    "events_pettitt_changepoint",
    "privacy_t_closeness",
    "events_did_readout",
    "dedup_bloom_prefilter",
    "lineitem_discount_elasticity",
    "sample_hard_negatives",
    "text_code_detection",
    "timeseries_acf_lags",
    "timeseries_rolling_median",
    "lineitem_returnflag_anova",
    "orders_scd2_intervals",
    "events_ks_two_sample",
    "events_hill_tail_index",
    "orders_reactivation",
    "events_quantile_treatment_effect",
    "text_quality_retention_curve",
    "events_weekday_hour_heatmap",
    "events_user_growth_curve",
    "sample_recency_decay",
    "events_window_funnel",
    "text_naive_bayes_langid",
    "events_slo_burn_rate",
    "lineitem_duplicate_lines_screen",
    "dedup_incremental_neardup",
    "orders_user_similarity_jaccard",
    "events_lifecycle_stages",
    "sample_balanced_langs",
    "pipeline_dataset_card",
    "events_peak_concurrency",
    "similarity_centroid_classifier",
    "lineitem_supplier_switching",
    "timeseries_metric_correlations",
    # r10: the two-pass window swaps + the round's additions
    "orders_abc_analysis",
    "text_token_burstiness",
    "corpus_lang_source_independence",
    "events_interarrival_histogram",
    "events_seasonal_decompose",
    "sample_neyman_allocation",
    # r11 additions
    "events_power_analysis",
    "lineitem_price_index",
    "events_markov_entropy_rate",
    "sample_importance_reweight",
    "text_source_js_divergence",
    # late-r11 additions
    "events_mann_whitney",
    "text_quality_length_spearman",
    "privacy_dp_noise_calibration",
    # r12 additions
    "events_kaplan_meier",
    "events_cmh_test",
    "text_good_turing_coverage",
    "events_ewma_residuals",
    "events_winsorized_ab",
    # r13 additions
    "events_double_ewma_holt",
    "events_benjamini_hochberg",
    "text_keyword_rake",
    "orders_twoway_fixed_effects",
    "sample_pps_systematic",
    # late-r13 additions
    "orders_association_rules",
    "events_cuped_adjusted_ab",
    "lineitem_theil_index",
    # r14 additions
    "events_sprt_readout",
    "text_burrows_delta",
    # late-r14 additions
    "text_yule_k",
    "events_page_hinkley_drift",
    "lineitem_newsvendor_quantile",
    # r15 additions
    "orders_queue_little_law",
    "text_ttr_curve",
    # r16: simhash core plan coverage (the C6-pattern scan's blind spot
    # — it scans EXPLAINS.md, so uncovered plans are unscanned)
    "dedup_simhash_pairs",
    # late-r15 additions
    "text_freq_spectrum",
    "events_recurrence_cohorts",
    "sample_horvitz_thompson",
    "text_heaps_law_fit",
    "orders_runs_test",
    "orders_bootstrap_ci",
    "embedding_intrinsic_dim",
)


def _parse_tree(plan: str):
    """Parse a formatted physical plan into (nodes, children):
    nodes[i] = (node_id, name); children = parent node_id -> [child
    node_ids], from the indented tree section; details = node_id ->
    detail text (the '(n) NodeName' blocks)."""
    import re

    lines = plan.splitlines()
    tree: list[tuple[int, int, str]] = []  # (depth, node_id, name)
    node_re = re.compile(r"^([ +:\-*]*)(\S[^()]*?)\s*\((\d+)\)")
    for ln in lines:
        if tree and not ln.strip():
            break  # tree section ends at the first blank line AFTER it began
        if ln.startswith("=="):
            continue
        # node id is the FIRST (n) after the name; trailing annotations
        # like "(columnarIn=false, ...)" may follow
        m = node_re.match(ln)
        if not m:
            continue
        indent, name, nid = m.group(1), m.group(2), int(m.group(3))
        tree.append((len(indent), nid, name.lstrip("* ").strip()))
    details: dict[int, str] = {}
    cur, buf = None, []
    for ln in lines:
        m = re.match(r"^\((\d+)\)\s", ln)
        if m:
            if cur is not None:
                details[cur] = "\n".join(buf)
            cur, buf = int(m.group(1)), [ln]
        elif cur is not None:
            buf.append(ln)
    if cur is not None:
        details[cur] = "\n".join(buf)
    return tree, details


def scan_c6_pattern(explains_path: str) -> list[str]:
    """Standing C6-pattern scan (r16, VERDICT r15 #5): flag any plan
    where an ``Exchange hashpartitioning(...)`` sits above a
    ``Generate`` (row-multiplying explode) whose subtree reaches an
    ``Exchange RoundRobinPartitioning`` with no other Exchange between
    — i.e. a round-robin spread whose multiplied stream is then
    re-exchanged on a key that existed BEFORE the explode. The fix is
    ``spread_by(key)`` (one exchange of un-multiplied rows). Returns
    ["query: hash-node-id -> roundrobin-node-id", ...]."""
    with open(explains_path) as fh:
        text = fh.read()
    hits: list[str] = []
    blocks = text.split("\n## ")
    for block in blocks[1:]:
        qname, _, rest = block.partition("\n")
        qname = qname.strip()
        code = rest.split("```")
        if len(code) < 2:
            continue
        tree, details = _parse_tree(code[1])

        def exch_kind(nid: int) -> str:
            d = details.get(nid, "")
            if "RoundRobinPartitioning" in d:
                return "roundrobin"
            if "hashpartitioning" in d:
                return "hash"
            return "other"

        import re as _re

        def hash_keys(nid: int) -> str:
            m = _re.search(r"hashpartitioning\(([^)]*)\)", details.get(nid, ""))
            keys = m.group(1) if m else "?"
            # strip expr ids and the trailing partition count
            keys = _re.sub(r"#\d+L?", "", keys)
            parts = [p.strip() for p in keys.split(",")]
            if parts and parts[-1].isdigit():
                parts = parts[:-1]
            return ",".join(parts)

        # Linear pass with an ancestor-state stack (node ids can repeat
        # when a shared InMemoryRelation subtree is printed more than
        # once, so a children-map recursion would walk exponentially).
        # State per ancestor chain: (nearest enclosing hash-exchange id
        # or None, Generate id seen strictly below it or None).
        stack: list[tuple[int, int | None, int | None]] = []
        for depth, nid, name in tree:
            while stack and stack[-1][0] >= depth:
                stack.pop()
            hash_anc, gen = (stack[-1][1], stack[-1][2]) if stack else (None, None)
            if name == "Exchange":
                kind = exch_kind(nid)
                if kind == "roundrobin" and hash_anc is not None and gen is not None:
                    # Pre-explode (pass-through) columns = the Generate's
                    # Input list. A downstream hashpartitioning whose key
                    # set intersects them is CONVERTIBLE: repartitioning
                    # by that pre-explode subset BEFORE the explode
                    # satisfies the agg/window's ClusteredDistribution
                    # (subset rule — verified on Spark 4.1), so the
                    # multiplied-stream exchange is elided. Low-cardinality
                    # subsets (lang, source) must still be skipped by the
                    # reviewer — spread_by needs key cardinality >> cores.
                    gdet = details.get(gen, "")
                    m_in = _re.search(r"Input \[\d+\]: \[([^\]]*)\]", gdet)
                    incols = set(
                        _re.findall(r"(\w+)#\d+", m_in.group(1)) if m_in else []
                    )
                    keys = hash_keys(hash_anc)
                    keycols = set(_re.findall(r"\w+", keys))
                    pre = sorted(keycols & incols)
                    verdict = (
                        f"CONVERTIBLE via spread_by({','.join(pre)})"
                        if pre
                        else "keyed only on explode-born columns — round-robin OK"
                    )
                    hits.append(
                        f"{qname}: Exchange({hash_anc}) hashpartitioning({keys}) "
                        f"over Generate({gen}) over RoundRobin Exchange({nid}) [{verdict}]"
                    )
                # any exchange resets the window (it re-distributes)
                hash_anc = nid if kind == "hash" else None
                gen = None
            elif name.startswith("Generate"):
                gen = nid
            stack.append((depth, hash_anc, gen))
    return sorted(set(hits))


def main() -> None:
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    unknown = [n for n in EXTRA if n not in specs]
    if unknown:
        # Mirror the registry's unknown-rotation-name raise (ADVICE r12):
        # a misspelled or later-renamed EXTRA entry must fail loudly, not
        # silently shrink the audit.
        raise KeyError(f"EXTRA names not in all_queries(): {unknown}")
    names = sorted(n for n, s in specs.items() if s.bench) + list(EXTRA)
    out = ["# EXPLAINS — physical plans of the headline + scale-sensitive queries",
           "",
           f"Generated by `tools/explain_audit.py` at `{SF_DIR}` — {len(names)} plans.",
           "Things to check",
           "per plan: `PushedFilters`/`ReadSchema` on scans (pushdown + pruning),",
           "`BroadcastHashJoin` only on dimension/rate tables, paired",
           "`HashAggregate` nodes (partial+final), `TakeOrderedAndProject` for",
           "top-k, no `CartesianProduct`/`BatchEvalPython` in relational paths.",
           ""]
    for name in names:
        df = specs[name].builder(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAINS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote EXPLAINS.md ({len(names)} plans)")
    spark.stop()
    # Standing C6-pattern scan (r16, VERDICT r15 #5): every hit must be
    # converted to spread_by or carry a justification (low-cardinality
    # pre-explode key, or key born in the explode) — see
    # OPTIMIZATION_r16.md "C11/C12".
    hits = scan_c6_pattern(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAINS.md"
        )
    )
    conv = [h for h in hits if "CONVERTIBLE" in h]
    print(f"C6-pattern scan: {len(hits)} hits ({len(conv)} convertible)")
    for h in hits:
        print(" ", h)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scan":
        # Scan an existing EXPLAINS.md without regenerating (no Spark).
        for _h in scan_c6_pattern(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAINS.md")
        ):
            print(_h)
    else:
        main()
