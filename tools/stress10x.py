#!/usr/bin/env python
"""10x data-densification stress (SCALING.md 'Empirical 10x stress'):
replicate sf0.1 tables 10x with shifted keys into a temp dir, then
time selected operators on both corpora. Not a correctness gate (the
oracle sweeps own that) — a wall-clock scaling probe for operators
whose cost model claims linearity.

Run: python tools/stress10x.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ray_mapreduce_spark.plans import all_queries  # noqa: E402
from ray_mapreduce_spark.session import get_spark  # noqa: E402
from ray_mapreduce_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# r9 (VERDICT r8 #7): the dedup/ANN family joined the default probe
# set — densified data is where banding/candidate cost models bend
# (each 10x replica is an EXACT duplicate family of 10, so near-dup
# pair output grows ~45x per family by design; the probe documents
# how the CANDIDATE stages absorb that).
DEFAULT = [
    "text_ngram_novelty",
    "text_distinctive_terms",
    "orders_market_basket_pairs",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefixfilter",
    "dedup_simhash_pairs",  # @10x the saturation guard FIRES by design
    # (50k docs in one blocked population crosses the 16-bit-band
    # saturation line — the probe documents the loud error, see
    # SCALING.md's stress section); at 1x it must stay under the guard.
    "similarity_pq_adc_topk",
    # r10 (VERDICT r9 #7): the r9 families that had not seen 10x data.
    "dedup_edit_distance_pairs",  # prefix blocks densify into exact-clone
    # families of 10 — probes in-block quadratic growth under the
    # 256-pairs/doc saturation guard ((k-1)/2 = 4.5 per replica family).
    "similarity_topk_ivfpq",  # candidate count per probed cell grows 10x;
    # ADC stays integer table lookups — probe the per-cell join growth.
    "orders_open_backlog_daily",  # interval stabbing: 10x orders on the
    # same calendar — the daily running-sum frame is calendar-bounded,
    # only the per-day delta agg should grow.
    "events_peak_concurrency",  # sweep-line over 10x sessions through
    # the two-pass cumsum — offsets stay one row per partition.
    # r11 (VERDICT r10 #5): the two-pass range-partition pattern itself
    # at 10x fact data — the offsets frame is the scale claim (one row
    # per partition[, group], NOT per fact row); wall-clock must track
    # the pre-rank aggregate, not the fact table.
    "events_user_gini",  # two_pass_rank over 10x the user aggregate
    "orders_abc_analysis",  # two_pass_cumsum over 10x the part aggregate
    # late r11: the bounded-value-histogram rank trick — replication
    # reuses the SAME value set, so the rank histograms are IDENTICAL
    # at 10x and only the fact-side partial agg grows; wall-clock must
    # stay ~flat.
    "events_mann_whitney",
    "text_quality_length_spearman",
]

SHIFT = {
    "documents": ("doc_id", 1_000_000),
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 100_000_000),
    "embeddings": ("vec_id", 1_000_000),
}


def build_10x(spark, out_dir: str) -> None:
    for table, (key, shift) in SHIFT.items():
        base = load_table(spark, SF_DIR, table)
        parts = [base.withColumn(key, F.col(key) + F.lit(i * shift)) for i in range(10)]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        rep.write.mode("overwrite").parquet(os.path.join(out_dir, f"{table}.parquet"))
    for table in ("region", "nation", "customer", "supplier", "part"):
        src = os.path.join(SF_DIR, f"{table}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, f"{table}.parquet"))


def main(names: list[str]) -> None:
    spark = get_spark()
    qs = all_queries()
    tmp = tempfile.mkdtemp(prefix="stress10x_")
    try:
        t0 = time.time()
        build_10x(spark, tmp)
        print(f"# built 10x corpus in {time.time()-t0:.1f}s at {tmp}")
        for n in names:
            for label, d in (("1x", SF_DIR), ("10x", tmp)):
                spark.catalog.clearCache()
                t0 = time.time()
                try:
                    cnt = qs[n].builder(spark, d).count()
                except Exception as e:  # a guard raise IS a probe result
                    msg = str(e).splitlines()[0][:160]
                    print(f"{n} @ {label}: RAISED after {time.time()-t0:.2f}s — {msg}")
                    continue
                print(f"{n} @ {label}: {time.time()-t0:.2f}s ({cnt} rows)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)
