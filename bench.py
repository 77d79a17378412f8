#!/usr/bin/env python
"""Benchmark runner: times the headline queries (QuerySpec.bench=True)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as a full plan->execute->collect cycle (the
driver-visible latency). Before timing, every headline query runs once
at sf0.001 untimed: that compiles/JITs each query's codegen paths, so
the timed sf0.1 runs measure steady-state throughput (what a
long-running cluster delivers) rather than first-call JVM compilation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ray_mapreduce_spark.plans import all_queries
from ray_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("ray_mapreduce_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {n: s for n, s in all_queries().items() if s.bench}

    # Warm-up: run each headline query once at the BENCH sf (untimed),
    # then time a second run — classic steady-state methodology. A
    # smaller-sf warmup is not enough: AQE picks different physical
    # stage shapes per input size, so only a same-size run compiles the
    # exact codegen paths the timed run executes.
    for spec in specs.values():
        try:
            spec.builder(spark, SF_DIR).collect()
        except Exception as exc:  # pragma: no cover - warmup best-effort
            print(f"# warmup {spec.name} failed: {exc}", file=sys.stderr)
    # Drop warmup caches so timed runs start from a clean executor heap
    # (each query re-persists what it needs).
    spark.catalog.clearCache()

    # Two timed runs per query, report the MIN: the minimum is the
    # standard noise-robust estimator for single-machine timings
    # (co-tenant CPU noise only ever ADDS time).
    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.builder(spark, SF_DIR)
            n = len(df.collect())
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # Reference-workload throughput trio (reported separately, not in
    # the headline total): the reference unittest job (map x -> (x%9,
    # x^2), reduce max; reference mapreduce_unittest.py:6-11) over 2M
    # records, three ways:
    #   - python:  single-process pure-Python evaluation (a generous
    #     stand-in for the reference's single-node throughput — Ray
    #     actor/RPC/poll overhead removed; Ray isn't installed here)
    #   - shim:    our compatibility path (same opaque-UDF semantics)
    #   - native:  the DataFrame expression of the same job — the
    #     engine answer a migrated user should write
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ray_mapreduce_spark.mapreduce import MapReduceBulk

    # Release query caches/checkpoints before the throughput trio so it
    # isn't penalized by the headline queries' leftover executor state.
    spark.catalog.clearCache()

    n_rec = 2_000_000

    def mr_map(x):
        yield (str(x % 9), x * x)

    def mr_reduce(k, vs):
        return (k, max(vs))

    compat: dict[str, float] = {}

    def best2(fn, runs: int = 3) -> float:
        """Min of three runs (the r2 driver trio was taken under
        co-tenant CPU contention — the pure-python baseline itself
        inflated 47% vs r1 — so the trio gets one more sample than
        the headline queries); the first run doubles as the warmup."""
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
            assert len(out) == 9
        return round(best, 3)

    def py_job():
        groups: dict = defaultdict(list)
        for x in range(n_rec):
            for k, v in mr_map(x):
                groups[k].append(v)
        return [mr_reduce(k, vs) for k, vs in groups.items()]

    compat["python_single_process"] = best2(py_job)
    compat["shim_mapreduce"] = best2(
        lambda: MapReduceBulk(
            range(n_rec), mr_map, mr_reduce, 32, 32, max_chunk_size=100_000, spark=spark
        )
    )
    # Same job through the opt-in algebraic path (combiner= declares
    # the reduce associative -> reduceByKey, map-side partial agg).
    compat["shim_mapreduce_combiner"] = best2(
        lambda: MapReduceBulk(
            range(n_rec), mr_map, mr_reduce, 32, 32, max_chunk_size=100_000,
            spark=spark, combiner=max,
        )
    )
    compat["dataframe_native"] = best2(
        lambda: (
            spark.range(n_rec)
            .groupBy(F.pmod("id", F.lit(9)).cast("string").alias("k"))
            .agg(F.max(F.col("id") * F.col("id")).alias("m"))
            .collect()
        )
    )
    print(f"# reference 2M-record job: {compat}", file=sys.stderr)

    # Solo-run sanity: the pure-python loop is a fixed workload whose
    # solo time on this box is a recorded envelope (~0.70-0.90s; r1
    # driver 0.76s, CLAUDE.md local solo runs). If it lands above the
    # envelope the whole run is co-tenant-contended (gotcha #11) and
    # EVERY number here — including the ratios — is inflated; flag it
    # in the JSON so a reader doesn't mistake contention for regression.
    contended = compat["python_single_process"] > 0.95
    if contended:
        print(
            "# WARNING: python baseline "
            f"{compat['python_single_process']:.2f}s exceeds the solo-run "
            "envelope (~0.70-0.90s) — this run was CPU-contended; treat "
            "all timings as upper bounds",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or "0.1")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reference_job_2m_records": compat,
                "cpu_contended_run": contended,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
