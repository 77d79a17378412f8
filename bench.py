#!/usr/bin/env python
"""Benchmark runner: times the headline queries (QuerySpec.bench=True)
at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed as a full cold plan->execute->collect cycle (the
driver-visible latency), after one untimed warm-up query to exclude
one-time JVM/codegen startup from every measurement.
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

    # Warm-up: JVM + codegen + parquet footer caches (untimed).
    warm = next(iter(specs.values()))
    warm.builder(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        t0 = time.perf_counter()
        df = spec.builder(spark, SF_DIR)
        n = df.count() if name.startswith("_") else len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
