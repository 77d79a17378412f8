#!/usr/bin/env python
"""Round-audit sweeps beyond the driver's gate (CLAUDE.md gotcha #13).

Usage:
    python tools/audit_sweep.py oracle [SF_DIR]      # full oracle sweep
    python tools/audit_sweep.py determinism [SF_DIR] # partition-determinism

- ``oracle``: compare every oracle-paired query against DuckDB at
  SF_DIR (default sf0.1 — 10x the driver's scale; ties and rounding
  boundaries only appear with more data).
- ``determinism``: run EVERY registered query twice with different
  shuffle-partition settings and require identical sorted results
  (catches min_by-style ties, unordered limits, partition-id leaks).

Both print one summary line; non-empty failure lists exit 1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def _spark():
    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def oracle_sweep(sf_dir: str) -> int:
    import __spark_entry__ as mod
    from ray_mapreduce_spark.testing import compare_query

    spark = _spark()
    q, o = mod.queries(), mod.oracle_sql()
    bad = []
    t0 = time.time()
    for n in sorted(o):
        r = compare_query(spark, n, q[n], o[n], sf_dir)
        if not r.ok:
            bad.append((n, r.detail[:150]))
        print(f"# {n}: {'ok' if r.ok else 'MISMATCH'}", file=sys.stderr)
    print(
        f"oracle sweep @ {sf_dir}: {len(o)} queries, "
        f"mismatches: {bad or 'none'}, {time.time()-t0:.0f}s"
    )
    return 1 if bad else 0


def determinism_sweep(sf_dir: str) -> int:
    import __spark_entry__ as mod

    spark = _spark()
    q = mod.queries()
    bad = []
    t0 = time.time()
    for n in sorted(q):
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(tuple, q[n](spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(map(tuple, q[n](spark, sf_dir).collect()))
        if a != b:
            bad.append(n)
        print(f"# {n}: {'ok' if a == b else 'NONDETERMINISTIC'}", file=sys.stderr)
    print(
        f"determinism sweep @ {sf_dir}: {len(q)} queries, "
        f"nondeterministic: {bad or 'none'}, {time.time()-t0:.0f}s"
    )
    return 1 if bad else 0


def recall_sweep(sf_dir: str) -> int:
    """Run the extension quality gates (tests/test_extensions.py —
    recall/exactness contracts for every rows-only LSH/sketch query)
    at ``sf_dir`` instead of the default test sf. The two-scale-factor
    evidence (default sf0.001 via pytest, sf0.1 via this sweep) is
    what keeps the rows-only queries honest (VERDICT r5 #5)."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_TEST_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32")
    t0 = time.time()
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_extensions.py", "-q"],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    print(f"recall sweep @ {sf_dir}: rc={rc}, {time.time()-t0:.0f}s")
    return rc


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "oracle"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    fns = {"oracle": oracle_sweep, "determinism": determinism_sweep, "recall": recall_sweep}
    sys.exit(fns[mode](sf))
