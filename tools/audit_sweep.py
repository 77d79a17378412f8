#!/usr/bin/env python
"""Round-audit sweeps beyond the driver's gate (CLAUDE.md gotcha #13).

Usage:
    python tools/audit_sweep.py oracle [SF_DIR] [--changed-only]
    python tools/audit_sweep.py determinism [SF_DIR] [--changed-only]

- ``oracle``: compare every oracle-paired query against DuckDB at
  SF_DIR (default sf0.1 — 10x the driver's scale; ties and rounding
  boundaries only appear with more data).
- ``determinism``: run EVERY registered query twice with different
  shuffle-partition settings and require identical sorted results
  (catches min_by-style ties, unordered limits, partition-id leaks).

Both print one summary line; non-empty failure lists exit 1.

``--changed-only`` skips queries whose plan hash already passed this
mode+SF in ``tools/.sweep_cache.json``. Since r9 the hash covers the
builder's whole module PLUS its transitive `from .X import` sibling
plans modules PLUS a shared digest over every non-plans package
module (sources/, operators/, functions/, streaming/, ...), so
loader/helper edits invalidate dependents and closing sweeps may use
the flag. Still conservative: any module edit re-runs all its
dependent queries.

Both sweeps release persisted caches between queries
(testing.release_caches) and report the peak cached-block footprint —
without the release, a full-registry session accumulates every
query's persisted corpus until LRU eviction.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".sweep_cache.json")


def _plan_hashes(source_overrides: dict | None = None) -> dict:
    """name -> sha256 over (every non-plans package module, the
    builder's plans module + its TRANSITIVE sibling plans imports,
    oracle SQL).

    r9 (VERDICT r8 #4): the r8 key hashed only the builder module +
    oracle, blind to sources//operators//functions//streaming/ helper
    edits AND to cross-plans-module helpers (dedup pulls
    QUALITY_RAW_SQL from text_analysis; graph->similarity->dedup).
    Now a shared digest over all non-plans modules is mixed into
    every key and `from .X import` sibling edges are followed
    transitively, so a helper edit invalidates its dependents and
    closing sweeps may use --changed-only safely.

    ``source_overrides`` maps package-relative paths (e.g.
    ``sources/__init__.py``) to replacement source — test hook."""
    import hashlib
    import pathlib
    import re

    from ray_mapreduce_spark.plans import all_queries

    pkg = pathlib.Path(__file__).resolve().parent.parent / "ray_mapreduce_spark"
    srcs = {
        p.relative_to(pkg).as_posix(): p.read_text()
        for p in sorted(pkg.rglob("*.py"))
    }
    if source_overrides:
        srcs.update(source_overrides)

    shared = hashlib.sha256()
    for rel in sorted(srcs):
        if not rel.startswith("plans/"):
            shared.update(rel.encode())
            shared.update(srcs[rel].encode())
    shared_digest = shared.digest()

    sib = {
        rel: set(re.findall(r"from \.(\w+) import", srcs[rel]))
        for rel in srcs
        if rel.startswith("plans/")
    }

    def closure(base: str) -> list:
        seen: set = set()
        todo = {base}
        while todo:
            m = todo.pop()
            if m in seen:
                continue
            seen.add(m)
            todo |= sib.get(f"plans/{m}.py", set())
        return sorted(seen)

    out = {}
    for name, spec in all_queries().items():
        base = spec.builder.__module__.rsplit(".", 1)[-1]
        h = hashlib.sha256()
        h.update(shared_digest)
        for m in closure(base):
            h.update(srcs.get(f"plans/{m}.py", "").encode())
        h.update((spec.oracle or "").encode())
        out[name] = h.hexdigest()
    return out


def _cache_load() -> dict:
    import json

    try:
        with open(_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _cache_store(cache: dict) -> None:
    import json

    with open(_CACHE_PATH, "w") as f:
        json.dump(cache, f, indent=0, sort_keys=True)


class _Hygiene:
    """Between-query cache release + peak-storage telemetry."""

    def __init__(self, spark):
        self.spark = spark
        self.peak_mem = 0
        self.peak_disk = 0

    def after_query(self):
        from ray_mapreduce_spark.testing import release_caches, storage_bytes

        mem, disk = storage_bytes(self.spark)
        self.peak_mem = max(self.peak_mem, mem)
        self.peak_disk = max(self.peak_disk, disk)
        release_caches(self.spark)

    def report(self) -> str:
        return (
            f"peak cached storage {self.peak_mem/1e6:.0f} MB mem"
            f" / {self.peak_disk/1e6:.0f} MB disk (released per query)"
        )


def _spark():
    s = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def oracle_sweep(sf_dir: str, changed_only: bool = False) -> int:
    import __spark_entry__ as mod
    from ray_mapreduce_spark.testing import compare_query

    spark = _spark()
    q, o = mod.queries(), mod.oracle_sql()
    hashes = _plan_hashes()
    cache = _cache_load()
    ckey = f"oracle@{sf_dir}"
    done = cache.get(ckey, {})
    bad = []
    skipped = 0
    hyg = _Hygiene(spark)
    t0 = time.time()
    for n in sorted(o):
        if changed_only and done.get(n) == hashes[n]:
            skipped += 1
            continue
        r = compare_query(spark, n, q[n], o[n], sf_dir)
        if not r.ok:
            bad.append((n, r.detail[:150]))
            done.pop(n, None)
        else:
            done[n] = hashes[n]
        print(f"# {n}: {'ok' if r.ok else 'MISMATCH'}", file=sys.stderr)
        hyg.after_query()
        cache[ckey] = done
        _cache_store(cache)
    print(
        f"oracle sweep @ {sf_dir}: {len(o)} queries ({skipped} unchanged-skipped), "
        f"mismatches: {bad or 'none'}, {time.time()-t0:.0f}s; {hyg.report()}"
    )
    return 1 if bad else 0


def determinism_sweep(sf_dir: str, changed_only: bool = False) -> int:
    import __spark_entry__ as mod

    spark = _spark()
    q = mod.queries()
    hashes = _plan_hashes()
    cache = _cache_load()
    ckey = f"determinism@{sf_dir}"
    done = cache.get(ckey, {})
    bad = []
    skipped = 0
    hyg = _Hygiene(spark)
    t0 = time.time()
    for n in sorted(q):
        if changed_only and done.get(n) == hashes[n]:
            skipped += 1
            continue
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = sorted(map(tuple, q[n](spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = sorted(map(tuple, q[n](spark, sf_dir).collect()))
        if a != b:
            bad.append(n)
            done.pop(n, None)
        else:
            done[n] = hashes[n]
        print(f"# {n}: {'ok' if a == b else 'NONDETERMINISTIC'}", file=sys.stderr)
        hyg.after_query()
        cache[ckey] = done
        _cache_store(cache)
    print(
        f"determinism sweep @ {sf_dir}: {len(q)} queries ({skipped} unchanged-skipped), "
        f"nondeterministic: {bad or 'none'}, {time.time()-t0:.0f}s; {hyg.report()}"
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
    args = [a for a in sys.argv[1:] if a != "--changed-only"]
    changed_only = "--changed-only" in sys.argv[1:]
    mode = args[0] if args else "oracle"
    sf = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    if mode == "recall":
        sys.exit(recall_sweep(sf))
    fns = {"oracle": oracle_sweep, "determinism": determinism_sweep}
    sys.exit(fns[mode](sf, changed_only))
