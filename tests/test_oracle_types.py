"""Oracle output-type whitelist gate (VERDICT r12 #2b).

The driver hashes TYPED values after DuckDB's pandas conversion, so an
oracle column that lands as HUGEINT (int128) or DECIMAL silently
converts to float64 / conversion-lucky doubles and hash-mismatches a
numerically identical Spark result (the events_kaplan_meier r12 red:
a window-sum SUBTRACTION left uncast, gotcha #3 one level too
shallow). This gate fetches every oracle's arrow schema at sf0.001 —
no Spark session needed, the whole sweep runs in seconds — and
asserts every output column type is in the driver-safe whitelist, so
the class can never reach a driver run again. compare_query enforces
the same whitelist at compare time (testing.py), this gate just fails
earlier and names every offender at once.

Deliberately NOT enforced: int32-vs-int64 WIDTH agreement between the
Spark and DuckDB sides. An r13 audit found 26 such width
disagreements across ~24 queries that are all driver-GREEN (several
re-greened in r12 itself — tfidf/bm25 rk, calibration decile,
reactivation yyyymm), so the driver's typed hash provably normalizes
integer widths; only the int-vs-float KIND divergence reds.
"""

from __future__ import annotations

import os

import pytest

from ray_mapreduce_spark.plans.registry import all_queries
from ray_mapreduce_spark.testing import DRIVER_SAFE_ORACLE_TYPES, duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_every_oracle_output_type_is_driver_safe():
    con = duckdb_connection(SF_DIR)
    offenders: list[tuple[str, str, str]] = []
    try:
        for name, spec in all_queries().items():
            if spec.oracle is None:
                continue
            tbl = con.execute(
                f"SELECT * FROM ({spec.oracle}) LIMIT 5"
            ).fetch_arrow_table()
            for fld in tbl.schema:
                if str(fld.type) not in DRIVER_SAFE_ORACLE_TYPES:
                    offenders.append((name, fld.name, str(fld.type)))
    finally:
        con.close()
    assert not offenders, (
        "oracle output columns outside the driver-safe type whitelist "
        f"{sorted(DRIVER_SAFE_ORACLE_TYPES)} — these WILL hash-mismatch "
        f"under the driver's typed hash even when values are numerically "
        f"identical (the events_kaplan_meier r12 red): {offenders}"
    )


def test_whitelist_rejects_hugeint_and_decimal():
    """Negative control: the exact defect shapes from r12 must fail the
    whitelist — a window-sum subtraction left as HUGEINT and a bare
    decimal-literal round()."""
    con = duckdb_connection(SF_DIR)
    try:
        for sql in (
            # HUGEINT: uncast window-sum subtraction (kaplan_meier shape)
            "SELECT sum(x) OVER () - 0 AS v FROM (VALUES (1), (2)) t(x)",
            # DECIMAL: round(int * bare-decimal-literal) (pca lo shape)
            "SELECT round(x * 0.05, 2) AS v FROM (VALUES (1), (2)) t(x)",
        ):
            tbl = con.execute(sql).fetch_arrow_table()
            types = {str(f.type) for f in tbl.schema}
            assert not types <= DRIVER_SAFE_ORACLE_TYPES, (
                f"expected a non-whitelisted type from {sql!r}, got {types}"
            )
    finally:
        con.close()
