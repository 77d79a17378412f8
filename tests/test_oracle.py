"""The local correctness gate: every oracle-paired query must match
DuckDB order-insensitively — same contract the driver applies at
sf0.01. Runs at sf0.001 by default (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to mirror the driver.
"""

from __future__ import annotations

import pytest

from ray_mapreduce_spark.plans import all_queries
from ray_mapreduce_spark.testing import compare_query

_SPECS = all_queries()
_ORACLE_NAMES = sorted(n for n, s in _SPECS.items() if s.oracle is not None)
_ROWS_ONLY_NAMES = sorted(n for n, s in _SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = _SPECS[name]
    res = compare_query(spark, name, spec.builder, spec.oracle, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows > 0, f"{name}: query returned no rows at {sf_dir}"


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = _SPECS[name]
    df = spec.builder(spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    # Must execute without error; >=0 rows (some candidate-pair queries
    # can legitimately be empty at tiny sf).
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() > 0
    assert set(mod.oracle_sql()) <= set(mod.queries())

def test_values_equal_rejects_int_float_type_drift():
    """Regression for r3's array_hof_functions red row: DuckDB list_sum
    returned DOUBLE 9.0 while Spark returned INT 9. The driver hashes
    typed values so that mismatches; the old comparator coerced both to
    float and passed. The local gate must be at least as strict."""
    from ray_mapreduce_spark.testing import _values_equal

    assert not _values_equal(9, 9.0)
    assert not _values_equal(9.0, 9)
    assert _values_equal(9, 9)
    assert _values_equal(9.0, 9.0)
    assert _values_equal(float("nan"), float("nan"))
    assert not _values_equal(None, 0.0)
    assert _values_equal(None, None)


def test_values_equal_is_bit_exact_for_floats():
    """Regression for r13's orders_twoway_fixed_effects red row: the
    engines diverged by 1.0 at 2.2e10 magnitude, inside the old
    comparator's rel_tol=1e-9 slack (±22 up there) — every local sweep
    was green while the driver hash red-flagged it. Floats now compare
    EXACTLY (the driver hashes typed bytes), signed zero included
    (gotcha #3: -0.0 and 0.0 hash differently)."""
    from ray_mapreduce_spark.testing import _values_equal

    assert not _values_equal(9.0, 9.0 + 1e-12)
    assert not _values_equal(22130666317.0, 22130666318.0)
    assert not _values_equal(0.0, -0.0)
    assert _values_equal(-0.0, -0.0)
