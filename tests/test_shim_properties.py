"""Property-based shim tests (hypothesis): the compatibility shim must
agree with a pure-Python reference evaluation of the same map/reduce
program on ARBITRARY inputs — a stronger contract than the reference's
four golden tests (SURVEY.md §5 notes it ships no property tests).

The pure-Python evaluator below IS the §4.3 semantic spec: flat-map
every record through the generator, group values by key (multiset),
apply the holistic reduce per key, unordered output.
"""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ray_mapreduce_spark.mapreduce import MapReduceBulk

# session-scoped spark fixture comes from conftest


def py_mapreduce(data, map_fcn, reduce_fcn):
    groups = defaultdict(list)
    for rec in data:
        for k, v in map_fcn(rec):
            groups[k].append(v)
    return [reduce_fcn(k, vs) for k, vs in groups.items()]


def map_mod(rec):
    yield (str(rec % 7), rec)
    if rec % 2 == 0:
        yield ("even", rec)


def reduce_stats(k, values):
    return (k, len(values), sum(values), max(values))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=300),
    num_mappers=st.integers(min_value=1, max_value=4),
    num_reducers=st.integers(min_value=1, max_value=5),
    chunk=st.integers(min_value=1, max_value=50),
)
def test_shim_matches_pure_python(spark, data, num_mappers, num_reducers, chunk):
    expected = sorted(py_mapreduce(data, map_mod, reduce_stats))
    got = sorted(
        MapReduceBulk(
            data, map_mod, reduce_stats, num_mappers, num_reducers,
            max_chunk_size=chunk, spark=spark,
        )
    )
    assert got == expected


def test_docstring_example_golden(spark):
    """The reference docstring's own example (reference mapreduce.py:
    36-44): per-key sum over two emits (x^2, sqrt(x)) with key=x ->
    1000 singleton groups of x^2 + sqrt(x)."""

    def m(x):
        yield (str(x), x**2)
        yield (str(x), x**0.5)

    out = dict(
        MapReduceBulk(range(1000), m, lambda k, vs: (k, sum(vs)), 4, 4, spark=spark)
    )
    assert len(out) == 1000
    assert out["4"] == 16 + 2.0
    assert out["999"] == 999**2 + 999**0.5
