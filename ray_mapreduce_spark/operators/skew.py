"""Skew-mitigation operators: salting for hot keys.

At 100 TB a handful of hot keys (the empty document, a default user
id, a null-ish sentinel) can pin one reducer for hours — the
reference has exactly this failure mode baked in (one reducer actor
owns a hot key's whole value list in memory, reference
mapreduce.py:118,127-133). Two mitigations ship here:

- AQE skew-join handling is ON in the engine conf (session.py) — the
  first line of defense, zero code.
- ``salted_aggregate`` for aggregations whose combine is algebraic:
  explicit two-phase salt -> partial agg -> unsalt -> final agg, for
  cases where the optimizer can't help (e.g. a single monster group).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Callable[[], list[Column]],
    combine: Callable[[], list[Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``aggs()`` builds the partial aggregate columns (aliased), run per
    (keys + salt); ``combine()`` builds the matching final combiners
    over the partial columns (same aliases). Example::

        salted_aggregate(
            lineitem, ["l_returnflag"],
            aggs=lambda: [F.sum("l_quantity").alias("s"),
                          F.count(F.lit(1)).alias("n")],
            combine=lambda: [F.sum("s").alias("s"), F.sum("n").alias("n")],
        )

    The salt spreads each hot key over ``n_salts`` reducers in phase 1;
    phase 2 combines ``n_salts`` rows per key — bounded fan-in however
    hot the key is.
    """
    # round-robin salt within each partition: cheap, uniform, and needs
    # no randomness (monotonic id increments per row)
    salted = df.withColumn("_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "_salt").agg(*aggs())
    return phase1.groupBy(*keys).agg(*combine())


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the (skewed) fact side, replicate the
    dim side across the salt range, join on (key, salt).

    For when the dim side is too big to broadcast AND a handful of hot
    fact keys would pin single reducers: every hot key's rows spread
    over ``n_salts`` reducers, at the cost of shuffling the dim side
    ``n_salts``x — the classic trade when AQE's skew splitting can't
    apply (e.g. the skewed side feeds from a shuffle AQE already
    coalesced, or the join is inside a cached subtree). The result is
    row-identical to the plain join: each fact row meets each matching
    dim row exactly once (at its own salt).

    ``how`` supports inner/left: the salt never drops fact rows. A
    right/full variant would need unmatched-dim bookkeeping across
    replicas — use the plain join there.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = salted_fact.join(
        replicated_dim,
        (salted_fact[fact_key] == replicated_dim[dim_key])
        & (salted_fact["_salt"] == replicated_dim["_salt"]),
        how,
    )
    # re-project the callers' columns (both _salt columns dropped,
    # parent-qualified so the shared name never resolves ambiguously)
    return joined.select(
        *[salted_fact[c] for c in fact.columns], *[replicated_dim[c] for c in dim.columns]
    )
