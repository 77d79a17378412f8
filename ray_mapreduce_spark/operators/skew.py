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
