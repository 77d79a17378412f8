"""Declarative query registry.

Every engine capability (SURVEY.md §2) is exposed as a named query:
a builder ``(spark, sf_dir) -> DataFrame`` plus, when the semantics
are ANSI-SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables. The driver's correctness gate runs both sides at
sf=0.01 and compares row-count + schema + order-insensitive
value-hash — so builders and oracles MUST use identical output
column names and value-stable types (doubles rounded, timestamps
formatted to strings, int aggregates cast to BIGINT on the DuckDB
side where DuckDB would widen to HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, bench=bench, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules lazily to avoid circular imports.
    from . import _load_all  # noqa: F401

    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    return all_queries()[name]
