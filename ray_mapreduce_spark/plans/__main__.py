"""Registry inventory CLI: ``python -m ray_mapreduce_spark.plans``
prints every registered query with its verification mode and tags —
the discoverability surface for a user auditing coverage.
"""

from __future__ import annotations

from . import all_queries


def main() -> None:
    qs = all_queries()
    n_oracle = sum(1 for s in qs.values() if s.oracle is not None)
    print(f"{len(qs)} registered queries ({n_oracle} DuckDB-oracle-paired, "
          f"{len(qs) - n_oracle} rows-only):\n")
    for i, (name, spec) in enumerate(qs.items(), 1):
        mode = "oracle" if spec.oracle is not None else "rows-only"
        bench = " [bench]" if spec.bench else ""
        print(f"{i:3d}. {name:34s} {mode:9s}{bench}  {','.join(spec.tags)}")


if __name__ == "__main__":
    main()
