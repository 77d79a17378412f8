"""User-facing facade: one object that ties the engine together.

A user of the reference has two entry styles: the three MapReduce
functions (kept 1:1 in ``ray_mapreduce_spark.mapreduce``) and ad-hoc
driver scripts over them. ``Engine`` is the richer replacement
surface: named tables, the registered query library, and a full SQL
interface over the warehouse.

    eng = Engine(sf_dir="/root/testdata/sf0.1")
    eng.table("lineitem")                  # DataFrame
    eng.query("q1_pricing_summary")        # registered plan
    eng.sql("SELECT count(*) FROM orders") # ANSI SQL over all tables
    eng.query_names()                      # discoverability
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .plans import all_queries
from .session import get_spark
from .sources import TABLE_NAMES, load_table
from .sources.tables import DEFAULT_SF_DIR


class Engine:
    def __init__(self, spark: SparkSession | None = None, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self._views_registered = False

    # -- tables ------------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def table_names(self) -> tuple[str, ...]:
        return TABLE_NAMES

    # -- query library -----------------------------------------------------
    def query(self, name: str) -> DataFrame:
        return all_queries()[name].builder(self.spark, self.sf_dir)

    def query_names(self, tag: str | None = None) -> list[str]:
        specs = all_queries().values()
        if tag is not None:
            specs = [s for s in specs if tag in s.tags]
        return sorted(s.name for s in specs)

    # -- SQL ---------------------------------------------------------------
    def sql(self, statement: str) -> DataFrame:
        """Run ANSI SQL with every test table registered as a temp view
        (registered lazily, once per Engine)."""
        if not self._views_registered:
            for t in TABLE_NAMES:
                self.table(t).createOrReplaceTempView(t)
            self._views_registered = True
        return self.spark.sql(statement)
