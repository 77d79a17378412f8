"""Python UDTF (Spark 4): the generator-map analog of the reference's
map_fcn (0..N output rows per input row, reference mapreduce.py:16,
36-38), as a first-class SQL-callable table function.
"""

from __future__ import annotations

from pyspark.sql.functions import col, lit, udtf


@udtf(returnType="pos: int, token: string")
class Tokenize:
    """One output row per token — multi-emit; empty text -> zero-emit."""

    def eval(self, text: str):
        if not text:
            return
        for pos, token in enumerate(text.split(" ")):
            yield (pos, token)


def test_udtf_multi_emit(spark):
    rows = Tokenize(lit("a b c")).collect()
    assert [(r["pos"], r["token"]) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_udtf_zero_emit(spark):
    assert Tokenize(lit("")).collect() == []


def test_udtf_lateral_join_sql(spark, sf_dir):
    from ray_mapreduce_spark.sources import load_table

    spark.udtf.register("tokenize", Tokenize)
    # One deterministic subset for BOTH sides: limit() without an
    # ordering is not stable across evaluations, so derive the view
    # and the expected count from the same orderBy(doc_id) slice.
    docs10 = load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(10)
    docs10.createOrReplaceTempView("docs10")
    out = spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM docs10 d, LATERAL tokenize(d.text) t"
    )
    rows = out.collect()
    assert len(rows) > 10  # fan-out happened
    # totality: token count matches a plain split over the same slice
    expected = (
        docs10.selectExpr("size(split(text, ' ')) AS n").groupBy().sum("n").collect()[0][0]
    )
    assert len(rows) == expected
