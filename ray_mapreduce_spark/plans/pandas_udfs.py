"""Pandas-UDF surface (SURVEY.md §2c "UDF surface" row): the engine's
user-extension points, mirroring the reference's two-UDF API
(generator ``map_fcn`` / holistic ``reduce_fcn``,
reference mapreduce.py:14-18) with their Arrow-vectorized Spark
analogs:

- ``mapInPandas``     ~= map_fcn   (batchwise generator over rows)
- ``applyInPandas``   ~= reduce_fcn (whole group materialized)
- scalar ``pandas_udf`` = per-column vectorized projection

Each carries an oracle: the UDF bodies are deterministic numpy/pandas
expressions DuckDB can reproduce, so the correctness gate covers the
Python path too — the slow path must still be the *correct* path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# --------------------------------------------------------------------------
# applyInPandas as the reduce_fcn analog: whole-group median/IQR.
@register(
    "udaf_applyinpandas_median",
    tags=("udf", "pandas-udf", "holistic", "aggregate"),
    oracle="""
    SELECT event_type,
           round(median(CAST(value AS DOUBLE)), 4) AS med,
           round(quantile_cont(CAST(value AS DOUBLE), 0.75)
               - quantile_cont(CAST(value AS DOUBLE), 0.25), 4) AS iqr,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def udaf_applyinpandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "med": [round(float(v.median()), 4)],
                "iqr": [round(float(v.quantile(0.75) - v.quantile(0.25)), 4)],
                "n": [len(v)],
            }
        )

    return e.groupBy("event_type").applyInPandas(
        reduce_group, schema="event_type string, med double, iqr double, n bigint"
    )


# --------------------------------------------------------------------------
# mapInPandas as the map_fcn analog: batchwise generator, multi-emit
# allowed (here 1:1 token stats per doc).
@register(
    "udf_mapinpandas_tokens",
    tags=("udf", "pandas-udf", "text"),
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))  AS n_tokens,
           length(text)                  AS n_chars_actual
    FROM documents
    """,
)
def udf_mapinpandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": pdf["text"].str.split(" ").map(len),
                    "n_chars_actual": pdf["text"].str.len(),
                }
            )

    return d.mapInPandas(gen, schema="doc_id bigint, n_tokens int, n_chars_actual int")


# --------------------------------------------------------------------------
# Scalar pandas_udf: vectorized per-row math (Arrow batches, no
# per-row pickling).
@register(
    "udf_scalar_log_value",
    tags=("udf", "pandas-udf", "math"),
    oracle="""
    SELECT event_id, round(ln(1 + value), 6) AS log1p_value
    FROM events
    WHERE value >= 0
    """,
)
def udf_scalar_log_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log1p_round(v: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(v), 6))

    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("value") >= 0)
        .select("event_id", log1p_round("value").alias("log1p_value"))
    )


# --------------------------------------------------------------------------
# Python UDTF (Spark 4) as a registered, ORACLE-CHECKED query — the
# SQL-callable generator-map (reference map_fcn analog: 0..N rows per
# input row; reference mapreduce.py:16,36-38). The lateral join below
# is the declarative form of the shim's flatMap.
@register(
    "udtf_tokenize_lateral",
    tags=("udf", "udtf", "lateral"),
    oracle="""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS token,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
      WHERE doc_id < 50
    )
    SELECT doc_id, pos, token FROM t
    """,
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL-join a Python UDTF over documents (doc_id < 50): one
    output row per (doc, token position). UDTFs run row-at-a-time in
    Python workers — fine for genuine generator semantics on a BOUNDED
    slice (as here), but the 100 TB answer for plain tokenization is
    the codegen'd explode(split(...)) in text_zipf_head; this query
    exists to pin the UDTF surface itself against an oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class TokenizeRows:
        def eval(self, text: str):
            if not text:
                return
            for pos, token in enumerate(text.split(" ")):
                yield (pos, token)

    spark.udtf.register("tokenize_rows", TokenizeRows)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM _udtf_docs d, LATERAL tokenize_rows(d.text) t"
    )


# --------------------------------------------------------------------------
# Distributed covariance (Gram) matrix of the embedding space — the
# PCA/whitening prep step, and the demonstration of the einsum
# escape hatch SCALING.md §kernels reserves for hot numeric kernels:
# each Arrow batch contributes a 64×64 partial Gram via one
# np.einsum, so the shuffle carries (dims² + dims + 1) partial rows
# PER BATCH instead of n·dims² exploded products. The quadratic
# DuckDB oracle (posexplode self-join, ~n·dims² intermediate rows)
# replays the same sums, so the Python/Arrow path is hash-verified
# like every JVM path.
COV_DIM = 64


# Shared CTE chain ending in ``cells`` = the rounded upper-triangle
# covariance — used verbatim by the embedding_covariance oracle AND
# as the input matrix of the power-iteration oracle, so the two
# cannot drift.
_COV_CELLS_CTE = f"""
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
    ),
    x AS (
      SELECT vec_id, i, vec[i] AS xi
      FROM v, range(1, {COV_DIM + 1}) t(i)
    ),
    s AS (
      SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS sxy
      FROM x a JOIN x b USING (vec_id)
      WHERE a.i <= b.i
      GROUP BY a.i, b.i
    ),
    m AS (SELECT i, sum(xi) AS sx FROM x GROUP BY i),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    cells AS (
      SELECT CAST(s.i AS BIGINT) AS i, CAST(s.j AS BIGINT) AS j,
             round(s.sxy / n.n - (ma.sx / n.n) * (mb.sx / n.n) + 1e-9, 6) + 0.0
               AS cov
      FROM s
      JOIN m ma ON ma.i = s.i
      JOIN m mb ON mb.i = s.j
      CROSS JOIN n
    )"""


@register(
    "embedding_covariance",
    tags=("similarity", "covariance", "pca", "pandas-udf", "einsum"),
    oracle=f"WITH {_COV_CELLS_CTE}\nSELECT i, j, cov FROM cells",
)
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, cov) upper triangle (1-based dims, i <= j) of the
    population covariance of the embedding columns (see _cov_cells).

    Scale shape: mapInPandas folds EACH Arrow batch into one float64
    einsum Gram + dim sums + count, emitting ~dims² tiny partial rows
    per batch; the final groupBy(i, j) reduces partials across all
    batches (dims²·partitions rows total — independent of n), and the
    covariance closed form is evaluated on the aggregated frame with
    the same expression shape as the oracle. Summation-order ulp
    (numpy pairwise vs DuckDB sequential) is absorbed by the 6dp
    round WITH the +1e-9 pre-round bias — near-zero covariances of
    independent dims can land within fp noise of a rounding boundary
    (one did at sf0.01: gotcha #13 in the wild). The final ``+ 0.0``
    normalizes SIGNED ZERO: rounding a tiny negative yields -0.0 in
    Spark but 0.0 in DuckDB, numerically equal yet hash-different to
    the driver (a new oracle-pairing rule discovered by this op)."""
    import numpy as np

    d = load_table(spark, sf_dir, "embeddings").select("embedding")

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            g = np.einsum("ni,nj->ij", mat, mat)
            sx = mat.sum(axis=0)
            iu, ju = np.triu_indices(COV_DIM)
            out = pd.DataFrame(
                {
                    "i": (iu + 1).astype("int64"),
                    "j": (ju + 1).astype("int64"),
                    "sxy": g[iu, ju],
                    "kind": "g",
                }
            )
            sums = pd.DataFrame(
                {
                    "i": np.arange(1, COV_DIM + 1, dtype="int64"),
                    "j": np.zeros(COV_DIM, dtype="int64"),
                    "sxy": sx,
                    "kind": "s",
                }
            )
            cnt = pd.DataFrame(
                {"i": [0], "j": [0], "sxy": [float(len(mat))], "kind": "n"}
            )
            yield pd.concat([out, sums, cnt], ignore_index=True)

    partials = d.mapInPandas(gram, "i bigint, j bigint, sxy double, kind string")
    agg = partials.groupBy("i", "j", "kind").agg(F.sum("sxy").alias("sxy"))
    g = agg.filter(F.col("kind") == "g").select("i", "j", F.col("sxy").alias("sxy"))
    sx = agg.filter(F.col("kind") == "s").select(
        F.col("i").alias("mi"), F.col("sxy").alias("sx")
    )
    n = agg.filter(F.col("kind") == "n").select(F.col("sxy").cast("bigint").alias("n"))
    return (
        g.join(F.broadcast(sx), g.i == sx.mi)
        .drop("mi")
        .withColumnRenamed("sx", "sx_i")
        .join(
            F.broadcast(
                sx.select(F.col("mi").alias("mj"), F.col("sx").alias("sx_j"))
            ),
            F.col("j") == F.col("mj"),
        )
        .drop("mj")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (
                F.round(
                    F.col("sxy") / F.col("n")
                    - (F.col("sx_i") / F.col("n")) * (F.col("sx_j") / F.col("n"))
                    + F.lit(1e-9),
                    6,
                )
                + F.lit(0.0)  # -0.0 -> 0.0: engines disagree on signed zero
            ).alias("cov"),
        )
    )


def _cov_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounded upper-triangle covariance cells (i, j, cov) — the
    registered embedding_covariance builder, reused as the input
    matrix of embedding_power_iteration."""
    return embedding_covariance(spark, sf_dir)


PI_ITERS = 3


def _power_iteration_cte(iters: int, dim: int) -> str:
    """The WITH-parts of the unrolled power-iteration recurrence —
    shared by embedding_power_iteration's oracle and downstream
    consumers of the trained direction (embedding_pca_histogram)."""
    parts = [
        f"WITH {_COV_CELLS_CTE}",
        """full_m AS (
      SELECT i, j, cov FROM cells
      UNION ALL
      SELECT j AS i, i AS j, cov FROM cells WHERE i <> j
    )""",
        f"p0 AS (SELECT i AS j, 0.125 AS v FROM range(1, {dim + 1}) t(i))",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"w{k} AS (SELECT f.i, sum(f.cov * p{k - 1}.v) AS w"
            f" FROM full_m f JOIN p{k - 1} USING (j) GROUP BY f.i)"
        )
        parts.append(f"n{k} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{k})")
        parts.append(
            f"p{k} AS (SELECT i AS j, round(w / n{k}.nrm + 1e-9, 6) + 0.0 AS v"
            f" FROM w{k} CROSS JOIN n{k})"
        )
    return ",\n    ".join(parts)


def _power_iteration_oracle(iters: int, dim: int) -> str:
    return (
        _power_iteration_cte(iters, dim)
        + f"""
    SELECT CAST(p{iters}.j AS BIGINT) AS dim_i, p{iters}.v AS component,
           round(min(n{iters}.nrm) OVER () + 1e-9, 6) AS eigenvalue
    FROM p{iters} CROSS JOIN n{iters}
    """
    )


@register(
    "embedding_power_iteration",
    tags=("similarity", "pca", "iterative", "eigenvector", "pandas-udf"),
    oracle=_power_iteration_oracle(PI_ITERS, COV_DIM),
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dim_i, component, eigenvalue): the top principal direction of
    the embedding covariance after PI_ITERS power iterations from the
    deterministic uniform unit start (vᵢ = 1/8), with the final
    ‖Cv‖ as the eigenvalue estimate. ITERATIVE linear algebra,
    oracle-paired end-to-end: the covariance cells are the SAME
    rounded frame both engines verified in embedding_covariance, and
    each iteration re-rounds the normalized vector to 6dp (the
    k-means lockstep discipline), so the unrolled DuckDB CTE chain
    replays the whole recurrence.

    Scale shape: the corpus appears ONLY in the covariance build
    (einsum partial Gram, shuffle independent of n — see
    embedding_covariance); the matrix is eager-checkpointed once
    (loop-invariant, dims² rows), and each iteration is a dims²⋈dims
    broadcast join + one partial-aggregated matvec — cluster-trivial
    at any corpus size, and the same plan runs a dims=10⁴ matrix."""
    cells = _cov_cells(spark, sf_dir)
    full_m = cells.union(
        cells.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    ).localCheckpoint(eager=True)
    v = spark.range(1, COV_DIM + 1).select(
        F.col("id").alias("j"), F.lit(0.125).alias("v")
    )
    nrm_df = None
    for _ in range(PI_ITERS):
        w = (
            full_m.join(F.broadcast(v), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
        )
        nrm_df = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = (
            w.crossJoin(F.broadcast(nrm_df))
            .select(
                F.col("i").alias("j"),
                (F.round(F.col("w") / F.col("nrm") + F.lit(1e-9), 6) + F.lit(0.0)).alias("v"),
            )
        )
    return v.crossJoin(F.broadcast(nrm_df)).select(
        F.col("j").cast("bigint").alias("dim_i"),
        F.col("v").alias("component"),
        (F.round(F.col("nrm") + F.lit(1e-9), 6)).alias("eigenvalue"),
    )


# --------------------------------------------------------------------------
# PCA projection histogram: project every embedding onto the trained
# top principal direction and bucket the projections — the
# distribution view that tells you whether the leading component
# separates modes (bimodal -> cluster/split the corpus) or just
# captures scale (unimodal). Exactness: each projection term
# round(v_d * x_d * 1e12) is locked to an integer BEFORE the fold, so
# the per-vector dot product is an order-free bigint sum; bucketing
# runs entirely in integer units with a +OFFSET shift so truncating
# division behaves like floor across negative projections.
PCA_HIST_WIDTH_U = 50_000_000_000  # 0.05 in 1e-12 projection units
PCA_HIST_OFFSET_BUCKETS = 200  # shift covers |proj| <= 10


@register(
    "embedding_pca_histogram",
    tags=("similarity", "pca", "histogram", "pandas-udf"),
    oracle=_power_iteration_cte(PI_ITERS, COV_DIM)
    + f""",
    vx AS (
      SELECT e.vec_id,
             CAST(sum(CAST(round(p.v * CAST(e.embedding[p.j] AS DOUBLE) * 1e12)
                           AS BIGINT)) AS BIGINT) AS proj_u
      FROM embeddings e, p{PI_ITERS} p
      GROUP BY e.vec_id
    )
    SELECT (proj_u + {PCA_HIST_OFFSET_BUCKETS * PCA_HIST_WIDTH_U})
             // {PCA_HIST_WIDTH_U} - {PCA_HIST_OFFSET_BUCKETS} AS bucket,
           round(CAST((proj_u + {PCA_HIST_OFFSET_BUCKETS * PCA_HIST_WIDTH_U})
             // {PCA_HIST_WIDTH_U} - {PCA_HIST_OFFSET_BUCKETS} AS DOUBLE)
             * 0.05, 2) AS lo,
           CAST(count(*) AS BIGINT) AS n
    FROM vx
    GROUP BY 1, 2
    """,
)
def embedding_pca_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, lo, n): histogram of corpus projections onto the
    power-iteration principal direction, 0.05-wide buckets. Scale
    shape: the trained direction is a 64-row frame assembled into ONE
    array row and broadcast; the projection pass is a single NARROW
    scan (zip_with + integer fold per row — no explode, no per-vector
    shuffle) and the only shuffle is the bucket aggregation (bounded
    by distinct buckets, ~few hundred). The corpus is read twice —
    once inside the covariance einsum, once for projection — both
    single passes; at crawl scale the projection pass piggybacks on
    whatever next reads the corpus. The integer-unit fold keeps the
    dot product associative, so partial aggregation order never
    matters (same discipline as q9's money units)."""
    pi = embedding_power_iteration(spark, sf_dir)
    varr = pi.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim_i, component))),"
            " s -> s.component)"
        ).alias("varr")
    )
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    terms = F.zip_with(
        F.col("embedding"),
        F.col("varr"),
        lambda x, v: F.round(x.cast("double") * v * F.lit(1e12)).cast("long"),
    )
    proj = e.join(F.broadcast(varr)).select(
        "vec_id",
        F.aggregate(
            terms, F.lit(0).cast("long"), lambda acc, t: acc + t
        ).alias("proj_u"),
    )
    off = PCA_HIST_OFFSET_BUCKETS * PCA_HIST_WIDTH_U
    bucket = F.expr(
        f"(proj_u + {off}L) div {PCA_HIST_WIDTH_U}L - {PCA_HIST_OFFSET_BUCKETS}"
    ).alias("bucket")
    return (
        proj.select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "bucket",
            F.round(F.col("bucket") * F.lit(0.05), 2).alias("lo"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# Compression-ratio quality screen — the Gopher-family repetition
# signal done with a REAL codec: highly compressible text is
# boilerplate/template/repetition (the zlib-ratio filter used by
# production corpus-cleaning pipelines as a cheap, language-agnostic
# complement to token heuristics). ROWS-ONLY: DuckDB has no zlib, so
# no SQL oracle exists by nature — the pytest gate instead REPLAYS
# the exact computation in plain Python over the full corpus at two
# SFs (the sample_weighted_priority precedent) and pins the
# separation property on a planted repetitive fixture.
ZLIB_LEVEL = 6


@register(
    "text_compression_quality",
    oracle=None,
    tags=("text", "quality", "compression", "pandas-udf"),
)
def text_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, bytes_raw, bytes_comp, comp_ratio,
    min_doc_ratio, max_doc_ratio): per-language zlib-compressibility
    profile; comp_ratio = sum(comp)/sum(raw) — the byte-weighted
    corpus ratio. Determinism under partitioning: zlib at a fixed
    level is bit-deterministic per document, every aggregate input is
    an INTEGER byte count (sums are order-free), per-doc ratios are
    single integer-ratio divisions, and min/max are order-free — no
    float summation anywhere. Scale shape: one Arrow-batched scalar
    pandas_udf in the scan projection (the per-row cost IS the
    point — zlib at ~100 MB/s/core is the budget item, so it runs
    exactly once per doc in the same stage as tokenize-free column
    math), then a partial-aggregated groupBy on lang. The UDF is the
    legitimate §kernels escape hatch: no builtin expresses a codec."""
    import zlib

    @F.pandas_udf("long")
    def comp_len(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), ZLIB_LEVEL))
        )

    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.octet_length("text").cast("long").alias("raw"),
        comp_len("text").alias("comp"),
    )
    ratio = F.col("comp").cast("double") / F.col("raw")
    return (
        d.withColumn("r", F.round(ratio, 6))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("raw").cast("bigint").alias("bytes_raw"),
            F.sum("comp").cast("bigint").alias("bytes_comp"),
            F.min("r").alias("min_doc_ratio"),
            F.max("r").alias("max_doc_ratio"),
        )
        .select(
            "lang",
            "n_docs",
            "bytes_raw",
            "bytes_comp",
            F.round(
                F.col("bytes_comp").cast("double") / F.col("bytes_raw"), 6
            ).alias("comp_ratio"),
            "min_doc_ratio",
            "max_doc_ratio",
        )
    )
