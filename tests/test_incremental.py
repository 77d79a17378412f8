"""Round-7 operators: frozen-stats incremental unigram scoring and
gap-based sessionization. Both are oracle-paired in the registry; the
tests here pin the parts the oracle can't see — stats REUSE across
batches (the train/serve shape) and session-boundary invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ray_mapreduce_spark.plans.advanced import SESSION_GAP_US
from ray_mapreduce_spark.plans.registry import all_queries
from ray_mapreduce_spark.plans.text_analysis import (
    UNIGRAM_SPLIT_MOD,
    unigram_corpus_stats,
    unigram_score_batch,
)
from ray_mapreduce_spark.sources import load_table

_Q = all_queries()


def test_unigram_stats_frozen_and_reused(spark, sf_dir):
    """Stats computed ONCE (and materialized, as a stored stats table
    would be) must score any batch identically to the registered
    end-to-end plan — i.e. scoring never silently recomputes stats
    from a different corpus slice."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.pmod("doc_id", F.lit(UNIGRAM_SPLIT_MOD)) != 0)
    batch = d.filter(F.pmod("doc_id", F.lit(UNIGRAM_SPLIT_MOD)) == 0)

    terms, scalars = unigram_corpus_stats(corpus)
    # Materialize once — the production "write stats to parquet" step.
    terms = terms.localCheckpoint(eager=True)
    scalars = scalars.localCheckpoint(eager=True)

    expected = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["avg_logprob"])
        for r in _Q["text_unigram_incremental"].builder(spark, sf_dir).collect()
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["avg_logprob"])
        for r in unigram_score_batch(batch, terms, scalars).collect()
    }
    assert got == expected

    # Second batch against the SAME frozen stats: a disjoint slice of
    # the corpus itself — every token is in-vocabulary by construction.
    batch2 = corpus.limit(20)
    scored2 = unigram_score_batch(batch2, terms, scalars).collect()
    assert len(scored2) == 20
    assert all(r["n_oov"] == 0 for r in scored2)
    assert all(r["avg_logprob"] < 0 for r in scored2)


def test_unigram_oov_batch_scores_finite(spark):
    """A batch that shares NO vocabulary with the corpus still gets
    finite (smoothed) scores, with every token counted as OOV."""
    corpus = spark.createDataFrame(
        [(1, "aa bb cc aa"), (2, "bb cc dd")], "doc_id: long, text: string"
    )
    batch = spark.createDataFrame([(100, "xx yy zz")], "doc_id: long, text: string")
    terms, scalars = unigram_corpus_stats(corpus)
    [r] = unigram_score_batch(batch, terms, scalars).collect()
    assert r["n_tokens"] == 3
    assert r["n_oov"] == 3
    # add-one smoothing: p = 1 / (total + vocab + 1) = 1/12
    import math

    assert abs(r["avg_logprob"] - round(math.log(1 / 12.0), 4)) < 1e-9


def test_sessionize_boundary_invariants(spark, sf_dir):
    """Session output must PARTITION the event log: per-user session
    numbers contiguous from 1, event counts summing to the event
    total, spans ordered, and consecutive sessions separated by more
    than the gap (otherwise they'd be one session)."""
    rows = _Q["events_sessionize_gap"].builder(spark, sf_dir).collect()
    n_events_total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events_total

    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["session_no"])
        assert [r["session_no"] for r in sess] == list(range(1, len(sess) + 1))
        for r in sess:
            assert r["start_us"] <= r["end_us"]
        for prev, nxt in zip(sess, sess[1:]):
            assert nxt["start_us"] - prev["end_us"] > SESSION_GAP_US


def test_bm25_stats_frozen_and_reused(spark, sf_dir):
    """Same contract as the unigram test for the BM25 leg: stats
    materialized once must reproduce the registered end-to-end plan,
    and an external (partially-OOV) query set scores safely through
    the coalesce(df, 0) path."""
    from ray_mapreduce_spark.plans.text_analysis import (
        BM25_QUERY_DOCS,
        bm25_corpus_stats,
        bm25_score_batch,
    )

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.pmod("doc_id", F.lit(UNIGRAM_SPLIT_MOD)) != 0)
    batch = d.filter(F.pmod("doc_id", F.lit(UNIGRAM_SPLIT_MOD)) == 0)
    terms, scalars = bm25_corpus_stats(corpus)
    terms = terms.localCheckpoint(eager=True)
    scalars = scalars.localCheckpoint(eager=True)
    qterms = (
        corpus.filter(F.col("doc_id") < BM25_QUERY_DOCS + 1)
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .distinct()
    )

    expected = {
        r["doc_id"]: (r["n_match"], r["bm25"])
        for r in _Q["text_bm25_incremental"].builder(spark, sf_dir).collect()
    }
    got = {
        r["doc_id"]: (r["n_match"], r["bm25"])
        for r in bm25_score_batch(batch, terms, scalars, qterms).collect()
    }
    assert got == expected
    assert len(got) > 0

    # External query set with an OOV term: must not error (df -> 0)
    # and the OOV term contributes the MAX idf, never a negative/null.
    ext = spark.createDataFrame([("zzz_never_seen",)], "tok: string")
    first_tok = (
        batch.select(F.split(F.lower("text"), " ")[0].alias("tok")).first()["tok"]
    )
    ext = ext.union(spark.createDataFrame([(first_tok,)], "tok: string"))
    rows = bm25_score_batch(batch, terms, scalars, ext).collect()
    assert all(r["bm25"] is not None for r in rows)
