"""Adversarial ANN gates (VERDICT r6 #4): the driver's synthetic
embeddings are near-uniform, which flatters LSH/IVF. This fixture is
the hostile case — clustered vectors (10 tight clusters, so buckets
and cells fill unevenly) plus near-duplicate twins (the pairs a dedup
run MUST find). Thresholds are pinned from measured behavior and
documented in SCALING.md §LSH; two sizes mirror the two-SF evidence
rule for rows-only queries.

Measured r7 (seed 42): IVF recall@5 0.62/0.86 (n=400/4000), sign-LSH
topk recall@5 0.74/0.82, max bucket fraction 0.265/0.32, twin-pair
recall via dedup_embedding_lsh 1.0/1.0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from ray_mapreduce_spark.plans.registry import all_queries
from ray_mapreduce_spark.plans.similarity import TOP_K, _banded_vectors, _with_vec

_Q = all_queries()

_N_CLUSTERS = 10
_DIM = 64
_DUP_FRAC = 0.15
_NOISE = 0.15


def _make_corpus(rng: np.random.Generator, n: int):
    """Clustered corpus + twins; returns (vectors, labels, twin_pairs)
    with vec_ids shuffled so the query set (vec_id < 10) spans
    clusters."""
    centers = rng.normal(size=(_N_CLUSTERS, _DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = n - int(n * _DUP_FRAC)
    cl = rng.integers(0, _N_CLUSTERS, size=base)
    vecs = centers[cl] + _NOISE * rng.normal(size=(base, _DIM))
    twins_of = rng.integers(0, base, size=n - base)
    twins = vecs[twins_of] + 0.01 * rng.normal(size=(n - base, _DIM))
    all_v = np.vstack([vecs, twins]).astype(np.float32)
    labels = np.concatenate([cl, cl[twins_of]]).astype(np.int32)
    perm = rng.permutation(n)
    inv = np.empty(n, dtype=int)
    inv[perm] = np.arange(n)
    twin_pairs = {
        (min(inv[twins_of[j]], inv[base + j]), max(inv[twins_of[j]], inv[base + j]))
        for j in range(n - base)
    }
    return all_v[perm], labels[perm], twin_pairs


@pytest.fixture(scope="module", params=[400, 4000], ids=["n400", "n4000"])
def ann_fixture(request, tmp_path_factory):
    """One synthetic sf-dir per corpus size, with exact ground truth."""
    n = request.param
    rng = np.random.default_rng(42)
    vecs, labels, twin_pairs = _make_corpus(rng, n)
    path = tmp_path_factory.mktemp(f"annfix{n}")
    pd.DataFrame(
        {"vec_id": np.arange(n), "embedding": list(vecs), "label": labels}
    ).to_parquet(path / "embeddings.parquet", index=False)

    v = vecs.astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = vn[:10] @ vn.T
    true_topk = {}
    for q in range(10):
        s = sims[q].copy()
        s[q] = -2.0
        true_topk[q] = set(np.argsort(-s)[:TOP_K])
    return {"n": n, "path": str(path), "true_topk": true_topk, "twin_pairs": twin_pairs}


def _topk_recall(rows, true_topk) -> float:
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return float(
        np.mean([len(got.get(q, set()) & tk) / len(tk) for q, tk in true_topk.items()])
    )


# Pinned ~10% below measured so seed-stable runs never flap but a real
# geometry regression (plane seeding, probe count, cap interplay) trips.
_IVF_MIN = {400: 0.55, 4000: 0.80}
_LSH_MIN = {400: 0.65, 4000: 0.75}


def test_ivf_recall_on_clustered_corpus(spark, ann_fixture):
    rows = _Q["similarity_topk_ivf"].builder(spark, ann_fixture["path"]).collect()
    rec = _topk_recall(rows, ann_fixture["true_topk"])
    assert rec >= _IVF_MIN[ann_fixture["n"]], rec


def test_lsh_topk_recall_on_clustered_corpus(spark, ann_fixture):
    rows = _Q["similarity_topk_lsh"].builder(spark, ann_fixture["path"]).collect()
    rec = _topk_recall(rows, ann_fixture["true_topk"])
    assert rec >= _LSH_MIN[ann_fixture["n"]], rec


def test_lsh_bucket_balance_on_clustered_corpus(spark, ann_fixture):
    """Clustered data is the worst case for sign-LSH bucket balance —
    whole clusters can land in one bucket. Pin that the 8x4-bit table
    family still splits the corpus: no (table, bucket) holds more
    than 40% of vectors (measured 0.27-0.32)."""
    v = _with_vec(spark.read.parquet(ann_fixture["path"] + "/embeddings.parquet"))
    counts = _banded_vectors(v).groupBy("table_no", "bucket").count()
    mx = counts.agg(F.max("count").alias("mx")).first().mx
    assert mx / ann_fixture["n"] <= 0.40, mx / ann_fixture["n"]


def test_embedding_lsh_finds_near_duplicate_twins(spark, ann_fixture):
    """Every planted near-duplicate twin (cosine ~0.999) must be
    recovered by the multi-table LSH near-dup plan even though twins
    sit inside dense clusters where the bucket cap bites (measured
    recall 1.0 at both sizes; pinned at 0.95)."""
    rows = _Q["dedup_embedding_lsh"].builder(spark, ann_fixture["path"]).collect()
    found = {(r["id_a"], r["id_b"]) for r in rows}
    tp = ann_fixture["twin_pairs"]
    rec = len(tp & found) / len(tp)
    assert rec >= 0.95, rec


def test_ivf_kmeans_recall_on_clustered_corpus(spark, ann_fixture):
    """Lloyd-trained cells align with the clusters seed-sampling
    misses: measured recall 1.0 at BOTH sizes (vs 0.62/0.86 for
    seed-IVF); pinned at 0.90."""
    rows = _Q["similarity_topk_ivf_kmeans"].builder(spark, ann_fixture["path"]).collect()
    rec = _topk_recall(rows, ann_fixture["true_topk"])
    assert rec >= 0.90, rec


def test_pq_adc_recall_on_clustered_corpus(spark, ann_fixture):
    """PQ ADC is an L2 quantizer, so its gate uses exact L2 ground
    truth (the cosine truth above would conflate metric mismatch with
    quantization loss). PQ_M=4 x PQ_K=4 gives 256 cells over 10 true
    clusters — coarse, but cluster structure should keep most true
    neighbors within the query's cell pattern. Threshold pinned
    ~10% below measured (see SCALING.md §LSH gates)."""
    import pandas as pd

    emb = pd.read_parquet(ann_fixture["path"] + "/embeddings.parquet")
    v = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(emb["vec_id"].to_numpy())
    v = v[order]
    true_l2 = {}
    for q in range(10):
        d = ((v - v[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        true_l2[q] = set(np.argsort(d)[:TOP_K])
    rows = _Q["similarity_pq_adc_topk"].builder(spark, ann_fixture["path"]).collect()
    rec = _topk_recall(rows, true_l2)
    print(f"PQ ADC recall@{TOP_K} n={ann_fixture['n']}: {rec:.3f}")
    assert rec >= _PQ_MIN[ann_fixture["n"]], rec


# Measured r7 (seed 42): 0.52/0.24 — the honest pure-ADC floor with an
# 8x16 codebook on clustered data (quantization error ~ within-cluster
# noise). Pinned ~10% below; the serving-quality number is the rerank
# gate below, matching how PQ is actually deployed.
_PQ_MIN = {400: 0.45, 4000: 0.20}


def test_pq_rerank_recall_on_clustered_corpus(spark, ann_fixture):
    """The shortlist+exact-rerank shape recovers what pure ADC loses:
    measure recall@5 vs exact L2 truth."""
    import pandas as pd

    emb = pd.read_parquet(ann_fixture["path"] + "/embeddings.parquet")
    v = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(emb["vec_id"].to_numpy())
    v = v[order]
    true_l2 = {}
    for q in range(10):
        d = ((v - v[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        true_l2[q] = set(np.argsort(d)[:TOP_K])
    rows = _Q["similarity_pq_rerank_topk"].builder(spark, ann_fixture["path"]).collect()
    rec = _topk_recall(rows, true_l2)
    print(f"PQ rerank recall@{TOP_K} n={ann_fixture['n']}: {rec:.3f}")
    assert rec >= _PQ_RERANK_MIN[ann_fixture["n"]], rec


# Measured r7 (seed 42): 1.00/0.78 at PQ_SHORTLIST=100 (0.68 at 50 —
# shortlist depth, not codebook quality, is the n=4000 limiter).
_PQ_RERANK_MIN = {400: 0.90, 4000: 0.70}


def test_ivfpq_composed_recall_on_clustered_corpus(spark, ann_fixture):
    """The composed IVF->ADC->rerank pipeline must match the plain
    PQ-rerank serving quality — on clustered data the IVF candidate
    bound costs nothing (trained cells capture the clusters), so any
    drop below the rerank gate means the cell restriction is broken.
    Measured r9 (seed 42): 1.00/0.78 — identical to PQ rerank
    (shortlist depth is the limiter, not the IVF bound); pinned ~10%
    below."""
    import pandas as pd

    emb = pd.read_parquet(ann_fixture["path"] + "/embeddings.parquet")
    v = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    order = np.argsort(emb["vec_id"].to_numpy())
    v = v[order]
    true_l2 = {}
    for q in range(10):
        d = ((v - v[q]) ** 2).sum(axis=1)
        d[q] = np.inf
        true_l2[q] = set(np.argsort(d)[:TOP_K])
    rows = _Q["similarity_topk_ivfpq"].builder(spark, ann_fixture["path"]).collect()
    rec = _topk_recall(rows, true_l2)
    print(f"IVFPQ recall@{TOP_K} n={ann_fixture['n']}: {rec:.3f}")
    assert rec >= _IVFPQ_MIN[ann_fixture["n"]], rec


_IVFPQ_MIN = {400: 0.90, 4000: 0.70}
