"""Connected components over near-duplicate pairs: the clustering
stage that turns a pair list (from minhash/simhash/cosine candidates)
into dedup groups with one canonical survivor each.

Algorithm: iterative min-label propagation (the "small-star" half of
large-star/small-star, sufficient because near-dup components are
shallow): every node starts labeled with itself; each round, every
node adopts the min label in its neighborhood; stop at fixpoint.
Rounds needed = graph diameter (near-dup clusters are cliques-ish,
so 2-3 rounds in practice; ``max_iters`` bounds pathological chains).

Scale shape per round: one join (edges x labels, shuffle on node id)
+ one groupBy min — both algebraic, both skew-tolerant under AQE. No
driver-side state beyond the converged flag (one count per round —
the same pattern GraphX/GraphFrames use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b", max_iters: int = 10
) -> DataFrame:
    """(src, dst) undirected pair list -> (node, component) with
    component = min node id reachable. Deterministic."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        # materialize ONCE: every iteration joins against edges, and
        # without this the whole upstream pair-generation lineage
        # (e.g. the full minhash LSH pipeline) re-executes per round
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("u").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    for _ in range(max_iters):
        # neighbor labels: for each node, min label over {self} U neighbors
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("ncomp"))
            .withColumnRenamed("u", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias("comp"),
            )
        )
        # converged when no label changed
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        # localCheckpoint truncates the growing lineage each round —
        # without it, plan size doubles per iteration
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels


def dedup_cluster_survivors(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Full cluster-dedup: docs + near-dup pairs -> every doc mapped to
    its cluster and a keep/drop flag (survivor = min doc_id per
    cluster; singletons survive trivially)."""
    comps = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comps, docs.doc_id == comps.node, "left")
        .select(
            "doc_id",
            F.coalesce("comp", F.col("doc_id")).alias("cluster"),
        )
        .withColumn(
            "is_survivor",
            F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("cluster")),
        )
    )
