"""Graph-operator gates: the near-dup-graph analytics must match a
driver-side replay of the same integer arithmetic on planted graphs
(the sf0.001 similarity graph is triangle-free, so the production
queries alone would leave the wedge-closure path unexercised).
"""

from __future__ import annotations

from ray_mapreduce_spark.plans.graph import (
    PR_ITERS,
    PR_SCALE,
    pagerank_from_edges,
    triangle_counts,
)


def _frames(spark, n_nodes, pairs):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "vec_id: long")
    prs = spark.createDataFrame(pairs, "src: long, dst: long").localCheckpoint(
        eager=True
    )
    return nodes, prs


def _replay_pagerank(n_nodes, pairs, iters):
    """Pure-python replay of the documented fixed-point recurrence."""
    deg: dict[int, int] = {}
    adj = []
    for s, d in pairs:
        adj += [(s, d), (d, s)]
    for s, _ in adj:
        deg[s] = deg.get(s, 0) + 1
    r = {i: PR_SCALE // n_nodes for i in range(n_nodes)}
    for _ in range(iters):
        s = {i: 0 for i in range(n_nodes)}
        for u, vdst in adj:
            s[vdst] += r[u] // deg[u]
        base = (15 * (PR_SCALE // n_nodes)) // 100
        r = {i: base + (85 * s[i]) // 100 for i in range(n_nodes)}
    return {i: (deg.get(i, 0), round(r[i] / float(PR_SCALE), 6)) for i in range(n_nodes)}


def test_triangle_count_planted(spark):
    """Triangle {0,1,2} + chord 2-3 + isolated 4: exactly the three
    triangle members count 1; two overlapping triangles sharing edge
    (5,6) each count node 5 and 6 twice."""
    pairs = [(0, 1), (0, 2), (1, 2), (2, 3), (5, 6), (5, 7), (6, 7), (5, 8), (6, 8)]
    nodes, prs = _frames(spark, 9, pairs)
    got = {r["vec_id"]: r["n_triangles"] for r in triangle_counts(nodes, prs).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 2, 6: 2, 7: 1, 8: 1}


def test_pagerank_matches_integer_replay(spark):
    """Star (hub 0 with leaves 1-3) + pair (4,5) + isolated 6: the
    Spark result must EXACTLY equal the python replay of the integer
    recurrence — no tolerance — and the hub must outrank every leaf."""
    pairs = [(0, 1), (0, 2), (0, 3), (4, 5)]
    nodes, prs = _frames(spark, 7, pairs)
    got = {
        r["vec_id"]: (r["degree"], r["pagerank"])
        for r in pagerank_from_edges(nodes, prs, iters=PR_ITERS).collect()
    }
    assert got == _replay_pagerank(7, pairs, PR_ITERS)
    assert got[0][1] > max(got[i][1] for i in (1, 2, 3))
    # isolated node holds exactly the teleport mass
    n = 7
    assert got[6][1] == round(
        ((15 * (PR_SCALE // n)) // 100) / float(PR_SCALE), 6
    )


def test_adamic_adar_planted(spark):
    """C4 cycle 0-1-2-3: the two diagonals are the only non-adjacent
    wedge pairs, each with BOTH opposite corners as common neighbors
    (degree 2), so score = 2/ln(2); add pendant 4 off node 0 to vary
    a degree: (1,4) and (3,4) share mid 0 (degree 3) -> 1/ln(3),
    and (2,4)'s mids are none (distance 3) so it must be absent."""
    import math

    from ray_mapreduce_spark.plans.graph import adamic_adar_from_edges

    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 4)]
    prs = spark.createDataFrame(pairs, "src: long, dst: long").localCheckpoint(
        eager=True
    )
    got = {
        (r["u"], r["w"]): (r["n_common"], r["aa_score"])
        for r in adamic_adar_from_edges(prs).collect()
    }
    ln2, ln3 = math.log(2.0), math.log(3.0)
    assert got == {
        (0, 2): (2, round(1 / ln2 + 1 / ln2, 6)),
        (1, 3): (2, round(1 / ln3 + 1 / ln2, 6)),
        (1, 4): (1, round(1 / ln3, 6)),
        (3, 4): (1, round(1 / ln3, 6)),
    }
