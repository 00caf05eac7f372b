"""Fixed-point PageRank and degree stats (operators/centrality.py)."""

from __future__ import annotations

import pytest

from graphiti_spark.operators.centrality import (
    SCALE,
    degree_stats,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_triangle_is_stationary(spark):
    """On a 3-cycle the uniform distribution is the exact fixpoint even
    in integer arithmetic: rank_u = SCALE div 3 every iteration
    (base 0.05 + 0.85 * 1/3 == 1/3 holds exactly in these units)."""
    ed = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    got = {r.id: r.rank_u for r in pagerank(ed, iters=5).collect()}
    assert got == {1: SCALE // 3, 2: SCALE // 3, 3: SCALE // 3}


def test_pagerank_star_one_iteration_hand_computed(spark):
    """a->c, b->c after one iteration: a and b keep only the base
    0.15/3; c gets base + 0.85 * (r0(a) + r0(b)) — all floor-divided."""
    ed = _edges(spark, [(1, 3), (2, 3)])
    r0 = SCALE // 3
    base = (15 * SCALE) // (100 * 3)
    got = {r.id: r.rank_u for r in pagerank(ed, iters=1).collect()}
    assert got[1] == base and got[2] == base
    assert got[3] == base + (85 * (r0 + r0)) // 100
    # dangling c dropped its mass: total strictly below SCALE
    assert sum(got.values()) < SCALE


def test_pagerank_total_mass_bounded_and_multigraph_weighting(spark):
    # parallel edges weight the contribution: a sends 2/3 to b, 1/3 to c
    ed = _edges(spark, [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)])
    got = {r.id: r.rank_u for r in pagerank(ed, iters=5).collect()}
    assert sum(got.values()) <= SCALE
    assert got[2] > got[3]  # double edge -> double share
    ranks = {r.id: r.rank for r in pagerank(ed, iters=5).collect()}
    assert ranks[1] == pytest.approx(got[1] / SCALE)
    with pytest.raises(ValueError):
        pagerank(ed, iters=0)


def test_ppr_one_iteration_hand_computed(spark):
    """S = {1} on 1->2, 2->3: after one iteration node 1 keeps only
    the base 0.15/|S|, node 2 gets 0.85 * r0(1), node 3 gets zero
    (r0(2) = 0 contributed nothing) — all floor-divided."""
    from graphiti_spark.operators.centrality import personalized_pagerank

    ed = _edges(spark, [(1, 2), (2, 3)])
    srcs = spark.createDataFrame([(1,)], "id long")
    got = {
        r.id: r.rank_u
        for r in personalized_pagerank(ed, srcs, iters=1).collect()
    }
    base = (15 * SCALE) // 100  # |S| = 1
    assert got == {
        1: base,
        2: (85 * SCALE) // 100,
        3: 0,
    }


def test_ppr_mass_confined_to_reachable_set(spark):
    """Two disconnected components; restart on component A only —
    component B must stay at exactly zero every iteration, and A's
    total mass stays <= SCALE."""
    from graphiti_spark.operators.centrality import personalized_pagerank

    ed = _edges(spark, [(1, 2), (2, 1), (10, 11), (11, 10)])
    srcs = spark.createDataFrame([(1,), (2,)], "id long")
    got = {
        r.id: r.rank_u
        for r in personalized_pagerank(ed, srcs, iters=4).collect()
    }
    assert got[10] == 0 and got[11] == 0
    assert got[1] > 0 and got[2] > 0
    assert sum(got.values()) <= SCALE
    with pytest.raises(ValueError):
        personalized_pagerank(ed, srcs, iters=0)


def test_degree_stats_full_outer(spark):
    ed = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 3)])
    got = {r.id: (r.out_deg, r.in_deg) for r in degree_stats(ed).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (1, 3)}
