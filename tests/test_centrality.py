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


def test_hits_star_hand_computed(spark):
    """Star 1->3, 2->3, 3->4: after any full iteration the L1-normalized
    fixpoint is reached on this graph — authorities split SCALE between
    3 and 4 as 2:1, hubs as 1:1:... hand-derive one iteration exactly."""
    from graphiti_spark.operators.centrality import hits

    ed = _edges(spark, [(1, 3), (2, 3), (3, 4)])
    got = {
        r.id: (r.hub_u, r.auth_u) for r in hits(ed, iters=1).collect()
    }
    # h0 = SCALE//4 each. a_raw(3) = h0(1)+h0(2) = 2u, a_raw(4) = u
    # -> a(3) = (S*2u)//(3u), a(4) = (S*u)//(3u)
    u = SCALE // 4
    a3 = (SCALE * 2 * u) // (3 * u)
    a4 = (SCALE * u) // (3 * u)
    # h_raw(1) = h_raw(2) = a(3), h_raw(3) = a(4)
    tot_h = 2 * a3 + a4
    h1 = (SCALE * a3) // tot_h
    h3 = (SCALE * a4) // tot_h
    assert got == {
        1: (h1, 0),
        2: (h1, 0),
        3: (h3, a3),
        4: (0, a4),
    }
    # L1 mass of each score family stays ~SCALE (floor leakage only)
    assert SCALE - 4 <= sum(h for h, _ in got.values()) <= SCALE
    assert SCALE - 4 <= sum(a for _, a in got.values()) <= SCALE
    with pytest.raises(ValueError):
        hits(ed, iters=0)


def test_degree_stats_full_outer(spark):
    ed = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 3)])
    got = {r.id: (r.out_deg, r.in_deg) for r in degree_stats(ed).collect()}
    assert got == {1: (2, 0), 2: (1, 1), 3: (1, 3)}
