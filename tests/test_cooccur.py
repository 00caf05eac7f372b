"""Co-occurrence analytics: pair counts, lift, triangle counting
(operators/cooccur.py) and Gopher repetition stats
(textstats.repetition_stats)."""

from __future__ import annotations

from graphiti_spark.operators.cooccur import (
    cooccurrence_pairs,
    lift_scores,
    triangle_count,
)
from graphiti_spark.operators.textstats import repetition_stats


def _gi(spark, rows):
    return spark.createDataFrame(rows, "g long, i long")


def test_cooccurrence_pairs_counts_distinct_groups(spark):
    # g1={1,2,3}, g2={1,2}, g3={2,3} (dup item collapses), g4={4}
    df = _gi(
        spark,
        [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 2), (3, 3), (3, 3),
         (4, 4)],
    )
    got = {(r.a, r.b): r.c_ab for r in cooccurrence_pairs(df, "g", "i").collect()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 2}


def test_cooccurrence_cap_keeps_smallest_items(spark):
    df = _gi(spark, [(1, 3), (1, 1), (1, 2)])
    got = {(r.a, r.b) for r in
           cooccurrence_pairs(df, "g", "i", max_per_group=2).collect()}
    assert got == {(1, 2)}  # deterministic: {1,2} survive, 3 truncated


def test_lift_values_exact(spark):
    df = _gi(
        spark,
        [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 2), (3, 3), (4, 4)],
    )
    got = {(r.a, r.b): r for r in
           lift_scores(df, "g", "i", min_count=2).collect()}
    # N=4; (1,2): c_ab=2, c_1=2, c_2=3 -> 8/6
    assert got[(1, 2)].lift == (2 * 4) / (2 * 3)
    assert got[(2, 3)].lift == (2 * 4) / (3 * 2)
    assert set(got) == {(1, 2), (2, 3)}


def _edges(spark, rows):
    return spark.createDataFrame(rows, "a long, b long")


def test_triangle_count_basic(spark):
    # triangle {1,2,3} + pendant 3-4; duplicate/reversed edges collapse
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (2, 1), (2, 2)])
    got = {r.id: r.n_triangles for r in triangle_count(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_shared_edge(spark):
    # {1,2,3} and {1,2,4} share edge 1-2
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4)])
    got = {r.id: r.n_triangles for r in triangle_count(e).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_count_star_has_none(spark):
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    assert triangle_count(e).count() == 0


def test_triangle_count_matches_naive_on_clique(spark):
    # K5: C(5,3)=10 triangles, each node on C(4,2)=6
    e = _edges(
        spark, [(a, b) for a in range(5) for b in range(a + 1, 5)]
    )
    got = {r.id: r.n_triangles for r in triangle_count(e).collect()}
    assert got == {i: 6 for i in range(5)}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_lines_and_grams(spark):
    docs = _docs(
        spark,
        [
            (1, "aa bb\naa bb\ncc"),
            (2, "x y x y x y"),
            (3, ""),
            (4, "unique words only here now"),
        ],
    )
    got = {r.id: r for r in repetition_stats(docs).collect()}
    assert got[1].dup_line_frac == 0.3333  # 1 dup of 3 lines
    assert got[1].dup_line_char_frac == 0.4167  # 5 of 12 line chars
    # 'x y' x3 over 'x y x y x y' (11 chars): 9/11
    assert got[2].top2_char_frac == 0.8182
    # overlapping occurrences cap at 1.0: 'x y x y' x2 = 14 chars > 11
    assert got[2].top4_char_frac == 1.0
    assert got[3] == got[3].__class__(
        id=3, dup_line_frac=0.0, dup_line_char_frac=0.0,
        top2_char_frac=0.0, top3_char_frac=0.0, top4_char_frac=0.0,
    )
    # all grams unique -> tie resolves to lexicographically smallest
    # 3-gram 'only here now' (13 chars of 26)
    assert got[4].top3_char_frac == 0.5


def test_k_core_peels_transitively(spark):
    from graphiti_spark.operators.cooccur import cooccurrence_pairs  # noqa: F401
    from graphiti_spark.operators.centrality import k_core

    # triangle {1,2,3} + tail 3-4: 2-core is exactly the triangle
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r.id: r.core_deg for r in k_core(e, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}

    # K4 minus one edge: removing the two degree-2 nodes cascades the
    # whole graph away — 3-core is empty (peeling must be transitive)
    e2 = _edges(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]  # no (3,4)
    )
    assert k_core(e2, 3).count() == 0

    # full K4: every node stays at degree 3
    e3 = _edges(
        spark,
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
    )
    got3 = {r.id: r.core_deg for r in k_core(e3, 3).collect()}
    assert got3 == {1: 3, 2: 3, 3: 3, 4: 3}


def test_k_core_surfaces_capped_peeling(spark):
    """A peeling chain longer than max_rounds must not be silent
    (VERDICT r03 wrong #2): the sink reports converged=False and
    require_converged raises; with enough rounds the same graph
    converges (to empty) and the sink reports True."""
    import pytest

    from graphiti_spark.operators.centrality import k_core

    # a 24-node path: k=2 peels one endpoint pair per round -> needs
    # ~12 rounds, so max_rounds=8 binds mid-peel
    path = _edges(spark, [(i, i + 1) for i in range(1, 24)])

    sink: list = []
    capped = k_core(path, 2, max_rounds=8, converged_sink=sink)
    assert sink == [False]
    assert capped.count() > 0  # superset of the true (empty) 2-core

    with pytest.raises(ValueError, match="did not converge"):
        k_core(path, 2, max_rounds=8, require_converged=True)

    sink2: list = []
    full = k_core(path, 2, max_rounds=16, converged_sink=sink2,
                  require_converged=True)
    assert sink2 == [True]
    assert full.count() == 0  # a path has no 2-core

    # early-convergence path: the sink costs no extra adjudication and
    # reports True (triangle is its own 2-core)
    sink3: list = []
    tri = k_core(_edges(spark, [(1, 2), (2, 3), (1, 3)]), 2,
                 converged_sink=sink3)
    assert {r.id for r in tri.collect()} == {1, 2, 3}
    assert sink3 == [True]


def test_local_clustering_hand_computed(spark):
    """Triangle {1,2,3} plus pendant 4–1: lcc(1)=1/3 (one of its three
    neighbor pairs connected), lcc(2)=lcc(3)=1.0, lcc(4)=0 (deg<2).
    Duplicate/reversed edges collapse first."""
    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.operators.cooccur import local_clustering

    edges = literal_df(
        spark,
        [(1, 2), (2, 3), (3, 1), (1, 4), (2, 1), (4, 1)],
        [("a", "bigint"), ("b", "bigint")],
    )
    got = {
        r["id"]: (r["degree"], r["n_triangles"], r["lcc"])
        for r in local_clustering(edges).collect()
    }
    assert got == {
        1: (3, 1, 0.3333),
        2: (2, 1, 1.0),
        3: (2, 1, 1.0),
        4: (1, 0, 0.0),
    }
