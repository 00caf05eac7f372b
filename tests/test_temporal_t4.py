"""T4→T1 candidate-driven invalidation: the reference truth table
(edge_operations.py:406-441; FIXTURES.md §5) on handcrafted fixtures,
including the interval-disjointness guard the sf-corpus oracle can't
exercise (merged edges start with null invalid_at)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from graphiti_spark.operators.temporal import invalidate_by_candidates

RUN_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _ts(day):
    return datetime(2024, 1, day, tzinfo=timezone.utc) if day else None


def _edges(spark, rows):
    """rows: (uuid, valid_day, invalid_day)"""
    return spark.createDataFrame(
        [(u, _ts(v), _ts(i), None) for (u, v, i) in rows],
        "uuid string, valid_at timestamp, invalid_at timestamp, "
        "expired_at timestamp",
    )


def _cands(spark, pairs):
    return spark.createDataFrame(
        [(n, c) for (n, c) in pairs], "new_uuid string, candidate_uuid string"
    )


def test_truth_table(spark):
    edges = _edges(
        spark,
        [
            ("e_open", 1, None),    # open, earlier than n → closed at n.valid
            ("e_disjoint", 1, 3),   # invalid_at(3) ≤ n.valid(5) → skipped
            ("e_overlap", 1, 9),    # overlapping (9 > 5) → reference
                                    # OVERWRITES invalid_at to n.valid(5)
            ("e_later", 8, None),   # valid AFTER n → not closed by n
            ("n", 5, None),
        ],
    )
    cands = _cands(
        spark,
        [("n", "e_open"), ("n", "e_disjoint"), ("n", "e_overlap"),
         ("n", "e_later"), ("e_later", "n")],
    )
    out = {r.uuid: r for r in
           invalidate_by_candidates(edges, cands, RUN_TS).collect()}
    assert out["e_open"].invalid_at == _ts(5).replace(tzinfo=None)
    assert out["e_open"].expired_at is not None          # T3
    assert out["e_disjoint"].invalid_at == _ts(3).replace(tzinfo=None)  # guard
    assert out["e_disjoint"].expired_at is not None      # already-closed → T3
    assert out["e_overlap"].invalid_at == _ts(5).replace(tzinfo=None)
    assert out["e_later"].invalid_at is None             # nothing later
    # n itself is closed by e_later (valid 8 > 5) via the reverse pair
    assert out["n"].invalid_at == _ts(8).replace(tzinfo=None)


def test_earliest_closer_wins(spark):
    edges = _edges(spark, [("e", 1, None), ("n1", 7, None), ("n2", 4, None)])
    cands = _cands(spark, [("n1", "e"), ("n2", "e")])
    out = {r.uuid: r for r in
           invalidate_by_candidates(edges, cands, RUN_TS).collect()}
    assert out["e"].invalid_at == _ts(4).replace(tzinfo=None)


def _full_edges(spark, rows):
    """rows: (uuid, src, dst, valid_day) — merged-edge shape (open
    intervals, null embeddings: the min_score=None path)."""
    return spark.createDataFrame(
        [(u, "g", s, d, "R", f"f{u}", None, _ts(v)) for (u, s, d, v) in rows],
        "uuid string, group_id string, source_node_uuid string, "
        "target_node_uuid string, name string, fact string, "
        "fact_embedding array<float>, valid_at timestamp",
    )


# a dense endpoint-sharing mesh incl. a hub (h on most edges), distinct
# and TIED valid_at instants, a self-loop, and an isolated edge
_MESH = [
    ("a1", "h", "x", 1), ("a2", "h", "y", 2), ("a3", "h", "x", 2),
    ("a4", "z", "h", 4), ("a5", "x", "y", 3), ("a6", "y", "z", 1),
    ("a7", "h", "h", 5), ("a8", "q", "q2", 9),
]


def test_cross_predicate_skyline_equals_pair_form(spark):
    """invalidate_cross_predicate (O(E) endpoint skyline) must produce
    EXACTLY the pair-join semantics it replaces on the default DAG."""
    from graphiti_spark.operators.edge_dedup import invalidation_candidates
    from graphiti_spark.operators.temporal import invalidate_cross_predicate

    edges = _full_edges(spark, _MESH)
    cands = invalidation_candidates(
        edges, edges, min_score=None,
        per_edge_limit=10**6, per_endpoint_limit=None,  # exact pair form
    )
    want = {r.uuid: (r.invalid_at, r.expired_at is not None) for r in
            invalidate_by_candidates(edges, cands, RUN_TS).collect()}
    got = {r.uuid: (r.invalid_at, r.expired_at is not None) for r in
           invalidate_cross_predicate(edges, RUN_TS).collect()}
    assert got == want
    # spot semantics: hub edge at day 1 closes at next hub instant (2);
    # tied instants don't close each other; isolated edge stays open
    assert got["a1"][0] == _ts(2).replace(tzinfo=None)
    assert got["a2"][0] == _ts(3).replace(tzinfo=None)  # via y (a5, day 3)
    assert got["a8"][0] is None


def test_cross_predicate_subsumes_predicate_window(spark):
    """The either-endpoint skyline subsumes the same-(group, subject,
    predicate) window: composing after invalidate_edges equals running
    invalidate_cross_predicate directly (the pipeline relies on this)."""
    from graphiti_spark.operators.temporal import (
        invalidate_cross_predicate,
        invalidate_edges,
    )

    edges = _full_edges(spark, _MESH)
    direct = {r.uuid: (r.invalid_at, r.expired_at) for r in
              invalidate_cross_predicate(edges, RUN_TS).collect()}
    composed = {r.uuid: (r.invalid_at, r.expired_at) for r in
                invalidate_cross_predicate(
                    invalidate_edges(edges, RUN_TS), RUN_TS
                ).collect()}
    assert direct == composed


def test_invalidation_candidates_bounded_on_hub(spark):
    """One hub endpoint on ~30% of edges: the default caps keep the
    candidate output ≤ |new| × per_edge_limit instead of O(d²)."""
    from graphiti_spark.config import RELEVANT_SCHEMA_LIMIT
    from graphiti_spark.operators.edge_dedup import invalidation_candidates

    n = 300
    rows = [
        (f"u{i}", "hub" if i % 3 == 0 else f"s{i}", f"t{i}", (i % 20) + 1)
        for i in range(n)
    ]
    edges = _full_edges(spark, rows)
    out = invalidation_candidates(edges, edges, min_score=None)
    cnt = out.count()
    assert cnt <= n * RELEVANT_SCHEMA_LIMIT
    per_new = out.groupBy("new_uuid").count().agg(F.max("count")).collect()[0][0]
    assert per_new <= RELEVANT_SCHEMA_LIMIT


def test_asof_snapshot_and_diff_truth_table(spark):
    """live(t) = valid_at <= t < invalid_at, open-ended intervals; the
    diff emits exactly the liveness changes between t1 and t2."""
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from graphiti_spark.operators.temporal import asof_diff, asof_snapshot

    def ts(h):
        return datetime(2024, 1, 1, h, tzinfo=timezone.utc)

    edges = spark.createDataFrame(
        [
            ("before_both", ts(0), ts(1)),     # closed before t1
            ("removed", ts(0), ts(4)),         # live at 2, closed by 6
            ("stable", ts(0), None),           # live at both
            ("added", ts(3), None),            # opens between
            ("blip", ts(3), ts(5)),            # opens AND closes between
            ("after_both", ts(8), None),       # opens after t2
        ],
        "uuid string, valid_at timestamp, invalid_at timestamp",
    )
    snap2 = {r["uuid"] for r in asof_snapshot(edges, ts(2)).collect()}
    snap6 = {r["uuid"] for r in asof_snapshot(edges, ts(6)).collect()}
    assert snap2 == {"removed", "stable"}
    assert snap6 == {"stable", "added"}
    diff = {
        r["uuid"]: r["status"]
        for r in asof_diff(edges, ts(2), ts(6)).collect()
    }
    assert diff == {"removed": "removed", "added": "added"}
