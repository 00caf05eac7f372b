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
