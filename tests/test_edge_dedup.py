"""Fuzzy edge dedup, IS_DUPLICATE_OF filtering, type enforcement,
invalidation candidates (SURVEY.md D11/D16-D19/T4) + graph sinks."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.embed import embed_text
from graphiti_spark.operators.edge_dedup import (
    build_is_duplicate_edges,
    edge_duplicate_pairs,
    enforce_edge_types,
    filter_existing_duplicate_pairs,
    invalidation_candidates,
    merge_duplicate_edges,
)

TS = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _edges(spark, rows):
    """rows: (uuid, src, dst, name, fact, episodes, valid_day)"""
    data = [
        (u, "g", s, d, n, f, embed_text(f), eps,
         TS, datetime(2024, 1, day, tzinfo=timezone.utc))
        for (u, s, d, n, f, eps, day) in rows
    ]
    return spark.createDataFrame(
        data,
        "uuid string, group_id string, source_node_uuid string, "
        "target_node_uuid string, name string, fact string, "
        "fact_embedding array<float>, episodes array<string>, "
        "created_at timestamp, valid_at timestamp",
    )


@pytest.fixture(scope="module")
def edges(spark):
    return _edges(
        spark,
        [
            ("e1", "a", "b", "WORKS_AT", "alice works at acme", ["ep1"], 1),
            ("e2", "a", "b", "WORKS_AT", "alice works at the acme", ["ep2"], 2),
            ("e3", "a", "b", "HATES", "completely different statement entirely", ["ep3"], 3),
            ("e4", "a", "c", "WORKS_AT", "alice works at acme", ["ep4"], 4),  # diff endpoints
        ],
    )


def test_edge_duplicate_pairs(edges):
    pairs = {(r.src, r.dst) for r in edge_duplicate_pairs(edges, 0.6).collect()}
    assert ("e1", "e2") in pairs  # same endpoints, overlapping facts
    assert not any("e4" in p for p in pairs)  # different endpoints
    assert ("e1", "e3") not in pairs and ("e2", "e3") not in pairs


def test_edge_duplicate_pairs_overlap_alone_qualifies(spark):
    """Reference OR rule (bulk_utils.py:430-432): a single shared fact
    word qualifies a same-endpoint pair even when embedding cosine is
    far below min_score."""
    from graphiti_spark.functions.embed import cosine

    f_a = "alice works at acme"
    f_b = "acme headquarters tall downtown building yesterday"
    assert cosine(embed_text(f_a), embed_text(f_b)) < 0.6  # overlap-only pair
    edges = _edges(
        spark,
        [
            ("o1", "a", "b", "R", f_a, ["ep1"], 1),
            ("o2", "a", "b", "R", f_b, ["ep2"], 2),
        ],
    )
    pairs = {(r.src, r.dst) for r in edge_duplicate_pairs(edges, 0.6).collect()}
    assert ("o1", "o2") in pairs


def test_merge_duplicate_edges(spark, edges):
    pairs = spark.range(1).select(
        F.lit("e1").alias("src"), F.lit("e2").alias("dst")
    )
    merged = merge_duplicate_edges(edges, pairs)
    rows = {r.uuid: r for r in merged.collect()}
    assert set(rows) == {"e1", "e3", "e4"}  # e2 collapsed into e1
    assert rows["e1"].episodes == ["ep1", "ep2"]  # provenance unioned
    assert rows["e1"].valid_at == datetime(2024, 1, 1)  # earliest wins


def test_filter_existing_duplicate_pairs(spark):
    pairs = spark.range(1).select(
        F.lit("x").alias("src"), F.lit("y").alias("dst")
    ).union(spark.range(1).select(F.lit("p").alias("src"), F.lit("q").alias("dst")))
    existing = _edges(spark, [("d1", "y", "x", "IS_DUPLICATE_OF", "", [], 1)])
    out = {(r.src, r.dst) for r in
           filter_existing_duplicate_pairs(pairs, existing).collect()}
    assert out == {("p", "q")}  # (x,y) dropped via reversed recorded pair


def test_build_is_duplicate_edges(spark, edges):
    pairs = spark.range(1).select(F.lit("e1").alias("src"), F.lit("e2").alias("dst"))
    out = build_is_duplicate_edges(pairs, edges, TS).collect()
    assert len(out) == 1
    assert out[0].name == "IS_DUPLICATE_OF"
    assert out[0].source_node_uuid == "e1" and out[0].target_node_uuid == "e2"


def test_enforce_edge_types(spark, edges):
    nodes = spark.createDataFrame(
        [("a", ["Entity", "Person"]), ("b", ["Entity", "Company"]),
         ("c", ["Entity", "Person"])],
        "uuid string, labels array<string>",
    )
    type_map = {("Person", "Company"): ["WORKS_AT"]}
    out = {r.uuid: r.name for r in
           enforce_edge_types(edges, nodes, type_map).collect()}
    assert out["e1"] == "WORKS_AT"          # Person→Company allowed
    assert out["e4"] == "RELATES_TO"        # Person→Person: custom name reset
    assert out["e3"] == "HATES"             # non-custom name passes through


def test_invalidation_candidates(spark, edges):
    new = _edges(spark, [("n1", "b", "z", "WORKS_AT", "alice works at acme now", ["ep9"], 9)])
    cands = {(r.new_uuid, r.candidate_uuid) for r in
             invalidation_candidates(new, edges, 0.6).collect()}
    # shares endpoint b with e1/e2/e3; similar fact only vs e1/e2
    assert ("n1", "e1") in cands and ("n1", "e2") in cands
    assert ("n1", "e3") not in cands
    assert ("n1", "e4") not in cands  # no shared endpoint


def test_save_load_graph_roundtrip(spark, edges, tmp_path):
    from graphiti_spark.materialize import load_graph, save_graph, upsert_sql

    written = save_graph({"edges": edges}, str(tmp_path))
    assert "edges" in written
    back = load_graph(spark, str(tmp_path))
    assert back["edges"].count() == 4
    got = {r.uuid for r in back["edges"].collect()}
    assert got == {"e1", "e2", "e3", "e4"}
    assert "MERGE INTO graph.edges" in upsert_sql("graph.edges", "updates")


def test_graph_ddl_shapes():
    """S8: Iceberg DDL emitters carry the physical design (group_id
    partitioning, uuid sort order) for every graph table."""
    from graphiti_spark.materialize import graph_ddl

    ddl = graph_ddl("g")
    assert set(ddl) == {"nodes", "edges", "mention_edges", "episodes",
                        "communities"}
    for name, stmt in ddl.items():
        assert stmt.startswith(f"CREATE TABLE IF NOT EXISTS g.{name} (")
        assert "USING iceberg" in stmt
        assert "PARTITIONED BY (group_id)" in stmt
        assert "'sort-order'='uuid ASC NULLS FIRST'" in stmt
        assert "uuid string" in stmt
