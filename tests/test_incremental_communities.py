"""G4 community maintenance inside the delta-incremental ingest
(reference add_episode(update_communities=True) → update_community,
community_operations.py:246-331).

The placement arms (direct + neighbor-mode) are hash-verified by the
communities_incremental / has_member_incremental oracle entries; what
the oracle CANNOT exercise on the gazetteer corpus is the canonical
RE-POINT arm (the uuid_map is the identity there — no fuzzy merges), so
that arm is pinned here with synthetic frames, plus the end-to-end
delta-commit path: a streaming/snapshot+delta run must carry community
upserts and reconstruct the same tables merge-on-read.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graphiti_spark import ids
from graphiti_spark.config import DEFAULT_RUN_TS, RunConfig
from graphiti_spark.functions.smalldf import literal_df
from graphiti_spark.operators.incremental import _update_communities_delta

TS = DEFAULT_RUN_TS


def _comms(spark, rows):
    return literal_df(
        spark,
        [(u, f"community {u}", "g", s, TS, n) for u, s, n in rows],
        [
            ("uuid", "string"),
            ("name", "string"),
            ("group_id", "string"),
            ("summary", "string"),
            ("created_at", "timestamp"),
            ("member_count", "long"),
        ],
    )


def _hm(spark, pairs):
    return literal_df(
        spark,
        [(ids.mention_uuid(c, e), "g", c, e, TS) for c, e in pairs],
        [
            ("uuid", "string"),
            ("group_id", "string"),
            ("community_uuid", "string"),
            ("entity_uuid", "string"),
            ("created_at", "timestamp"),
        ],
    )


def _repoint(spark, pairs):
    return literal_df(
        spark,
        pairs,
        [("uuid", "string"), ("canonical_uuid", "string")],
    )


def _edges(spark, pairs):
    return literal_df(
        spark,
        [(f"e{i}", s, d) for i, (s, d) in enumerate(pairs)],
        [
            ("uuid", "string"),
            ("source_node_uuid", "string"),
            ("target_node_uuid", "string"),
        ],
    )


def _nodes(spark, uuids):
    return literal_df(
        spark,
        [(u, f"summary {u}") for u in uuids],
        [("uuid", "string"), ("summary", "string")],
    )


def test_repoint_rekeys_membership_and_recounts(spark):
    """A merge that re-points a member canonical (a → z) moves the
    HAS_MEMBER row to the surviving uuid: the re-keyed node is then a
    DIRECT member (no duplicate membership appended), the old row is
    deleted, and the community count is recounted, not bumped."""
    prior_comms = _comms(spark, [("c1", "a. b.", 2), ("c2", "d.", 1)])
    prior_hm = _hm(spark, [("c1", "a"), ("c1", "b"), ("c2", "d")])
    out = _update_communities_delta(
        prior_comms,
        prior_hm,
        _repoint(spark, [("a", "z")]),
        _edges(spark, []),
        _nodes(spark, ["z"]),
        TS,
    )
    hm = {(r.community_uuid, r.entity_uuid) for r in out["has_member"].collect()}
    assert hm == {("c1", "z"), ("c1", "b"), ("c2", "d")}
    counts = {r.uuid: r.member_count for r in out["communities"].collect()}
    assert counts == {"c1": 2, "c2": 1}
    assert {r.uuid for r in out["hm_deletes"].collect()} == {
        ids.mention_uuid("c1", "a")
    }
    up = {(r.community_uuid, r.entity_uuid) for r in out["hm_upserts"].collect()}
    assert up == {("c1", "z")}
    # the re-keyed row carries the deterministic membership identity
    assert {r.uuid for r in out["hm_upserts"].collect()} == {
        ids.mention_uuid("c1", "z")
    }
    # the touched community is in the upsert set (recount + summary fold)
    assert "c1" in {r.uuid for r in out["comm_upserts"].collect()}


def test_repoint_merge_collision_smaller_community_wins(spark):
    """Two members of DIFFERENT communities merging into one canonical
    collapse to a single membership: the smaller community uuid wins,
    the loser's count is corrected DOWN to its recounted value (0 here),
    and both old rows are deleted."""
    prior_comms = _comms(spark, [("c1", "a.", 1), ("c2", "b.", 1)])
    prior_hm = _hm(spark, [("c1", "a"), ("c2", "b")])
    out = _update_communities_delta(
        prior_comms,
        prior_hm,
        _repoint(spark, [("a", "z"), ("b", "z")]),
        _edges(spark, []),
        _nodes(spark, ["z"]),
        TS,
    )
    hm = {(r.community_uuid, r.entity_uuid) for r in out["has_member"].collect()}
    assert hm == {("c1", "z")}
    counts = {r.uuid: r.member_count for r in out["communities"].collect()}
    assert counts == {"c1": 1, "c2": 0}
    assert {r.uuid for r in out["hm_deletes"].collect()} == {
        ids.mention_uuid("c1", "a"),
        ids.mention_uuid("c2", "b"),
    }
    # BOTH communities' corrected rows are in the delta upserts — a
    # merge-on-read reader must see c2's count drop to 0
    comm_up = {r.uuid: r.member_count for r in out["comm_upserts"].collect()}
    assert comm_up["c1"] == 1 and comm_up["c2"] == 0


def test_repoint_target_keeps_existing_membership(spark):
    """When the SURVIVING canonical is already a member, the re-pointed
    row folds into its membership (one row, smaller community wins) —
    never a second membership for the same entity."""
    prior_comms = _comms(spark, [("c1", "a.", 1), ("c2", "z.", 1)])
    prior_hm = _hm(spark, [("c1", "a"), ("c2", "z")])
    out = _update_communities_delta(
        prior_comms,
        prior_hm,
        _repoint(spark, [("a", "z")]),
        _edges(spark, []),
        _nodes(spark, ["z"]),
        TS,
    )
    hm = {(r.community_uuid, r.entity_uuid) for r in out["has_member"].collect()}
    assert hm == {("c1", "z")}  # min(c1, c2) wins; exactly one row
    counts = {r.uuid: r.member_count for r in out["communities"].collect()}
    assert counts == {"c1": 1, "c2": 0}
    # z's OLD c2 row is superseded (deleted), the c1 row is the upsert
    assert ids.mention_uuid("c2", "z") in {
        r.uuid for r in out["hm_deletes"].collect()
    }


def test_streaming_delta_commit_carries_community_upserts(spark, tmp_path):
    """End-to-end VERDICT r03 'done' criterion: a streaming ingest with
    communities enabled commits community/has_member UPSERTS in its
    delta version, and the merge-on-read state equals the in-memory
    incremental output. Split is WITHIN groups (doc_id % 40) — a parity
    split would put the halves in disjoint graph partitions and the
    placement arms would be vacuously empty."""
    from graphiti_spark.materialize import load_graph, save_graph
    from graphiti_spark.operators.incremental import ingest_incremental
    from graphiti_spark.pipeline import run_pipeline_from_pages
    from graphiti_spark.sources.pages import load_pages
    from graphiti_spark.streaming.ingest import (
        load_graph_state,
        run_streaming_ingest,
    )

    feed = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    cfg = RunConfig(with_communities=True)

    pages = (
        load_pages(spark, "/root/testdata/sf0.001")
        .filter(F.col("doc_id") < 120)
        .persist()
    )
    half_a = pages.filter(F.col("doc_id") % 40 < 20)
    half_b = pages.filter(F.col("doc_id") % 40 >= 20)

    half_a.write.parquet(os.path.join(feed, "part=a"))
    run_streaming_ingest(spark, feed + "/part=a", state, ckpt + "1", cfg)
    st0 = load_graph_state(spark, state)
    assert st0 is not None and st0["communities"].count() > 0

    half_b.write.parquet(os.path.join(feed, "part=b"))
    run_streaming_ingest(spark, feed + "/part=b", state, ckpt + "2", cfg)

    # the second commit is a DELTA version carrying community upserts
    v1 = os.path.join(state, "v000000001")
    assert os.path.isdir(os.path.join(v1, "communities", "upserts"))
    assert os.path.isdir(os.path.join(v1, "has_member", "upserts"))
    comm_up = spark.read.parquet(os.path.join(v1, "communities", "upserts"))
    hm_up = spark.read.parquet(os.path.join(v1, "has_member", "upserts"))
    assert comm_up.count() > 0 and hm_up.count() > 0

    # merge-on-read state ≡ the in-memory incremental output over the
    # same prior (snapshot round-trip so plans don't share lineage)
    snap = str(tmp_path / "snap")
    out_a = run_pipeline_from_pages(spark, half_a, cfg)
    save_graph(out_a, snap)
    merged = ingest_incremental(spark, half_b, load_graph(spark, snap), cfg)
    got = load_graph_state(spark, state)

    def rows(df, *cols):
        return {tuple(r) for r in df.select(*cols).collect()}

    assert rows(got["communities"], "uuid", "member_count") == rows(
        merged["communities"], "uuid", "member_count"
    )
    assert rows(got["has_member"], "community_uuid", "entity_uuid") == rows(
        merged["has_member"], "community_uuid", "entity_uuid"
    )
    pages.unpersist()
