"""EpisodeType variants: speaker-first rule, json traversal (reference
nodes.py:51-84, prompts/extract_nodes.py:109-110)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.sources.episode_types import (
    extract_typed,
    flatten_json,
    speaker_mentions,
)


def test_flatten_json_deterministic_traversal():
    assert flatten_json('{"b": "x", "a": [1, {"c": "y"}]}') == "a 1 c y b x"
    assert flatten_json("not json at all") == "not json at all"


def _episodes(spark, rows):
    """rows: (uuid, source, content)"""
    return spark.createDataFrame(
        [(u, "g", s, c) for (u, s, c) in rows],
        "uuid string, group_id string, source string, content string",
    ).withColumn("valid_at", F.to_timestamp(F.lit("2024-01-01 00:00:00")))


def test_speaker_first_rule(spark):
    eps = _episodes(
        spark,
        [("ep1", "message", "alice: the fast table\nbob: row join key")],
    )
    got = {r.name for r in speaker_mentions(eps).collect()}
    assert got == {"alice", "bob"}


def test_extract_typed_dispatch(spark):
    eps = _episodes(
        spark,
        [
            ("m1", "message", "alice: fast table join row"),
            ("j1", "json", '{"body": "fast table join row"}'),
            ("t1", "text", "fast table join row"),
        ],
    )
    mentions, triples = extract_typed(eps)
    by_ep = {}
    for r in mentions.collect():
        by_ep.setdefault(r.episode_uuid, set()).add(r.name)
    # same grammar mentions everywhere; message adds the speaker
    assert by_ep["m1"] == {"alice", "fast table", "row"}
    assert by_ep["j1"] == {"fast table", "row"}
    assert by_ep["t1"] == {"fast table", "row"}
    trip = {(r.episode_uuid, r.subj_name, r.pred, r.obj_name)
            for r in triples.collect()}
    for ep in ("m1", "j1", "t1"):
        assert (ep, "fast table", "JOIN", "row") in trip
