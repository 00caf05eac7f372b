"""E7 typed attribute extraction (deterministic regex ontology)."""

from __future__ import annotations

from datetime import datetime, timezone

from graphiti_spark.operators.attributes import apply_attributes, extract_attributes


def _ts(day):
    return datetime(2024, 1, day, tzinfo=timezone.utc)


def test_extract_attributes_first_wins(spark):
    episodes = spark.createDataFrame(
        [
            ("ep1", "alice works at acme as engineer", _ts(2)),
            ("ep2", "alice works at globex as manager", _ts(1)),  # earlier!
            ("ep3", "nothing relevant here", _ts(3)),
        ],
        "uuid string, content string, valid_at timestamp",
    )
    mentions = spark.createDataFrame(
        [("e_alice", "ep1"), ("e_alice", "ep2"), ("e_bob", "ep3")],
        "entity_uuid string, episode_uuid string",
    )
    spec = {
        "employer": r"works at (\w+)",
        "role": r"as (\w+)",
    }
    out = {r.entity_uuid: r.attributes for r in
           extract_attributes(mentions, episodes, spec).collect()}
    # earliest episode (ep2, day 1) wins
    assert out["e_alice"] == {"employer": "globex", "role": "manager"}
    assert "e_bob" not in out  # no matches → absent


def test_apply_attributes_merge(spark):
    nodes = spark.createDataFrame(
        [("e1", {"kept": "old", "employer": "stale"}), ("e2", None)],
        "uuid string, attributes map<string,string>",
    )
    attrs = spark.createDataFrame(
        [("e1", {"employer": "acme"})],
        "entity_uuid string, attributes map<string,string>",
    )
    out = {r.uuid: r.attributes for r in apply_attributes(nodes, attrs).collect()}
    assert out["e1"] == {"kept": "old", "employer": "acme"}  # override + keep
    assert out["e2"] is None
