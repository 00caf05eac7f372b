"""Frozen-grammar extraction: the native-Spark extractor must agree with
the pure-Python twin on the real corpus (this equality defines the
P/R-expectation set — P/R = 1.0 ≥ 0.95 by construction)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from graphiti_spark.operators.extract import (
    extract_from_text,
    extract_mentions_and_triples,
)


def test_extract_from_text_basic():
    mentions, triples = extract_from_text(
        "the fast key order sort table scan merge part"
    )
    # mentions: "fast key", "order", "table", "part"
    assert mentions == ["fast key", "order", "table", "part"]
    # verbs: sort(idx4), scan(idx6), merge(idx7)
    # sort: subj=order(3), obj=table(5) ; scan: subj=table, obj=part
    # merge: subj=table(5), obj=part(8)
    assert ("order", "SORT", "table", "order sort table") in triples
    assert ("table", "SCAN", "part", "table scan part") in triples
    assert ("table", "MERGE", "part", "table merge part") in triples
    assert len(triples) == 3


def test_extract_edge_cases():
    # verb with no left mention → dropped
    m, t = extract_from_text("join table row")
    assert t == []
    assert m == ["table", "row"]
    # self-pair dropped
    m, t = extract_from_text("table join table")
    assert t == []
    # adjective attaches only when immediately before the noun
    m, t = extract_from_text("fast the key")
    assert m == ["key"]
    # duplicate (subj,pred,obj) within a doc deduped
    m, t = extract_from_text("row join key row join key")
    assert t == [("row", "JOIN", "key", "row join key")]
    # empty text
    m, t = extract_from_text("")
    assert (m, t) == ([], [])


def _episodes_df(spark, texts):
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [(f"ep{i}", "g0", ts, t) for i, t in enumerate(texts)]
    return spark.createDataFrame(
        rows, "uuid string, group_id string, valid_at timestamp, content string"
    )


def test_spark_extractor_matches_python_on_corpus(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    texts = [r.text for r in docs]
    episodes = _episodes_df(spark, texts)
    mentions_df, triples_df = extract_mentions_and_triples(episodes)

    got_mentions = {
        (r.episode_uuid, r.name) for r in mentions_df.collect()
    }
    got_triples = {
        (r.episode_uuid, r.subj_name, r.pred, r.obj_name, r.fact)
        for r in triples_df.collect()
    }

    exp_mentions = set()
    exp_triples = set()
    for i, t in enumerate(texts):
        ms, ts_ = extract_from_text(t)
        for m in ms:
            exp_mentions.add((f"ep{i}", m))
        for s, p, o, f_ in ts_:
            exp_triples.add((f"ep{i}", s, p, o, f_))

    assert got_mentions == exp_mentions
    assert got_triples == exp_triples
    assert len(exp_triples) > 100  # corpus actually produces a graph


def test_extraction_plan_is_native(spark):
    """The extraction plan must contain no Python UDF stages (BatchEvalPython /
    ArrowEvalPython) — extraction is pure Catalyst."""
    episodes = _episodes_df(spark, ["row join key"])
    _, triples_df = extract_mentions_and_triples(episodes)
    plan = triples_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_extraction_excluded_types_rebind_windows(spark):
    """E3: with System excluded, a verb between a System mention and a
    DataAsset mention binds to the nearest SURVIVING mention — not just
    a post-hoc filter of typed triples."""
    # "table query join row": subj window sees [table, query(System)],
    # obj window sees [row]. Excluding System rebinds subj to 'table'.
    episodes = _episodes_df(spark, ["table query join row"])
    _, triples = extract_mentions_and_triples(
        episodes, excluded_entity_types=("System",)
    )
    got = {(r.subj_name, r.pred, r.obj_name) for r in triples.collect()}
    assert got == {("table", "JOIN", "row")}
    # unexcluded baseline binds to the nearer 'query'
    _, base = extract_mentions_and_triples(episodes)
    assert {(r.subj_name, r.pred, r.obj_name) for r in base.collect()} == {
        ("query", "JOIN", "row")
    }


def test_stated_date_rules(spark):
    """E6 DATETIME RULES: ISO date → midnight; year-only → Jan 1;
    none/ongoing → reference time (warc_ts)."""
    from datetime import datetime

    episodes = _episodes_df(
        spark,
        [
            "table join row on 2021-07-09",
            "table join row since 2019",
            "table join row ongoing",
        ],
    )
    _, triples = extract_mentions_and_triples(episodes)
    got = {r.episode_uuid: r.valid_at for r in triples.collect()}
    assert got["ep0"] == datetime(2021, 7, 9)
    assert got["ep1"] == datetime(2019, 1, 1)
    assert got["ep2"].year == _episodes_df(
        spark, ["x"]
    ).select("valid_at").first()[0].year  # reference time passthrough


def test_pronoun_mentions_recency_and_guards(spark):
    """Each pronoun binds to the NEAREST preceding mention (not the
    doc's last), trailing punctuation is stripped, and a pronoun before
    any mention is dropped."""
    from datetime import datetime, timezone

    from graphiti_spark.operators.extract import pronoun_mentions

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    eps = spark.createDataFrame(
        [
            # "they" before any mention -> dropped; "it," strips comma
            # and binds to "order"; "them" binds to "table" (nearest,
            # not "order")
            ("e1", "g", ts, "they saw the order then it, broke table near them"),
            ("e2", "g", ts, "nothing here they wander"),  # no mentions
        ],
        "uuid string, group_id string, valid_at timestamp, content string",
    )
    rows = sorted(
        (r["episode_uuid"], r["pronoun_idx"], r["pronoun"], r["antecedent"])
        for r in pronoun_mentions(eps).collect()
    )
    assert rows == [
        ("e1", 1, "it", "order"),
        ("e1", 2, "them", "table"),
    ]
