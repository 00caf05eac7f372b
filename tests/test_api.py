"""Manual-triplet insert + episode→subgraph fetch (reference
graphiti.py:1155-1233 add_triplet / get_nodes_and_edges_by_episode).

add_triplet bypasses extraction but runs the SAME incremental
resolution tail (ingest_extracted), so its contract is equivalence:
adding (s, p, o) manually must produce the same graph as ingesting the
equivalent one-fact page — VERDICT r03 missing #3's done criterion.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from graphiti_spark.config import RunConfig
from graphiti_spark.functions.smalldf import literal_df
from graphiti_spark.operators.incremental import add_triplet, ingest_incremental
from graphiti_spark.operators.maintenance import get_nodes_and_edges_by_episode
from graphiti_spark.pipeline import run_pipeline_from_pages

TS = datetime(2025, 3, 1, 12, 0, 0)

PAGE_COLS = [
    ("url", "string"),
    ("warc_ts", "timestamp"),
    ("html", "binary"),
    ("text", "string"),
    ("lang", "string"),
    ("group_id", "string"),
    ("doc_id", "long"),
]


def _pages(spark, rows):
    return literal_df(
        spark,
        [
            (url, TS, None, text, "en", "g", i)
            for i, (url, text) in enumerate(rows)
        ],
        PAGE_COLS,
    )


def _prior(spark):
    return run_pipeline_from_pages(
        spark,
        _pages(
            spark,
            [
                ("http://a", "spark merge table"),
                ("http://b", "data scan key"),
            ],
        ),
        RunConfig(),
    )


def test_add_triplet_equals_ingesting_equivalent_page(spark):
    prior = _prior(spark)
    got = add_triplet(spark, prior, "g", "spark", "join", "window", valid_at=TS)

    # the equivalent page: same deterministic manual url, text = fact —
    # extraction recovers exactly the same mention/triple rows
    page = literal_df(
        spark,
        [("manual:g|spark join window", TS, None, "spark join window", "en", "g", 99)],
        PAGE_COLS,
    )
    want = ingest_incremental(spark, page, _prior(spark))

    def rows(df, *cols):
        return {tuple(r) for r in df.select(*cols).collect()}

    assert rows(got["nodes"], "uuid", "name", "mention_count") == rows(
        want["nodes"], "uuid", "name", "mention_count"
    )
    assert rows(got["edges"], "uuid", "name", "fact", "valid_at") == rows(
        want["edges"], "uuid", "name", "fact", "valid_at"
    )
    assert rows(got["episodes"], "uuid", "group_id") == rows(
        want["episodes"], "uuid", "group_id"
    )
    assert rows(got["mention_edges"], "uuid") == rows(want["mention_edges"], "uuid")
    # and the insert actually landed: one new JOIN edge over canonicals
    new_edge = got["edges"].filter(F.col("name") == "JOIN")
    assert new_edge.count() == 1


def test_add_triplet_resolves_against_existing_canonicals(spark):
    """Endpoints matching existing entities resolve to the SAME canonical
    uuids (content identity + shared resolution) — no duplicate nodes."""
    prior = _prior(spark)
    n_nodes_before = prior["nodes"].count()
    got = add_triplet(spark, prior, "g", "spark", "filter", "data", valid_at=TS)
    # 'spark' and 'data' already exist; the graph gains no node
    assert got["nodes"].count() == n_nodes_before
    # the delta map carries the manual edge as an upsert
    assert (
        got["delta"]["edges"]["upserts"].filter(F.col("name") == "FILTER").count()
        == 1
    )


def test_get_nodes_and_edges_by_episode(spark):
    prior = _prior(spark)
    ep_a = (
        prior["episodes"].filter(F.col("name") == "http://a").collect()[0].uuid
    )
    sub = get_nodes_and_edges_by_episode(
        [ep_a], prior["mention_edges"], prior["nodes"], prior["edges"]
    )
    assert {r.name for r in sub["nodes"].collect()} == {"spark", "table"}
    edges = sub["edges"].collect()
    assert {r.name for r in edges} == {"MERGE"}
    assert all(ep_a in r.episodes for r in edges)
    # a manual triplet's episode is fetchable the same way
    got = add_triplet(spark, prior, "g", "spark", "join", "window", valid_at=TS)
    ep_m = (
        got["episodes"].filter(F.col("source") == "manual").collect()[0].uuid
    )
    sub_m = get_nodes_and_edges_by_episode(
        [ep_m], got["mention_edges"], got["nodes"], got["edges"]
    )
    assert {r.name for r in sub_m["nodes"].collect()} == {"spark", "window"}
    assert {r.name for r in sub_m["edges"].collect()} == {"JOIN"}


def test_get_episodes_by_mentions_inverts_subgraph_fetch(spark):
    """r5 (reference get_episodes_by_mentions, search_utils.py:113-125):
    the reverse provenance fetch — feeding an edge set back returns
    exactly the episodes its provenance arrays cite, and limit cuts in
    uuid order."""
    from graphiti_spark.operators.maintenance import get_episodes_by_mentions

    prior = _prior(spark)
    ep_a = (
        prior["episodes"].filter(F.col("name") == "http://a").collect()[0].uuid
    )
    sub = get_nodes_and_edges_by_episode(
        [ep_a], prior["mention_edges"], prior["nodes"], prior["edges"]
    )
    eps = get_episodes_by_mentions(sub["edges"], prior["episodes"]).collect()
    assert ep_a in {r.uuid for r in eps}
    # every returned episode really is cited by some probe edge
    cited = {
        u for r in sub["edges"].collect() for u in r.episodes
    }
    assert {r.uuid for r in eps} == cited
    # limit honors uuid order
    one = get_episodes_by_mentions(
        sub["edges"], prior["episodes"], limit=1
    ).collect()
    assert [r.uuid for r in one] == sorted(cited)[:1]
