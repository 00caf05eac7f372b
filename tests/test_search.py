"""Retrieval layer: BM25, cosine/LSH similarity, RRF, MMR, BFS,
rerankers, filters, label propagation (SURVEY.md §2.5-§2.6)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.embed import embed_text
from graphiti_spark.search.filters import SearchFilters, apply_filters
from graphiti_spark.search.fulltext import bm25_search, build_postings
from graphiti_spark.search.fuse import mmr_rerank, rrf
from graphiti_spark.search.graph import (
    bfs_nodes,
    episode_mentions_rerank,
    node_distance_rerank,
)
from graphiti_spark.search.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    ivf_assign,
    ivf_centroids,
)
from graphiti_spark.operators.communities import label_propagation


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "fast table join slow table"),
        (2, "fast query"),
        (3, "window window window"),
        (4, "table"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_bm25_ranks_and_scores(corpus, spark):
    idx = build_postings(corpus, "id", "text")
    out = bm25_search(idx, ["fast", "table"], limit=10).collect()
    ids = [r.id for r in out]
    # doc1 has both terms (table twice) → top; docs 2 and 4 have one term.
    assert ids[0] == 1
    assert set(ids) == {1, 2, 4}
    assert [r.rank for r in out] == [1, 2, 3]
    # manual BM25 check for doc 4 (term 'table', tf=1, dl=1):
    n_docs, df_table, avgdl = 4, 2, (5 + 2 + 3 + 1) / 4
    idf = math.log(1 + (n_docs - df_table + 0.5) / (df_table + 0.5))
    k1, b = 1.2, 0.75
    expect = idf * (1 * (k1 + 1)) / (1 + k1 * (1 - b + b * 1 / avgdl))
    got = [r.score for r in out if r.id == 4][0]
    assert abs(got - round(expect, 4)) < 1e-9


def test_cosine_topk_exact(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(df, [1.0, 0.0, 0.0], limit=3).collect()
    assert [r.id for r in out] == [1, 2, 3]
    assert out[0].score == 1.0
    assert abs(out[1].score - round(0.9 / math.sqrt(0.81 + 0.01), 4)) < 1e-9


def test_cosine_lsh_recall(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[0]]
    exact = {r.id for r in cosine_topk(df, q, limit=10).collect()}
    approx = {r.id for r in cosine_topk_lsh(df, q, limit=10).collect()}
    assert 0 in approx  # the query vector itself must be found
    assert len(exact & approx) / 10 >= 0.6


def test_cosine_ivf_full_probe_equals_exact(spark):
    """n_probe == n_cells scans every cell — must reproduce brute force."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[3]]
    exact = [(r.id, r.score) for r in cosine_topk(df, q, limit=10).collect()]
    ivf = [
        (r.id, r.score)
        for r in cosine_topk_ivf(
            df, q, limit=10, n_cells=4, n_probe=4
        ).collect()
    ]
    assert ivf == exact


def test_cosine_ivf_recall_clustered(spark):
    """The honest IVF use case: clustered vectors. The query's true
    neighbors share its cluster, the cluster maps to few cells, so a
    small probe recovers them."""
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(10, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(200):
        c = centers[i % 10]
        v = c + 0.05 * rng.normal(size=16)
        rows.append((i, [float(x) for x in v.astype("float32")]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [float(x) for x in np.asarray(rows[0][1])]
    exact = {r.id for r in cosine_topk(df, q, limit=10).collect()}
    approx = {
        r.id
        for r in cosine_topk_ivf(df, q, limit=10, n_cells=16, n_probe=4).collect()
    }
    assert 0 in approx  # the query vector itself must be found
    assert len(exact & approx) / 10 >= 0.8


def test_ivf_add_equals_full_build_with_frozen_centroids(spark):
    """Incremental IVF maintenance (r4): assigning a NEW batch against
    the FROZEN centroid set and unioning into the prior index must equal
    assigning the whole corpus against those centroids — the law that
    makes index-add (no rebuild) sound. Guards ivf_assign against any
    future corpus-global term that would break per-row additivity."""
    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(80, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    prior = df.filter(F.col("vec_id") % 5 != 0)
    new = df.filter(F.col("vec_id") % 5 == 0)
    cent = ivf_centroids(prior, n_cells=4).localCheckpoint()
    added = ivf_assign(prior, cent).unionByName(ivf_assign(new, cent))
    full = ivf_assign(df, cent)
    a = sorted((r.id, r.cell) for r in added.collect())
    b = sorted((r.id, r.cell) for r in full.collect())
    assert a == b


def test_ivf_assignment_deterministic_and_total(spark):
    """Every vector gets exactly one cell; reruns pick identical
    centroids (content-derived sha256 sample, no RNG)."""
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(40, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    cent1 = [r.cid for r in ivf_centroids(df, n_cells=6).collect()]
    cent2 = [r.cid for r in ivf_centroids(df, n_cells=6).collect()]
    assert cent1 == cent2 and len(cent1) == 6
    assigned = ivf_assign(df, ivf_centroids(df, n_cells=6))
    rows = assigned.collect()
    assert len(rows) == 40 and len({r.id for r in rows}) == 40
    assert {r.cell for r in rows} <= set(cent1)


def test_rrf_fusion(spark):
    a = spark.createDataFrame([(10, 1.0, 1), (11, 0.5, 2)], "id long, score double, rank int")
    b = spark.createDataFrame([(11, 9.0, 1), (12, 8.0, 2)], "id long, score double, rank int")
    out = {r.id: r.score for r in rrf([a, b], limit=10).collect()}
    # contributions 1/(rank-1+1): id11 = 1/2 + 1/1 = 1.5; id10 = 1; id12 = 0.5
    assert out == {11: 1.5, 10: 1.0, 12: 0.5}


def test_mmr_prefers_diversity(spark):
    # two near-identical high scorers + one orthogonal: MMR should pick
    # the best, then the orthogonal one (reference λ=0.5). Query must
    # differ from the first pick or every MMR value degenerates to 0.
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, -0.1]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    out = mmr_rerank(df, [0.8, 0.6], id_col="id", vec_col="vec", limit=2).collect()
    picked = [r.id for r in sorted(out, key=lambda r: r.rank)]
    assert picked[0] == 1
    assert picked[1] == 3


def _edges_df(spark, pairs):
    rows = [
        (f"e{i}", "g", s, d, "RELATES_TO", f"{s} r {d}")
        for i, (s, d) in enumerate(pairs)
    ]
    return spark.createDataFrame(
        rows,
        "uuid string, group_id string, source_node_uuid string, "
        "target_node_uuid string, name string, fact string",
    )


def test_bfs_depth_limits(spark):
    edges = _edges_df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = {r.uuid: r.depth for r in bfs_nodes(edges, ["a"], max_depth=3).collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}  # e is 4 hops → absent


def test_node_distance_rerank(spark):
    edges = _edges_df(spark, [("c", "x"), ("c", "y"), ("y", "z")])
    cands = spark.createDataFrame([("c",), ("x",), ("z",)], "uuid string")
    out = {r.id: r.score for r in node_distance_rerank(cands, edges, "c").collect()}
    assert out == {"c": 10.0, "x": 1.0, "z": 0.0}


def test_episode_mentions_rerank(spark):
    me = spark.createDataFrame(
        [("m1", "g", "ep1", "a"), ("m2", "g", "ep2", "a"), ("m3", "g", "ep1", "b")],
        "uuid string, group_id string, episode_uuid string, entity_uuid string",
    )
    cands = spark.createDataFrame([("a",), ("b",), ("c",)], "uuid string")
    out = {r.id: r.score for r in episode_mentions_rerank(cands, me).collect()}
    assert out == {"a": 2.0, "b": 1.0, "c": 0.0}


def test_search_filters_tree(spark):
    from datetime import datetime

    rows = [
        ("e1", "g1", "LIKES", datetime(2024, 1, 1), None),
        ("e2", "g1", "HATES", datetime(2024, 6, 1), datetime(2024, 7, 1)),
        ("e3", "g2", "LIKES", None, None),
    ]
    df = spark.createDataFrame(
        rows, "uuid string, group_id string, name string, valid_at timestamp, invalid_at timestamp"
    )
    f = SearchFilters(
        group_ids=["g1"],
        date_filters=[
            [("valid_at", "<", datetime(2024, 5, 1)), ("invalid_at", "is_not_null", None)]
        ],
    )
    got = {r.uuid for r in apply_filters(df, f, "edge").collect()}
    assert got == {"e1", "e2"}


def test_label_propagation_two_cliques(spark):
    # two triangles bridged by one weak edge → two communities
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
    edges = _edges_df(spark, tri1 + tri2 + [("c", "x")])
    labels = {r.uuid: r.community for r in label_propagation(edges).collect()}
    assert labels["a"] == labels["b"] == labels["c"]
    assert labels["x"] == labels["y"] == labels["z"]
    assert labels["a"] != labels["x"]


def test_embed_deterministic():
    a, b = embed_text("fast table"), embed_text("fast table")
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-5


def test_context_formatting(spark):
    from datetime import datetime, timezone

    from graphiti_spark.search.context import format_context

    edges = spark.createDataFrame(
        [("e1", "alice works at acme", datetime(2024, 1, 1, tzinfo=timezone.utc), None)],
        "uuid string, fact string, valid_at timestamp, invalid_at timestamp",
    )
    nodes = spark.createDataFrame(
        [("n1", "alice", "a person.")], "uuid string, name string, summary string"
    )
    block = format_context({"edges": edges, "nodes": nodes})
    assert "# FACTS" in block and "alice works at acme (2024-01-01 00:00:00 - present)" in block
    assert "# ENTITIES" in block and "alice: a person." in block


def test_update_communities_batch(spark):
    """G4 second half: direct member untouched; neighbor-mode assignment
    appends HAS_MEMBER + folds the new member's summary in; isolated
    nodes stay unassigned (reference update_community returns [], [])."""
    from graphiti_spark.operators.communities import (
        build_communities,
        update_communities,
    )
    from datetime import datetime, timezone

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    edges = _edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    nodes = spark.createDataFrame(
        [(u, u, "g", f"{u} summary") for u in "abc"],
        "uuid string, name string, group_id string, summary string",
    )
    built = build_communities(nodes, edges, ts)
    comms, members = built["communities"], built["has_member"]
    n0 = comms.first()
    # new node "d" neighbors b via a new edge; "zz" is isolated
    new_edges = _edges_df(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("d", "b")])
    new_nodes = spark.createDataFrame(
        [("d", "d", "g", "d summary"), ("zz", "zz", "g", "zz summary")],
        "uuid string, name string, group_id string, summary string",
    )
    out = update_communities(comms, members, new_edges, new_nodes, ts)
    got_members = {(r.community_uuid, r.entity_uuid)
                   for r in out["has_member"].collect()}
    assert (n0.uuid, "d") in got_members          # appended via neighbors
    assert not any(e == "zz" for (_, e) in got_members)  # isolated → skipped
    updated = {r.uuid: r for r in out["communities"].collect()}
    assert updated[n0.uuid].member_count == n0.member_count + 1
    assert "d summary" in updated[n0.uuid].summary


def test_all_recipes_honor_contract(spark):
    """Every canned recipe returns ≤ limit rows shaped (id, score, rank)
    for each configured channel — including channels whose configured
    reranker cannot run and degrades (loudly) to RRF."""
    from datetime import datetime, timezone

    from graphiti_spark.search import hybrid as H

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    from graphiti_spark.functions.embed import embed_text

    facts = ["fast table join row", "row sort key", "table merge part",
             "slow window scan data", "key dup value"]
    edges = spark.createDataFrame(
        [(f"e{i}", "g", f"s{i%2}", f"t{i%3}", "R", f, embed_text(f), ts, None)
         for i, f in enumerate(facts)],
        "uuid string, group_id string, source_node_uuid string, "
        "target_node_uuid string, name string, fact string, "
        "fact_embedding array<float>, valid_at timestamp, "
        "invalid_at timestamp",
    )
    nodes = spark.createDataFrame(
        [(f"s{i}", f"node {i}", "g", f"summary {i}", embed_text(f"node {i}"))
         for i in range(3)],
        "uuid string, name string, group_id string, summary string, "
        "name_embedding array<float>",
    )
    episodes = spark.createDataFrame(
        [(f"ep{i}", "g", f) for i, f in enumerate(facts)],
        "uuid string, group_id string, content string",
    )
    communities = spark.createDataFrame(
        [("c1", "community node 0", "g", "about the fast table cluster",
          embed_text("community node 0"))],
        "uuid string, name string, group_id string, summary string, "
        "name_embedding array<float>",
    )
    mention_edges = spark.createDataFrame(
        [("m1", "g", "ep0", "s0"), ("m2", "g", "ep1", "s1")],
        "uuid string, group_id string, episode_uuid string, entity_uuid string",
    )
    recipes = [
        n for n in dir(H)
        if n.isupper() and isinstance(getattr(H, n), H.SearchConfig)
    ]
    assert len(recipes) == 17
    for name in recipes:
        out = H.search(
            "fast table merge", getattr(H, name),
            nodes=nodes, edges=edges, episodes=episodes,
            communities=communities, mention_edges=mention_edges,
            center_uuid="s0", origin_uuids=["s0"],
        )
        assert out, name
        for channel, df in out.items():
            assert df.columns == ["id", "score", "rank"], (name, channel)
            rows = df.collect()
            assert len(rows) <= H.DEFAULT_SEARCH_LIMIT, (name, channel)
            assert len(rows) > 0, (name, channel)


def test_community_summary_cap_identical(spark):
    """r5 (VERDICT r4 wrong #1): the per-community summary concat reads
    at most SUMMARY_TOPK member names (salted two-phase bottom-k), and
    the truncated summary is IDENTICAL to the uncapped aggregation —
    the ". " separators of SUMMARY_TOPK names alone cover
    MAX_SUMMARY_CHARS, so truncate_at_sentence never reads past the
    agreeing prefix."""
    from graphiti_spark.config import MAX_SUMMARY_CHARS
    from graphiti_spark.operators.communities import (
        SUMMARY_TOPK,
        _capped_sorted_concat,
    )
    from graphiti_spark.textnorm import truncate_at_sentence

    assert 2 * (SUMMARY_TOPK - 1) >= MAX_SUMMARY_CHARS
    # one giant community (600 members, incl. 1-char names) + a tiny one
    names = [f"m{i:03d}" for i in range(597)] + ["a", "b", "c"]
    rows = [("g", "big", n, f"u-{n}") for n in names] + [
        ("g", "small", n, f"u-{n}") for n in ("xx", "yy")
    ]
    df = spark.createDataFrame(
        rows, "group_id string, community string, name string, uuid string"
    )
    got = {
        r.community: r.names_cat
        for r in _capped_sorted_concat(
            df, ["group_id", "community"], "name", "uuid"
        ).collect()
    }
    # cap binds: the big community's concat holds exactly SUMMARY_TOPK
    # names, not 600
    assert len(got["big"].split(". ")) == SUMMARY_TOPK
    # ...and is output-identical after sentence truncation
    big_full = ". ".join(sorted(names))
    assert truncate_at_sentence(got["big"] + ".", MAX_SUMMARY_CHARS) == \
        truncate_at_sentence(big_full + ".", MAX_SUMMARY_CHARS)
    assert got["small"] == "xx. yy"


def test_community_similarity_channel(spark):
    """r5 (VERDICT r4 missing #1): community recipes carry the cosine
    arm over name_embedding (reference search_config_recipes.py:201-223,
    community_similarity_search search_utils.py:1022-1129); a
    pre-embedding communities frame still degrades to bm25-only."""
    from graphiti_spark.search import hybrid as H
    from graphiti_spark.search.similarity import community_similarity_search

    for recipe in (
        H.COMMUNITY_HYBRID_SEARCH_RRF,
        H.COMMUNITY_HYBRID_SEARCH_MMR,
        H.COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER,
        H.COMBINED_HYBRID_SEARCH_RRF,
        H.COMBINED_HYBRID_SEARCH_MMR,
        H.COMBINED_HYBRID_SEARCH_CROSS_ENCODER,
    ):
        assert recipe.communities.methods == ["bm25", "cosine"]
    assert H.COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER.limit == 3

    names = ["community alpha metrics", "community beta storage",
             "community gamma network"]
    comms = spark.createDataFrame(
        [(f"c{i}", n, "g", f"summary of {n}", embed_text(n))
         for i, n in enumerate(names)],
        "uuid string, name string, group_id string, summary string, "
        "name_embedding array<float>",
    )
    top = community_similarity_search(
        comms, embed_text("community beta storage"), limit=2, min_score=None
    ).collect()
    assert top[0].id == "c1" and abs(top[0].score - 1.0) < 1e-6

    # the cosine arm changes the ranking vs bm25-alone: query text that
    # shares no tokens with any name still ranks its embedding twin first
    out = H.search(
        "community beta storage", H.COMMUNITY_HYBRID_SEARCH_RRF,
        communities=comms,
    )["communities"].collect()
    assert out[0].id == "c1"

    # vector-less frame (pre-r5 graph): degrades to bm25-only, no error
    legacy = comms.drop("name_embedding")
    out = H.search(
        "beta storage", H.COMMUNITY_HYBRID_SEARCH_RRF, communities=legacy
    )["communities"].collect()
    assert len(out) > 0


# ---------------------------------------------------- materialized index ---

def _graph_tables_for_postings(spark):
    edges = spark.createDataFrame(
        [("e1", "g", "WORKS_AT", "alice works at acme", None),
         ("e2", "g", "LIVES_IN", "bob lives in paris", None),
         ("e3", "g", "WORKS_AT", "carol works at acme corp", None)],
        "uuid string, group_id string, name string, fact string, "
        "fact_embedding array<float>",
    )
    episodes = spark.createDataFrame(
        [("p1", "g", "alice joined acme in spring"),
         ("p2", "g", "paris hosts the summit")],
        "uuid string, group_id string, content string",
    )
    return edges, episodes


def test_materialized_postings_roundtrip_no_retokenize(spark, tmp_path):
    """The graph-state postings table answers BM25 identically to the
    from-scratch path, and its query plan contains NO tokenize/explode —
    a second query must never re-tokenize the corpus (VERDICT r2 #3)."""
    from graphiti_spark.search.fulltext import (
        build_graph_postings,
        channel_index,
    )

    edges, episodes = _graph_tables_for_postings(spark)
    postings = build_graph_postings({"edges": edges, "episodes": episodes})
    path = str(tmp_path / "postings")
    postings.write.parquet(path)  # materialize as graph state
    loaded = spark.read.parquet(path)

    idx = channel_index(loaded, "edges")
    out = bm25_search(idx, ["alice", "acme"], limit=5)
    plan = (
        out._jdf.queryExecution().optimizedPlan().toString()
        + out._jdf.queryExecution().executedPlan().toString()
    )
    # corpus tokenization would show as explode(split(lower(...)));
    # the only Generate allowed is the literal query-term array
    assert "explode(split" not in plan

    corpus = edges.select(
        "uuid", F.concat_ws(" ", "name", "fact").alias("t")
    )
    fresh = bm25_search(
        build_postings(corpus, "uuid", "t"), ["alice", "acme"], limit=5
    )
    assert out.collect() == fresh.collect()


def test_hybrid_search_consumes_prebuilt_index(spark, tmp_path, monkeypatch):
    """search(..., graph_postings=...) must never fall back to ad-hoc
    tokenization for unfiltered bm25 channels."""
    import graphiti_spark.search.hybrid as hy
    from graphiti_spark.search.fulltext import build_graph_postings

    edges, episodes = _graph_tables_for_postings(spark)
    postings = build_graph_postings({"edges": edges, "episodes": episodes})
    path = str(tmp_path / "postings")
    postings.write.parquet(path)
    loaded = spark.read.parquet(path)

    def _boom(*a, **k):
        raise AssertionError("query re-tokenized the corpus")

    monkeypatch.setattr(hy, "build_postings", _boom)
    cfg = hy.SearchConfig(
        edges=hy.ChannelConfig(["bm25"], "rrf"),
        episodes=hy.ChannelConfig(["bm25"], "rrf"),
    )
    res = hy.search(
        "alice acme", cfg, edges=edges, episodes=episodes,
        graph_postings=loaded,
    )
    got = {r.id for r in res["edges"].collect()}
    assert got == {"e1", "e3"}
    assert {r.id for r in res["episodes"].collect()} == {"p1"}


def test_hybrid_missing_channel_falls_back_to_adhoc(spark, tmp_path):
    """A channel the materialized postings table never indexed must fall
    back to ad-hoc postings over the passed corpus — not silently score
    zero rows."""
    import graphiti_spark.search.hybrid as hy
    from graphiti_spark.search.fulltext import build_graph_postings

    edges, episodes = _graph_tables_for_postings(spark)
    postings = build_graph_postings({"edges": edges})  # NO episodes channel
    path = str(tmp_path / "postings_edges_only")
    postings.write.parquet(path)
    loaded = spark.read.parquet(path)

    cfg = hy.SearchConfig(
        edges=hy.ChannelConfig(["bm25"], "rrf"),
        episodes=hy.ChannelConfig(["bm25"], "rrf"),
    )
    res = hy.search(
        "alice acme", cfg, edges=edges, episodes=episodes,
        graph_postings=loaded,
    )
    assert {r.id for r in res["edges"].collect()} == {"e1", "e3"}
    # the unindexed channel still answers, via the ad-hoc fallback
    assert {r.id for r in res["episodes"].collect()} == {"p1"}


def test_node_channel_bfs_returns_node_ids(spark):
    """A nodes-channel recipe with method 'bfs' must rank NODE uuids
    (reference node_bfs_search returns entity nodes at depth 1..max),
    never the edge uuids the edges-channel bfs arm collects
    (VERDICT r03 missing #2)."""
    from graphiti_spark.search import hybrid as H

    # path a-b-c-d plus an off-component edge x-y
    edges = _edges_df(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    )
    cfg = H.SearchConfig(nodes=H.ChannelConfig(["bfs"], "rrf"))
    nodes = spark.createDataFrame(
        [(u, f"node {u}", "g", f"summary {u}", None)
         for u in ["a", "b", "c", "d", "x", "y"]],
        "uuid string, name string, group_id string, summary string, "
        "name_embedding array<float>",
    )
    out = H.search(
        "ignored", cfg, nodes=nodes, edges=edges, origin_uuids=["a"]
    )["nodes"]
    ids = {r.id for r in out.collect()}
    node_ids = {r.uuid for r in nodes.collect()}
    assert ids <= node_ids  # node uuids only — no eN edge ids
    assert ids == {"b", "c", "d"}  # depth 1..3 from a; origin excluded

    # the edges channel keeps its edge-uuid semantics
    cfg_e = H.SearchConfig(edges=H.ChannelConfig(["bfs"], "rrf"))
    edge_corpus = edges.withColumn(
        "fact_embedding", F.lit(None).cast("array<float>")
    )
    out_e = H.search(
        "ignored", cfg_e, edges=edge_corpus, origin_uuids=["a"]
    )["edges"]
    ids_e = {r.id for r in out_e.collect()}
    assert ids_e <= {r.uuid for r in edges.collect()}


def test_cross_encoder_recipes_carry_bfs_method():
    """The reference's three cross_encoder recipes list bfs as a THIRD
    retrieval method (search_config_recipes.py:84-97,143-149,188-194);
    the other 14 don't. Inert without origin_uuids, so recipe outputs
    for origin-less callers are unchanged."""
    from graphiti_spark.search import hybrid as H

    assert H.EDGE_HYBRID_SEARCH_CROSS_ENCODER.edges.methods == [
        "bm25", "cosine", "bfs"
    ]
    assert H.NODE_HYBRID_SEARCH_CROSS_ENCODER.nodes.methods == [
        "bm25", "cosine", "bfs"
    ]
    cc = H.COMBINED_HYBRID_SEARCH_CROSS_ENCODER
    assert cc.edges.methods == ["bm25", "cosine", "bfs"]
    assert cc.nodes.methods == ["bm25", "cosine", "bfs"]
    for r in (
        H.EDGE_HYBRID_SEARCH_RRF, H.EDGE_HYBRID_SEARCH_MMR,
        H.EDGE_HYBRID_SEARCH_NODE_DISTANCE,
        H.EDGE_HYBRID_SEARCH_EPISODE_MENTIONS,
    ):
        assert r.edges.methods == ["bm25", "cosine"]


def test_multiprobe_candidates_superset_and_recall(spark):
    """Multi-probe candidates are a SUPERSET of single-probe (base
    buckets are always probed), so recall vs brute force can only go
    up; on the corpus, 8-table multiprobe must reach at least 8-table
    single-probe recall."""
    from pyspark.sql import functions as F

    from graphiti_spark.search.similarity import (
        cosine_topk,
        cosine_topk_lsh,
        cosine_topk_lsh_multiprobe,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    brute = {r["id"] for r in cosine_topk(emb, q, limit=10).collect()}
    single = {
        r["id"]
        for r in cosine_topk_lsh(
            emb, q, limit=10, n_tables=8, n_bits=8
        ).collect()
    }
    multi = {
        r["id"]
        for r in cosine_topk_lsh_multiprobe(
            emb, q, limit=10, n_tables=8, n_bits=8, n_probe_bits=2
        ).collect()
    }
    assert len(multi & brute) >= len(single & brute)


def test_knn_graph_and_mutual_pairs(spark):
    """Hand-checked: two tight bundles; within a bundle everyone is
    everyone's neighbour (mutual), across bundles nothing pairs; a
    singleton cell emits no edges."""
    from pyspark.sql import functions as F

    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.search.similarity import knn_graph, mutual_nn_pairs

    rows = [
        (1, [10.0, 0.0]), (2, [10.0, 0.5]), (3, [10.0, 1.0]),
        (4, [0.0, 10.0]), (5, [0.5, 10.0]),
        (6, [-10.0, -10.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = literal_df(
        spark,
        [(100, [1.0, 0.0]), (200, [0.0, 1.0]), (300, [-1.0, -1.0])],
        [("cid", "bigint"), ("cvec", "array<double>")],
    )
    knn = knn_graph(emb, k=2, centroids=cents)
    by_id = {}
    for r in knn.collect():
        by_id.setdefault(r["id"], set()).add(r["nbr"])
    assert by_id[1] == {2, 3} and by_id[4] == {5} and 6 not in by_id
    mutual = sorted(
        (r["a_id"], r["b_id"]) for r in mutual_nn_pairs(knn).collect()
    )
    assert mutual == [(1, 2), (1, 3), (2, 3), (4, 5)]
