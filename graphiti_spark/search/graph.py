"""Graph traversal + graph-based rerankers (SURVEY.md G5–G9).

Reference:
  - BFS edge/node search bounded at depth ≤3 (`edge_bfs_search`
    /root/reference/graphiti_core/search/search_utils.py:433-553,
    `node_bfs_search` :767-852, MAX_SEARCH_DEPTH :66).
  - node_distance_reranker: score 1/dist, 1-hop neighbors dist 1,
    center 0.1 (search_utils.py:1751-1802).
  - episode_mentions_reranker: MENTIONS count (search_utils.py:1805-1835).
  - get_mentioned_nodes / get_communities_by_nodes (:128-167).

Spark formulation: BFS = iterative frontier joins (one shuffle per
level, ≤3 levels); the frontier is usually tiny vs the edge table so
each hop broadcasts the frontier, never re-shuffling the edges. At
cluster scale the edge table would be bucketed by source_node_uuid so
hops co-locate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.config import MAX_SEARCH_DEPTH


def undirected_adjacency(edges: DataFrame) -> DataFrame:
    """edges → (src, dst) symmetric adjacency (G1 projection without
    weights)."""
    fwd = edges.select(
        F.col("source_node_uuid").alias("src"), F.col("target_node_uuid").alias("dst")
    )
    return fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def bfs_nodes(
    edges: DataFrame,
    origin_uuids: list[str],
    max_depth: int = MAX_SEARCH_DEPTH,
) -> DataFrame:
    """Bounded BFS from origin uuids over the undirected entity graph.
    Output (uuid, depth) with depth = shortest hop distance (origins
    depth 0). Each level: broadcast-join current frontier against the
    adjacency, anti-join already-visited."""
    from graphiti_spark.functions.smalldf import literal_df

    spark = edges.sparkSession
    adj = undirected_adjacency(edges)
    visited = literal_df(
        spark,
        [(u, 0) for u in sorted(set(origin_uuids))],
        [("uuid", "string"), ("depth", "int")],
    )
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.join(
                F.broadcast(frontier.select(F.col("uuid").alias("src"))), "src"
            )
            .select(F.col("dst").alias("uuid"))
            .distinct()
            .join(F.broadcast(visited.select("uuid")), "uuid", "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=True)  # cut lineage per level
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def bfs_edges(
    edges: DataFrame,
    origin_uuids: list[str],
    max_depth: int = MAX_SEARCH_DEPTH,
) -> DataFrame:
    """Edges reachable within max_depth hops: an edge qualifies when its
    source sits at depth < max_depth (reference collects edges walked by
    the BFS, search_utils.py:433-553)."""
    nodes = bfs_nodes(edges, origin_uuids, max_depth)
    reach = nodes.filter(F.col("depth") < max_depth).select(
        F.col("uuid").alias("source_node_uuid")
    )
    sym = edges.select("uuid", "source_node_uuid", "target_node_uuid").union(
        edges.select(
            "uuid",
            F.col("target_node_uuid").alias("source_node_uuid"),
            F.col("source_node_uuid").alias("target_node_uuid"),
        )
    )
    return (
        sym.join(F.broadcast(reach), "source_node_uuid")
        .select("uuid")
        .distinct()
        .join(edges, "uuid")
    )


def node_distance_rerank(
    candidates: DataFrame,
    edges: DataFrame,
    center_uuid: str,
    id_col: str = "uuid",
) -> DataFrame:
    """score = 1/dist; direct neighbors of center get dist 1, center
    itself dist 0.1, everything else ∞→score 0 (reference
    search_utils.py:1751-1802 keeps them last; we emit score 0.0).
    Output: (id, score, rank within candidates)."""
    neighbors = undirected_adjacency(edges).filter(F.col("src") == center_uuid)
    scored = (
        candidates.select(F.col(id_col).alias("id"))
        .join(
            F.broadcast(neighbors.select(F.col("dst").alias("id"))).withColumn(
                "is_nbr", F.lit(True)
            ),
            "id",
            "left",
        )
        .withColumn(
            "score",
            F.when(F.col("id") == center_uuid, F.lit(10.0))  # 1/0.1
            .when(F.col("is_nbr"), F.lit(1.0))
            .otherwise(F.lit(0.0)),
        )
        .drop("is_nbr")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return scored.select("id", "score", F.row_number().over(w).alias("rank"))


def episode_mentions_rerank(
    candidates: DataFrame,
    mention_edges: DataFrame,
    id_col: str = "uuid",
) -> DataFrame:
    """score = MENTIONS count per candidate entity (reference
    search_utils.py:1805-1835). Output (id, score, rank)."""
    counts = mention_edges.groupBy(F.col("entity_uuid").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("score")
    )
    scored = (
        candidates.select(F.col(id_col).alias("id"))
        .join(counts, "id", "left")
        .fillna({"score": 0.0})
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return scored.select("id", "score", F.row_number().over(w).alias("rank"))


def get_mentioned_nodes(
    mention_edges: DataFrame, nodes: DataFrame, episode_uuids: list[str]
) -> DataFrame:
    """G8: entities mentioned by the given episodes (reference
    search_utils.py:128-146)."""
    hits = (
        mention_edges.filter(F.col("episode_uuid").isin(episode_uuids))
        .select(F.col("entity_uuid").alias("uuid"))
        .distinct()
    )
    return nodes.join(F.broadcast(hits), "uuid")


def neighbor_weights(edges: DataFrame) -> DataFrame:
    """G1: symmetric neighbor projection with RELATES_TO edge counts
    (reference community_operations.py:29-83). Output (src, dst,
    weight)."""
    fwd = edges.select(
        F.col("source_node_uuid").alias("src"), F.col("target_node_uuid").alias("dst")
    )
    sym = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        sym.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
