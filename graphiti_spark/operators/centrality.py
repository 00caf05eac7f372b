"""Node-centrality metrics: exact fixed-point PageRank and degree
stats.

The reference (peabodyAdmin/graphiti) ranks retrieved nodes by query
relevance, not global importance; a KG built at 100 TB needs a
corpus-level salience signal (which entities matter) — the classic
iterate-join-aggregate PageRank, which is also exactly the shape Spark
scales: each iteration is one equi-join on the node id plus one
map-side-combinable sum, and at 1000 executors both shuffle on the same
uniform content-derived key every round.

Determinism: ranks live in integer units of 1e-12 (``SCALE``) and every
step is integer arithmetic — floor division for contribution splits and
damping — so results are bit-identical across engines, partitionings,
and retries; there is no floating accumulation order anywhere, which is
what lets a DuckDB oracle reproduce the fixpoint exactly. Floor
division leaks at most ``out_deg - 1`` rank units per split and
dangling nodes (no out-edges) drop their mass entirely — standard
simplifications; total rank stays <= 1 and the ORDER is what a salience
consumer uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12  # rank units per 1.0 — fits damping products in a long


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node out/in degree (multigraph counts). Output (id,
    out_deg, in_deg) — two map-side-combinable aggs, one join."""
    out = (
        edges.groupBy(F.col(src_col).alias("id"))
        .agg(F.count(F.lit(1)).alias("out_deg"))
    )
    inn = (
        edges.groupBy(F.col(dst_col).alias("id"))
        .agg(F.count(F.lit(1)).alias("in_deg"))
    )
    return (
        out.join(inn, "id", "full")
        .select(
            "id",
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias(
                "out_deg"
            ),
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias(
                "in_deg"
            ),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-point PageRank over a (multi)edge list.

    rank_u(v) starts at SCALE div n and each iteration computes

        rank_u(v) = ((den-num)*SCALE) div (den*n)
                  + (num * sum_{u->v} (rank_u(u) div out_deg(u))) div den

    entirely in bigint (``div`` = floor division on the positives).
    The vertex count enters the plan via a broadcast 1-row aggregate —
    no driver-side collect. Output (id, rank_u, rank) where rank =
    rank_u / SCALE as a display double.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(
        F.col(src_col).alias("id"), F.col(dst_col).alias("dst")
    )
    verts = (
        e.select("id")
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nf = F.broadcast(verts.agg(F.count(F.lit(1)).alias("n")))
    deg = e.groupBy("id").agg(F.count(F.lit(1)).alias("out_deg"))
    links = e.join(deg, "id")
    base_expr = f"({(damping_den - damping_num) * SCALE} div ({damping_den} * n))"
    ranks = verts.crossJoin(nf).select(
        "id", F.expr(f"{SCALE} div n").alias("rank_u")
    )
    for _ in range(iters):
        contrib = links.join(ranks, "id").select(
            F.col("dst").alias("id"),
            F.expr("rank_u div out_deg").alias("c"),
        )
        sums = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            verts.join(sums, "id", "left")
            .crossJoin(nf)
            .select(
                "id",
                F.expr(
                    f"{base_expr} + (({damping_num} * coalesce(s, 0L))"
                    f" div {damping_den})"
                ).alias("rank_u"),
            )
        )
    return ranks.select(
        "id",
        F.col("rank_u").cast("long").alias("rank_u"),
        (F.col("rank_u").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )
