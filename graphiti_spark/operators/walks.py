"""Deterministic random-walk corpus generation (DeepWalk / node2vec
p=q=1 family, Perozzi et al. 2014): the standard way to turn a graph
into training sequences for embedding models — the graph-side analogue
of the token-window chunker in curation.py.

The reference (peabodyAdmin/graphiti) has no graph-ML export; this
extends the engine for the 100 TB training-data use case (SURVEY §2
"beyond the reference" graph family).

Determinism contract: the "random" neighbor choice at step ``s`` of
walk ``(start, widx)`` is ``floor(u * deg)`` where ``u`` is the
engine-portable 52-bit sha256 uniform (sampling.uniform_hash_col) of
``'{seed}:{start}:{widx}:{s}'`` and neighbors are ranked by dst asc —
so the full walk corpus is a pure function of (graph, seed), stable
across runs, partitionings, and engines (the DuckDB oracle re-derives
every step).

Scale notes:
  - Per step: TWO equi hash joins — walkers→degrees on the current
    node (compute the pick), then walkers→adjacency on (node, rank).
    Computing the pick BEFORE the adjacency join is the hub-safety
    move: joining on src alone and filtering rank inside the join
    would scan deg(hub) candidate rows per walker sitting on a hub;
    with (src, rank) as the key each walker probes exactly one row.
  - Walk state is one row per live walker with a growing id-array —
    O(walks · len) total, never materialized per-step beyond the
    frame itself. walk_len is a small constant; each iteration
    references the previous frame once, so the plan grows linearly
    (not the 3^rounds trap documented on k_core/incremental).
  - Dead ends (nodes with no out-edges) end the walk early: the walker
    row survives with its path frozen (left-join null guard), matching
    DeepWalk's truncated-walk semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import uniform_hash_col


def build_adjacency(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> tuple[DataFrame, DataFrame]:
    """(adjacency, degrees) for walk sampling. Adjacency is the
    DISTINCT edge set ranked per source by dst asc (rank 0..deg-1);
    degrees is one row per source. Multi-edges collapse (unweighted
    uniform choice over distinct neighbors)."""
    dedup = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    w = Window.partitionBy("src").orderBy(F.col("dst").asc())
    adj = dedup.withColumn(
        "rank", (F.row_number().over(w) - 1).cast("bigint")
    )
    deg = dedup.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    return adj, deg


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    seed: str = "walk",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """``walks_per_node`` truncated random walks of ``walk_len`` steps
    from every node with out-edges. Output (start, widx, path) where
    path is the visited id array (length 1 + steps taken; shorter when
    a dead end truncates the walk)."""
    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    adj, deg = build_adjacency(edges, src_col, dst_col)

    starts = deg.select(F.col("src").alias("start"))
    widx = F.explode(
        F.sequence(F.lit(0), F.lit(walks_per_node - 1))
    ).alias("widx")
    walkers = starts.select(
        "start",
        widx,
        F.col("start").alias("cur"),
        F.array(F.col("start")).alias("path"),
    )

    for step in range(1, walk_len + 1):
        u = uniform_hash_col(
            F.concat_ws(":", F.col("start"), F.col("widx"), F.lit(step)),
            seed=seed,
        )
        # pick first (degrees join), then a pure (node, rank) equi join
        picked = (
            walkers.join(deg, walkers["cur"] == deg["src"], "left")
            .drop(deg["src"])
            .withColumn(
                "pick",
                F.floor(u * F.col("deg")).cast("bigint"),
            )
        )
        stepped = (
            picked.join(
                adj,
                (picked["cur"] == adj["src"]) & (picked["pick"] == adj["rank"]),
                "left",
            )
            .select(
                "start",
                "widx",
                F.col("dst").alias("cur"),
                F.when(
                    F.col("dst").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("dst"))),
                )
                .otherwise(F.col("path"))
                .alias("path"),
            )
        )
        walkers = stepped
    return walkers.select("start", "widx", "path")


def skipgram_pairs(
    walks: DataFrame, window: int = 2, path_col: str = "path"
) -> DataFrame:
    """(center, context) training pairs from a walk corpus: every
    ordered pair of walk positions within ``window`` of each other
    (DeepWalk's skip-gram extraction). Output
    (start, widx, pos, center, context) — one row per pair.

    Shuffle-free: the context set of position i is sliced out of the
    path array itself (left and right window slices, self excluded),
    so the whole extraction is two nested explodes in one codegen
    stage — a self-join keyed by walk id would compute the same pairs
    at the cost of a shuffle. Work is O(walks · len · window)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    pos = walks.select(
        "start",
        "widx",
        F.col(path_col).alias("_p"),
        F.posexplode(F.col(path_col)).alias("pos", "center"),
    )
    i = F.col("pos")
    n = F.size("_p")
    lo = F.greatest(F.lit(0), i - window)  # 0-based window floor
    left_len = i - lo
    right_len = F.least(n - 1, i + window) - i
    ctxs = F.concat(
        F.slice("_p", lo + 1, left_len),  # slice() is 1-based
        F.slice("_p", i + 2, right_len),
    )
    return pos.select(
        "start",
        "widx",
        "pos",
        "center",
        F.explode(ctxs).alias("context"),
    )
