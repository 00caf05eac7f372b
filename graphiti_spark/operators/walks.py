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


def biased_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 2,
    ret_w: int = 1,
    near_w: int = 1,
    far_w: int = 1,
    seed: str = "n2v",
    src_col: str = "src",
    dst_col: str = "dst",
    max_neighbors: int | None = None,
) -> DataFrame:
    """node2vec second-order biased walks (Grover & Leskovec 2016).
    The step from ``cur`` (having arrived from ``prev``) weights each
    candidate neighbor: ``ret_w`` if candidate == prev (node2vec 1/p),
    ``near_w`` if candidate is also a neighbor of prev (distance 1),
    ``far_w`` otherwise (1/q). INTEGER weights keep the inverse-CDF
    cumsum exact, so both engines pick the same neighbor even at
    interval boundaries; express p=0.5, q=2 as (ret_w, near_w, far_w)
    = (4, 2, 1). ret_w == near_w == far_w degenerates to
    ``random_walks`` semantics (but not draw-identical: the hash
    stream differs). The first step has no prev and is uniform.
    Output (start, widx, path).

    Scale notes — second-order bias changes the cost model vs
    ``random_walks``:
      - Each step must score EVERY neighbor of cur conditioned on
        prev, so candidate expansion is O(Σ deg(cur)) rows per step —
        inherent to node2vec (its alias-table precompute is strictly
        worse at O(Σ_{(u,v)∈E} deg(v))). A walker on a hub explodes
        deg(hub) rows; ``max_neighbors`` caps the ranked adjacency
        (keeps the deg lowest-dst neighbors, deterministic) when hub
        degrees are unbounded.
      - Per step: adjacency hash join on cur, a (prev, cand) hash
        join against the distinct edge set for the distance-1 flag,
        and one (start, widx) window shuffle for the weighted cumsum
        — 3 shuffles/step, each referencing the walker frame once
        (linear plan growth).
      - Dead ends freeze the path (cur goes null, the single null
        candidate row wins its one-row window), matching
        ``random_walks``.
    """
    if walk_len < 1:
        raise ValueError("walk_len must be >= 1")
    if walks_per_node < 1:
        raise ValueError("walks_per_node must be >= 1")
    if min(ret_w, near_w, far_w) < 1:
        raise ValueError("weights must be integers >= 1")
    adj, deg = build_adjacency(edges, src_col, dst_col)
    if max_neighbors is not None:
        adj = adj.filter(F.col("rank") < max_neighbors)
        deg = deg.select(
            "src", F.least(F.col("deg"), F.lit(max_neighbors)).alias("deg")
        )
    eset = adj.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))

    # step 1: uniform (no prev yet) — the random_walks pick-then-probe
    starts = deg.select(F.col("src").alias("start"))
    walkers = starts.select(
        "start",
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias(
            "widx"
        ),
        F.col("start").alias("cur"),
        F.array(F.col("start")).alias("path"),
    )
    u1 = uniform_hash_col(
        F.concat_ws(":", F.col("start"), F.col("widx"), F.lit(1)), seed=seed
    )
    picked = (
        walkers.join(deg, walkers["cur"] == deg["src"], "left")
        .drop(deg["src"])
        .withColumn("pick", F.floor(u1 * F.col("deg")).cast("bigint"))
    )
    walkers = (
        picked.join(
            adj,
            (picked["cur"] == adj["src"]) & (picked["pick"] == adj["rank"]),
            "left",
        )
        .select(
            "start",
            "widx",
            F.col("cur").alias("prev"),
            F.col("dst").alias("cur"),
            F.when(
                F.col("dst").isNotNull(),
                F.concat(F.col("path"), F.array(F.col("dst"))),
            )
            .otherwise(F.col("path"))
            .alias("path"),
        )
    )

    for step in range(2, walk_len + 1):
        cand = (
            walkers.join(adj, walkers["cur"] == adj["src"], "left")
            .drop(adj["src"])
            .withColumnRenamed("dst", "cand")
        )
        near = cand.join(
            eset,
            (cand["prev"] == eset["e_src"]) & (cand["cand"] == eset["e_dst"]),
            "left",
        ).select(
            "start",
            "widx",
            "prev",
            "cur",
            "path",
            "cand",
            "rank",
            F.when(F.col("cand").isNull(), F.lit(1))
            .when(F.col("cand") == F.col("prev"), F.lit(ret_w))
            .when(F.col("e_src").isNotNull(), F.lit(near_w))
            .otherwise(F.lit(far_w))
            .cast("bigint")
            .alias("w"),
        )
        wk = Window.partitionBy("start", "widx")
        cum = near.select(
            "*",
            F.sum("w").over(wk.orderBy("rank")).alias("cum"),
            F.sum("w").over(wk).alias("tot"),
        )
        u = uniform_hash_col(
            F.concat_ws(":", F.col("start"), F.col("widx"), F.lit(step)),
            seed=seed,
        )
        t = F.floor(u * F.col("tot")).cast("bigint")
        walkers = (
            cum.filter((t >= F.col("cum") - F.col("w")) & (t < F.col("cum")))
            .select(
                "start",
                "widx",
                F.col("cur").alias("prev"),
                F.col("cand").alias("cur"),
                F.when(
                    F.col("cand").isNotNull(),
                    F.concat(F.col("path"), F.array(F.col("cand"))),
                )
                .otherwise(F.col("path"))
                .alias("path"),
            )
        )
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


def node_frequencies(pairs: DataFrame, col: str = "center") -> DataFrame:
    """Unigram node frequencies of a skip-gram corpus: (node, cnt).
    One combinable count shuffle."""
    return pairs.groupBy(F.col(col).alias("node")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def negative_samples(
    pairs: DataFrame,
    freqs: DataFrame,
    k: int = 2,
    seed: str = "neg",
    buckets_per_node: int = 1,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """``k`` deterministic negative samples per skip-gram pair, drawn
    from the unigram noise distribution P(node) ∝ cnt (word2vec's
    exponent-0.75 smoothing is deliberately NOT applied: integer
    weights keep the inverse-CDF arithmetic EXACT, so both engines pick
    the same node even at interval boundaries — pass any integer
    weight column to change the distribution). Output: the pair columns
    + (neg_idx, negative).

    Inverse-CDF sampling without a range join: the cumulative weight
    axis [0, total) is cut into fixed-width integer buckets
    (width = avg interval width / buckets_per_node); each node's
    interval is exploded onto the buckets it overlaps (≈1–2 rows per
    node), and a draw equi-joins on its target's bucket, then filters
    the handful of candidate intervals. A plain ``lo <= t < hi`` join
    would be a broadcast-nested-loop scan of the whole vocab per draw.

    The cumulative offsets use the two-pass prefix sum (hash-
    partitioned within-bucket window + a |buckets|-row bucket prefix
    broadcast back — the pack_sequences pattern), never a corpus-sized
    single-partition window. All boundary arithmetic is exact integer
    ``div`` on a deterministic 52-bit sha target, so the DuckDB twin
    re-derives every draw bit-identically.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    group = 4096  # prefix-sum grouping (NOT the weight-axis buckets)
    counts = freqs.select(
        "node",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.expr(f"CAST(node AS BIGINT) div {group}").alias("grp"),
    )
    wg = Window.partitionBy("grp").orderBy("node")
    in_grp = counts.withColumn("cum_in_grp", F.sum("cnt").over(wg))
    gtot = counts.groupBy("grp").agg(F.sum("cnt").alias("gtot"))
    wt = Window.orderBy("grp").rowsBetween(Window.unboundedPreceding, -1)
    goff = gtot.select(
        "grp", F.coalesce(F.sum("gtot").over(wt), F.lit(0)).alias("goff")
    )
    cum = in_grp.join(F.broadcast(goff), "grp").select(
        "node",
        "cnt",
        (F.col("goff") + F.col("cum_in_grp") - F.col("cnt")).alias("lo"),
        (F.col("goff") + F.col("cum_in_grp")).alias("hi"),
    )
    totals = cum.agg(
        F.max("hi").alias("total"), F.count(F.lit(1)).alias("n_vocab")
    )
    # fixed bucket width over the weight axis (≥1); a node's interval
    # overlaps buckets lo div W .. (hi-1) div W — ≈1–2 for the default
    width = F.greatest(
        F.lit(1).cast("bigint"),
        F.expr(f"total div (n_vocab * {buckets_per_node})"),
    )
    intervals = (
        cum.crossJoin(F.broadcast(totals))
        .withColumn("w", width)
        .select(
            "node",
            "lo",
            "hi",
            F.explode(
                F.sequence(
                    F.expr("lo div w"), F.expr("(hi - 1) div w")
                )
            ).alias("bucket"),
        )
    )
    draws = pairs.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_idx"),
    ).crossJoin(F.broadcast(totals))
    # draw identity: the pair's key columns + neg_idx (default = the
    # skip-gram pair identity; callers over other pair shapes pass
    # their own, e.g. contrastive mining's ["anchor", "pos"])
    kc = key_cols if key_cols is not None else [
        "start", "widx", "pos", "context",
    ]
    u = uniform_hash_col(
        F.concat_ws(":", *[F.col(c) for c in kc], F.col("neg_idx")),
        seed=seed,
    )
    draws = (
        draws.withColumn("t", F.floor(u * F.col("total")).cast("bigint"))
        .withColumn("w", width)
        .withColumn("bucket", F.expr("t div w"))
    )
    out_cols = list(pairs.columns) + ["neg_idx"]
    return (
        draws.join(intervals, "bucket")
        .filter((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        .select(*out_cols, F.col("node").alias("negative"))
    )
