"""Deterministic k-means (Lloyd) refinement + per-group prototype
embeddings ("mean pooling") with exact-integer accumulation.

The IVF index (search/similarity.py ivf_centroids) deliberately ships
hash-picked centroids for reproducibility and notes "swap in k-means
offline if needed — the probe/assign contract is unchanged". This
module is that offline step, made engine-reproducible:

  - **The mean is the only k-means step that is order-sensitive.**
    Summing IEEE doubles across partitions gives different bits for
    different aggregation orders, so a naive Lloyd iteration is not
    replayable. Here every component quantizes HALF_UP to 1e-9 integer
    units first and accumulates in decimal(38,0) (exact, associative,
    partitioning-independent — the pagerank/sessionization integer-sum
    house pattern), then divides ONCE in double and rounds 4 dp.
  - Assignment reuses ivf_assign's broadcast-argmax cosine (raw-double
    zip_with math, bit-identical to DuckDB's list_inner_product; ties
    → min centroid id), so the whole iteration is a pure function of
    (corpus, n_cells, n_iter) that the oracle can unroll round by
    round.
  - Empty cells keep their previous centroid (no respawn heuristics —
    reproducibility over the last recall point, as with the hash pick).

Scale shape per iteration: one broadcast cross join (|corpus| × k) +
a combinable (cell, pos) sum shuffle of |corpus|·dim integer rows; the
centroid frame (k rows) is localCheckpointed each round so the plan
stays linear in n_iter (the k_core/incremental lineage rule).

``mean_pool`` stands alone as per-group prototype construction (class
centroids for contrastive training, cluster summaries for SemDeDup
reporting) with the same exact-accumulation guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.search.similarity import ivf_assign, ivf_centroids

# 1e-9 quantization: components round HALF_UP to integer units before
# the exact decimal sum. Rounding is away-from-zero for negatives in
# BOTH engines; products |x|·1e9 stay far under 2^53 so the half cases
# are exact doubles and round identically.
UNITS = 1_000_000_000.0


def mean_pool(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str,
    round_dp: int = 4,
) -> DataFrame:
    """Per-group elementwise mean embedding, order-independent.
    Vectors must share one dimension per group (embedding tables do).
    Output (group_cols..., cvec array<double>, n_members). Exactly
    ``mean_state_finalize(mean_state(...))`` — one arithmetic path, so
    the fold law can't drift from the one-pass form."""
    return mean_state_finalize(
        mean_state(df, group_cols, vec_col), group_cols, round_dp
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_iter: int = 2,
    init: DataFrame | None = None,
) -> DataFrame:
    """n_iter Lloyd rounds from the hash-picked seed (or ``init``
    (cid, cvec) to resume/continue a refinement). Output
    (cid, cvec array<double>, n_members) — cid keeps the seed identity
    so cluster labels are stable across refinement rounds; drop-in for
    ivf_assign/cosine_topk_ivf ``centroids``."""
    cents = (
        init.select("cid", "cvec")
        if init is not None
        else ivf_centroids(df, id_col, vec_col, n_cells)
    )
    for _ in range(n_iter):
        assigned = ivf_assign(df, cents, id_col, vec_col)
        means = mean_pool(
            assigned.select(F.col("cell").alias("cid"), "vec"),
            ["cid"],
            "vec",
        )
        cents = (
            cents.select("cid", F.col("cvec").alias("prev"))
            .join(means, "cid", "left")
            .select(
                "cid",
                F.coalesce(F.col("cvec"), F.col("prev")).alias("cvec"),
                F.coalesce(F.col("n_members"), F.lit(0))
                .cast("long")
                .alias("n_members"),
            )
            .localCheckpoint()
        )
    return cents


def mean_state(
    df: DataFrame, group_cols: list[str], vec_col: str
) -> DataFrame:
    """The mergeable sufficient statistic behind ``mean_pool``:
    (group_cols..., sums array<decimal(38,0)> of 1e-9 integer units,
    n long). Because the units are exact integers, states merge
    ASSOCIATIVELY — add the sums, add the counts — so per-shard /
    per-day partial states fold into the same prototype as one pass
    over the union (the mini-batch centroid-update path: a new batch
    updates standing prototypes without re-reading the corpus).
    Law-tested in tests/test_kmeans.py."""
    iv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(UNITS), 0).cast(
            "decimal(38,0)"
        ),
    )
    ex = df.select(*group_cols, F.posexplode(iv).alias("pos", "iv"))
    comp = ex.groupBy(*group_cols, "pos").agg(
        F.sum("iv").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return comp.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda x: x["s"],
        ).alias("sums"),
        F.max("n").cast("long").alias("n"),
    )


def mean_state_merge(
    states: list[DataFrame], group_cols: list[str]
) -> DataFrame:
    """Fold partial mean states: elementwise sum + count sum. Exact —
    no rounding happens until finalize. ONE groupBy (no join): NULL
    group keys are ordinary grouping values, so a nullable label can't
    silently lose its prototype (a join on the group would — null
    never equi-matches null). The zip_with fold over collected sum
    arrays is order-free because integer addition is associative."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    g = merged.groupBy(*group_cols).agg(
        F.collect_list("sums").alias("arrs"),
        F.sum("n").cast("long").alias("n"),
    )
    folded = F.aggregate(
        F.slice(
            F.col("arrs"), F.lit(2), F.greatest(F.size("arrs") - 1, F.lit(0))
        ),
        F.element_at("arrs", 1),
        lambda acc, a: F.zip_with(acc, a, lambda x, y: x + y),
    )
    return g.select(*group_cols, folded.alias("sums"), "n")


def mean_state_finalize(
    state: DataFrame, group_cols: list[str], round_dp: int = 4
) -> DataFrame:
    """State → the mean_pool output shape (group_cols..., cvec, 
    n_members): ONE double division chain per component, rounded
    ``round_dp`` dp with the IEEE −0 normalization."""
    cvec = F.transform(
        F.col("sums"),
        lambda s: F.round(
            (s.cast("double") / F.lit(UNITS)) / F.col("n"), round_dp
        )
        + F.lit(0.0),
    )
    return state.select(
        *group_cols,
        cvec.alias("cvec"),
        F.col("n").alias("n_members"),
    )


def mean_state_subtract(
    state: DataFrame, removed: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Takedown without rebuild: because the state is EXACT integer
    sums, removing documents is an exact elementwise subtraction —
    subtract(state(A ∪ B), state(B)) == state(A) bit-for-bit (law-
    tested), something an IEEE-double running mean can never offer.
    Groups whose count reaches zero are dropped; groups the removal
    never touches pass through unchanged, and removals for groups the
    state never saw are ignored (the caller's delta should be derived
    from the same corpus the state was built over). Implemented as the
    negated-state MERGE, so NULL group keys subtract correctly too."""
    neg = removed.select(
        *group_cols,
        F.transform(F.col("sums"), lambda s: -s).alias("sums"),
        (-F.col("n")).cast("long").alias("n"),
    )
    return mean_state_merge([state, neg], group_cols).filter(
        F.col("n") > 0
    )
