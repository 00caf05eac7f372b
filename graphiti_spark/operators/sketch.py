"""Mergeable corpus-statistics sketches: KMV distinct-count and
Misra-Gries heavy hitters with an exact verification pass.

A 100 TB corpus job constantly needs "how many distinct X per group"
and "which values dominate" — but a global ``groupBy(value)`` carries
the full key universe through the shuffle (token vocab at web scale is
billions of keys). The two operators here bound that:

  - **KMV (k-minimum-values)** distinct sketch: per group keep the k
    smallest 52-bit content hashes of the distinct values; the
    estimator is the classic (k-1)/u_(k) (Bar-Yossef et al. 2002).
    The sketch is MERGEABLE — the global k smallest distinct hashes
    are always a subset of the union of per-shard k-minima — so
    partial sketches combine associatively across partitions, days,
    or clusters (law-tested in tests/test_sketch.py). Shuffle payload
    per group is ≤ fanout × k doubles, independent of cardinality.
  - **Misra-Gries heavy hitters + exact recount**: pass 1 folds each
    partition through a capacity-m MG summary (mapInPandas, Arrow
    batches — the ONE deliberate Python stage, existing to bound the
    shuffle: ≤ m candidates per partition instead of the vocabulary).
    Guarantee: any value with global share > 1/(m+1) survives some
    partition's summary, so with m ≥ ceil(2/s) the candidate union is
    a SUPERSET of every value with share ≥ s. Pass 2 semi-joins the
    corpus against the (bounded) candidate set and recounts EXACTLY,
    filtering with integer arithmetic cnt·den ≥ N·num — so the final
    answer is deterministic and partitioning-independent even though
    the intermediate MG survivors are not (the oracle exploits this:
    DuckDB computes the exact threshold query with no sketch at all).

Determinism: hashes are 52 bits of sha256 over the value (the
``sampling.uniform_hash_col`` construction — exact in a double, DuckDB
recomputes them natively); estimates round to 4 dp with the +0.0
IEEE -0 normalization used across the oracle suite.
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graphiti_spark.operators.sampling import uniform_hash_col


def _kmin(col: Column, k: int) -> Column:
    """k smallest distinct doubles of an array column."""
    return F.slice(F.array_sort(F.array_distinct(col)), 1, k)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    seed: str = "kmv",
    fanout: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: (group_cols..., kmins array<double>).

    Two-level build so no single aggregation state holds a group's
    full distinct set: level 1 aggregates per (group, value-hash
    bucket) — disjoint value ranges, each capped at k — level 2 merges
    the ≤ fanout bucket sketches. The result is invariant to both the
    bucketing and the input partitioning (each globally-k-smallest
    hash is k-smallest within its own bucket)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    u = uniform_hash_col(F.col(value_col), seed)
    bucket = F.pmod(F.xxhash64(F.col(value_col)), F.lit(fanout))
    l1 = (
        df.select(*group_cols, u.alias("u"), bucket.alias("b"))
        .groupBy(*group_cols, "b")
        .agg(_kmin(F.collect_set("u"), k).alias("kmins"))
    )
    return (
        l1.groupBy(*group_cols)
        .agg(_kmin(F.flatten(F.collect_list("kmins")), k).alias("kmins"))
    )


def kmv_merge(
    sketches: Iterable[DataFrame], group_cols: list[str], k: int
) -> DataFrame:
    """Merge partial KMV sketches (same group/k): union, re-minimize.
    Associative and commutative — the mergeability law the tests pin."""
    frames = list(sketches)
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    return (
        merged.select(*group_cols, F.explode("kmins").alias("u"))
        .groupBy(*group_cols)
        .agg(_kmin(F.collect_set("u"), k).alias("kmins"))
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group_cols..., n_kept, est_distinct). Fewer than k hashes ⇒ the
    sketch IS the distinct set (exact count); otherwise (k-1)/u_(k)."""
    n_kept = F.size("kmins")
    kth = F.element_at("kmins", k)
    est = F.when(n_kept < k, n_kept.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth
    )
    return sketch.select(
        *group_cols,
        n_kept.cast("long").alias("n_kept"),
        (F.round(est, 4) + F.lit(0.0)).alias("est_distinct"),
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    seed: str = "kmv",
    fanout: int = 64,
) -> DataFrame:
    """Sketch + estimate in one call (the common batch shape)."""
    return kmv_estimate(
        kmv_sketch(df, group_cols, value_col, k, seed, fanout),
        group_cols,
        k,
    )


def _mg_fold(counts: dict, values, weights, m: int) -> dict:
    """Fold one batch of (value, weight) into a capacity-m Misra-Gries
    summary. Truncation subtracts the (m+1)-th largest count from all
    entries and drops the non-positives: each truncation removes ≥
    (m+1)·t total mass, so cumulative undercount per item ≤ N_p/(m+1)."""
    for v, w in zip(values, weights):
        counts[v] = counts.get(v, 0) + int(w)
    if len(counts) > m:
        t = sorted(counts.values(), reverse=True)[m]
        counts = {v: c - t for v, c in counts.items() if c - t > 0}
    return counts


def mg_candidates(
    df: DataFrame, value_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra-Gries survivors (the bounded candidate set):
    one column ``value``, ≤ capacity rows per input partition."""
    import pandas as pd

    out_schema = f"value {dict(df.dtypes)[value_col]}"

    def fold(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counts: dict = {}
        for pdf in pdfs:
            vc = pdf[value_col].value_counts()
            counts = _mg_fold(counts, vc.index.tolist(), vc.values, capacity)
        yield pd.DataFrame({"value": list(counts.keys())})

    return df.select(value_col).mapInPandas(fold, out_schema)


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    share_num: int = 1,
    share_den: int = 100,
    capacity: int | None = None,
) -> DataFrame:
    """Exact heavy hitters: every value with share ≥ share_num/share_den
    of the corpus, with its EXACT count. Output (value, cnt, share).

    Pass 1 bounds the shuffle (MG candidates, superset guarantee needs
    capacity ≥ 2·den/num — enforced); pass 2 recounts candidates
    exactly (broadcast semi-join, ≤ capacity × n_partitions keys) and
    filters with integer arithmetic, so the result is deterministic
    regardless of partitioning or MG internals."""
    if not 0 < share_num <= share_den:
        raise ValueError("share must be in (0, 1]")
    min_cap = math.ceil(2 * share_den / share_num)
    if capacity is None:
        capacity = min_cap
    if capacity < min_cap:
        raise ValueError(
            f"capacity {capacity} breaks the superset guarantee; "
            f"need >= {min_cap} for share {share_num}/{share_den}"
        )
    cand = mg_candidates(df, value_col, capacity).distinct()
    total = F.broadcast(df.agg(F.count(value_col).alias("n_total")))
    counted = (
        df.join(
            F.broadcast(cand),
            df[value_col] == cand["value"],
            "leftsemi",
        )
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(total)
        .filter(
            F.col("cnt") * F.lit(share_den)
            >= F.col("n_total") * F.lit(share_num)
        )
        .select(
            F.col(value_col).alias("value"),
            F.col("cnt").cast("long").alias("cnt"),
            (
                F.round(
                    F.col("cnt").cast("double") / F.col("n_total"), 4
                )
                + F.lit(0.0)
            ).alias("share"),
        )
    )


def kmv_jaccard(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    group_cols: list[str],
    k: int,
) -> DataFrame:
    """Cross-corpus overlap from two KMV sketches (Beyer et al. 2007,
    SIGMOD — "On synopses for distinct-value estimation under multiset
    operations"): with M = the k smallest distinct hashes of the UNION
    of the two sketches, Jaccard ≈ |{m ∈ M present in both sketches}|
    / |M|, and est_intersection = jaccard · est_union. This answers
    "how much does the new crawl overlap the training corpus?" from
    two bounded sketches — no join over either corpus, mergeable
    across shards/days like the sketches themselves.

    When |A ∪ B| < k both sketches are the exact hash sets and the
    estimate is exact. Output (group_cols..., n_common, n_m,
    jaccard_est, est_union, est_intersection); suffix `_a`/`_b` join,
    inner — a group must appear in both sketch tables."""
    a = sketch_a.select(*group_cols, F.col("kmins").alias("ka"))
    b = sketch_b.select(*group_cols, F.col("kmins").alias("kb"))
    j = a.join(b, group_cols) if group_cols else a.crossJoin(b)
    m = _kmin(F.concat(F.col("ka"), F.col("kb")), k)
    common = F.size(
        F.array_intersect(F.array_intersect(m, F.col("ka")), F.col("kb"))
    )
    n_m = F.size(m)
    jac = common.cast("double") / n_m
    est_union = F.when(n_m < k, n_m.cast("double")).otherwise(
        F.lit(float(k - 1)) / F.element_at(m, k)
    )
    return j.select(
        *group_cols,
        common.cast("long").alias("n_common"),
        n_m.cast("long").alias("n_m"),
        (F.round(jac, 4) + F.lit(0.0)).alias("jaccard_est"),
        (F.round(est_union, 4) + F.lit(0.0)).alias("est_union"),
        (F.round(jac * est_union, 4) + F.lit(0.0)).alias(
            "est_intersection"
        ),
    )


def sample_sketch(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int = 256,
    seed: str = "qsk",
    fanout: int = 64,
) -> DataFrame:
    """Per-group bottom-k uniform sample for quantile estimation:
    (group_cols..., sample array<struct<u double, v double>>, n_rows).

    The k rows with the smallest content-hash draws u = sha52(seed:id)
    are a simple random sample WITHOUT replacement of the group — the
    classic bottom-k construction — so the sample's order statistics
    estimate the group's quantiles with no global sort and shuffle
    payload ≤ fanout × k structs per group, independent of group size.
    Same two-level build as the KMV sketch (disjoint id-hash buckets,
    each capped at k, then a bounded merge): the result is invariant
    to bucketing and input partitioning because a globally-bottom-k
    draw is bottom-k within its own bucket.

    MERGEABLE across corpus shards with DISJOINT ids (the only shape a
    sharded corpus has): union the samples, keep the k smallest by u,
    add n_rows — law-tested in tests/test_sketch.py. Merging sketches
    whose id sets OVERLAP: sample_merge dedups identical (u, v) structs
    so the shared rows don't occupy two bottom-k slots, but n_rows
    still double-counts them — treat overlap merges as approximate.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    u = uniform_hash_col(F.col(id_col), seed)
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(fanout))
    pair = F.struct(
        u.alias("u"), F.col(value_col).cast("double").alias("v")
    )
    l1 = (
        df.select(*group_cols, pair.alias("p"), bucket.alias("b"))
        .groupBy(*group_cols, "b")
        .agg(
            F.slice(F.array_sort(F.collect_list("p")), 1, k).alias(
                "sample"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return l1.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("sample"))), 1, k
        ).alias("sample"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


def sample_merge(
    sketches: Iterable[DataFrame],
    group_cols: list[str],
    k: int,
    build_k: int | None = None,
) -> DataFrame:
    """Merge partial bottom-k samples built over DISJOINT id sets:
    union, keep the k smallest by u, sum exact row counts. The
    array_distinct collapses identical (u, v) structs so an
    overlapping-id merge doesn't burn two sample slots on one row
    (n_rows still double-counts overlap — see sample_sketch).

    CONTRACT: ``k`` must not exceed the k the partials were BUILT with
    — a partial already truncated to build_k < k cannot supply the
    merge's missing rows, so the merged sample silently comes back
    smaller than requested and quantile_estimate then misreads
    truncated groups as 'exact' (ADVICE r4). Pass ``build_k`` (the
    build-time k, if the caller knows it) to turn that degradation
    into a loud ValueError."""
    if build_k is not None and k > build_k:
        raise ValueError(
            f"merge k={k} exceeds the sketches' build k={build_k}: a "
            "bottom-k sample cannot be widened after truncation — "
            "rebuild the partials with the larger k"
        )
    frames = list(sketches)
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    return merged.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("sample")))
            ),
            1,
            k,
        ).alias("sample"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


def quantile_estimate(
    sketch: DataFrame, group_cols: list[str], qs: list[float]
) -> DataFrame:
    """Quantile estimates from a bottom-k sample sketch. Output one row
    per (group, q): (group_cols..., q, est, n_sample, n_rows, exact).

    Estimator: the ceil(q·n_sample)-th smallest sampled VALUE (rank
    clamped to [1, n_sample]) — the standard order-statistic estimate
    on a uniform sample. When n_rows ≤ k the sample IS the group and
    the estimate is the exact quantile (``exact`` = true). Estimates
    round to 4 dp with the IEEE −0 normalization the oracles expect."""
    for qv in qs:
        if not 0.0 <= qv <= 1.0:
            raise ValueError(f"quantile {qv} outside [0, 1]")
    values = F.array_sort(
        F.transform(F.col("sample"), lambda x: x["v"])
    )
    n_samp = F.size("sample")
    k_ref = F.col("n_rows") <= n_samp
    rows = sketch.select(
        *group_cols,
        values.alias("vals"),
        n_samp.cast("long").alias("n_sample"),
        "n_rows",
        k_ref.alias("exact"),
        F.explode(
            F.array(*[F.lit(float(qv)) for qv in qs])
        ).alias("q"),
    )
    rank = F.greatest(
        F.lit(1), F.ceil(F.col("q") * F.col("n_sample")).cast("int")
    )
    return rows.select(
        *group_cols,
        "q",
        (
            F.round(F.element_at("vals", rank), 4) + F.lit(0.0)
        ).alias("est"),
        "n_sample",
        "n_rows",
        "exact",
    )


def bottomk_quantiles(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    qs: list[float],
    k: int = 256,
    seed: str = "qsk",
    fanout: int = 64,
) -> DataFrame:
    """Sketch + estimate in one call (the common batch shape)."""
    return quantile_estimate(
        sample_sketch(df, group_cols, id_col, value_col, k, seed, fanout),
        group_cols,
        qs,
    )
