"""Deterministic corpus sampling and training-mixture construction.

The reference (peabodyAdmin/graphiti) has no corpus-sampling layer —
like textstats.py / curation.py these extend the engine for the 100 TB
training-data use case (SURVEY §2 "beyond the reference" family): a
web-text corpus is down-sampled per stratum (language, source domain,
quality band) to hit a target token mixture before training, and
filtered to a quality quantile.

Every random draw is a pure function of (seed, row id): the uniform
``u`` is the first 13 hex chars (52 bits — exact in a double) of
``sha256("{seed}:{id}")`` mapped to [0, 1), the same construction the
ANN-LSH hyperplanes use (search/similarity.py), so DuckDB oracles
recompute draws bit-identically and re-runs / resumed jobs keep the
same sample without any shuffled RNG state.

Scale notes:
  - ``sample_fraction`` / ``sample_stratified`` are per-row column
    expressions — whole-stage codegen, no shuffle, no UDF: at 100 TB
    they run inside the scan's stage and prune rows before anything
    downstream shuffles.
  - ``mixture_rates`` is one map-side-combinable groupBy whose output
    is |strata| rows (bounded by the ``targets`` dict, NOT the corpus),
    so ``mix_corpus``'s rate join is an honest forced broadcast — the
    same bounded-by-construction case as curation.decontaminate.
  - ``filter_by_quantile`` windows per stratum: exact quantiles
    parallelize across strata (language × domain at web scale). The
    unstratified form is a single-partition window — use it only on
    bounded candidate sets (rerank outputs), never the raw corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2**52 — a 13-hex-digit value fits a double exactly, so Spark and
# DuckDB derive bit-identical uniforms from their own sha256.
UNIFORM_DENOM = 4503599627370496.0


def uniform_hash_col(id_col: Column, seed: str = "sample") -> Column:
    """Deterministic uniform draw in [0, 1): 52 bits of
    sha256('{seed}:{id}') over 2**52. Content-derived, so the draw is
    stable across runs, partitionings, and engines."""
    h = F.sha2(F.concat(F.lit(f"{seed}:"), id_col.cast("string")), 256)
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(
        UNIFORM_DENOM
    )


def sample_fraction(
    docs: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Keep each row iff its uniform draw < ``fraction``. Output: the
    input columns plus ``u`` (the draw). Shuffle-free codegen."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return docs.withColumn(
        "u", uniform_hash_col(F.col(id_col), seed)
    ).filter(F.col("u") < fraction)


def sample_stratified(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    seed: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum keep rates as a literal CASE chain (no join at all —
    ``rates`` is a driver-side dict by construction). Strata absent
    from ``rates`` keep ``default_rate`` (0 = dropped). Output: input
    columns + ``u``. Shuffle-free codegen."""
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1]")
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(
            rate
        )
    return docs.withColumn(
        "u", uniform_hash_col(F.col(id_col), seed)
    ).filter(F.col("u") < rate)


def mixture_rates(
    docs: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    stratum_col: str,
    token_count_col: str,
) -> DataFrame:
    """Per-stratum sampling rates that realize a token mixture: stratum
    s should contribute ``budget_tokens * targets[s]`` tokens, so
    ``rate(s) = min(1, budget*target / tokens(s))`` (capped when the
    stratum is smaller than its target share — the under-supplied case
    a mixture report must surface, not silently rescale). Rates are
    rounded to 6 dp BEFORE use so the keep predicate is bit-identical
    across engines. Output (stratum, n_docs, n_tokens, target_share,
    rate) — |targets| rows."""
    tgt = F.create_map(
        *[F.lit(x) for kv in sorted(targets.items()) for x in kv]
    )
    return (
        docs.filter(F.col(stratum_col).isin(*targets.keys()))
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(token_count_col)).cast("long").alias("n_tokens"),
        )
        .select(
            "stratum",
            "n_docs",
            "n_tokens",
            tgt[F.col("stratum")].cast("double").alias("target_share"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(budget_tokens))
                    * tgt[F.col("stratum")]
                    / F.col("n_tokens").cast("double"),
                ),
                6,
            ).alias("rate"),
        )
    )


def mix_corpus(
    docs: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    stratum_col: str,
    token_count_col: str,
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Down-sample ``docs`` to a target token mixture: compute
    ``mixture_rates`` (one bounded agg), broadcast the |targets|-row
    rate table back onto the corpus, keep rows whose draw < rate.
    Output (id, stratum, n_tokens, u, rate) for kept rows."""
    rates = mixture_rates(
        docs, targets, budget_tokens, stratum_col, token_count_col
    )
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(stratum_col).alias("stratum"),
            F.col(token_count_col).cast("long").alias("n_tokens"),
            uniform_hash_col(F.col(id_col), seed).alias("u"),
        )
        .join(F.broadcast(rates.select("stratum", "rate")), "stratum")
        .filter(F.col("u") < F.col("rate"))
        .select("id", "stratum", "n_tokens", "u", "rate")
    )


def filter_by_quantile(
    scored: DataFrame,
    q: float,
    score_col: str,
    id_col: str = "id",
    stratum_col: str | None = None,
) -> DataFrame:
    """Keep rows whose score sits at or above the ``q`` quantile of
    their stratum (ascending percent_rank ≥ q, so q=0.75 keeps the top
    quartile). Ties share a percent_rank, so a tied score is kept or
    dropped as a block — deterministic regardless of row order. Scores
    should be pre-rounded (quality_score rounds to 4 dp) so ties are
    exact. Output: input columns + ``pr``."""
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    part = [F.col(stratum_col)] if stratum_col else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(F.col(score_col).asc())
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= q)
    )


def split_by_cluster(
    assignments: DataFrame,
    ratios: dict[str, float],
    cluster_col: str = "canonical_id",
    seed: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: every row is assigned to a
    split by a deterministic uniform draw on its CLUSTER id (the
    near-dup canonical from ``canonical_docs``), never its own id — so
    an entire near-duplicate cluster lands in exactly one split and no
    test document has a near-duplicate twin in train (the classic
    eval-contamination hazard; the reference has no corpus-splitting
    layer, this extends the engine for the training-data use case like
    the rest of this module).

    ``ratios`` maps split name → fraction in iteration order; fractions
    must be non-negative and sum to 1. Boundaries accumulate in IEEE
    doubles, so an oracle that writes the same running sum (e.g.
    ``u < 0.9 + 0.05``) lands on bit-identical literals.

    Output: input columns + ``u`` (the cluster draw) + ``split``.
    Pure per-row codegen — no shuffle beyond whatever produced the
    cluster column; at 100 TB this runs inside the scan stage.
    """
    names = list(ratios)
    fracs = [float(ratios[n]) for n in names]
    if len(names) < 2:
        raise ValueError("need at least two splits")
    if any(f < 0.0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError("ratios must be non-negative and sum to 1")
    u = uniform_hash_col(F.col(cluster_col), seed=seed)
    w = None
    acc = 0.0
    for n, f in zip(names[:-1], fracs[:-1]):
        acc += f
        w = (F.when if w is None else w.when)(u < F.lit(acc), F.lit(n))
    return assignments.withColumn("u", u).withColumn(
        "split", w.otherwise(F.lit(names[-1]))
    )


def split_leakage(
    split_df: DataFrame, cluster_col: str = "canonical_id"
) -> DataFrame:
    """Audit for ``split_by_cluster``: clusters whose members straddle
    more than one split (must be empty — a row here is a leak). One
    map-side-combinable groupBy over |clusters| keys."""
    return (
        split_df.groupBy(cluster_col)
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "id",
    seed: str = "cap",
) -> DataFrame:
    """Hard per-group quota: keep at most ``n`` rows per group (domain
    balancing / anti-spam — a single link-farm host must not dominate
    the corpus regardless of its size, which a RATE cannot guarantee).
    The kept rows are the n smallest deterministic uniforms (ties
    broken by id), so the survivor set is a pure function of
    (seed, ids) — stable across runs, partitionings, and engines.
    Output: input columns + ``u``; one per-group window, parallel
    across groups (domains at web scale are plentiful; a pathological
    mega-group bounds one partition at |group| — cap it upstream with
    a coarser group key if a single key exceeds executor memory)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    u = uniform_hash_col(F.col(id_col), seed=seed)
    w = Window.partitionBy(group_col).orderBy(
        F.col("u").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("u", u)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def epoch_order(
    df: DataFrame,
    n_shards: int,
    id_col: str = "id",
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic training-order assignment: every row gets a
    ``shard`` (content-hash modulo ``n_shards`` — the data-loader
    worker that reads it) and ``pos`` (its position within the shard,
    ordered by an independent uniform draw, ties by id). Changing
    ``seed`` reshuffles both assignments — one seed per epoch gives
    epoch-wise reshuffling without any mutable RNG state, and a resumed
    job regenerates the identical order.

    Scale: the position window partitions BY SHARD, so ordering
    parallelizes across shards (pick n_shards ≈ loader workers; each
    shard sorts |corpus|/n_shards rows) — never a corpus-wide
    single-partition sort."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    shard_u = uniform_hash_col(F.col(id_col), seed=f"{seed}:shard")
    pos_u = uniform_hash_col(F.col(id_col), seed=f"{seed}:pos")
    shard = F.floor(shard_u * n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.col("pos_u").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("pos_u", pos_u)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("pos_u")
    )
