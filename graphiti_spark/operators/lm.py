"""Corpus-level language-model operators for training-data curation:
CCNet-style n-gram LM perplexity filtering and DSIR-style hashed-n-gram
importance weights.

Public-pipeline provenance (patterns, not code):
  - CCNet (Wenzek et al. 2020) trains a KenLM on a clean reference
    corpus (Wikipedia) and keeps the low-perplexity tail of the crawl.
    Here the LM is an add-alpha-smoothed bigram model trained as TWO
    Spark aggregations — deterministic, engine-reproducible, no
    external binary — and scoring is two shuffle joins against the
    model tables.
  - DSIR (Xie et al. 2023) weights raw docs by the log-ratio of
    hashed-n-gram feature probabilities under a target vs raw corpus,
    then resamples by weight. Buckets here are sha256-derived so the
    DuckDB oracle recomputes them bit-identically.

The reference (peabodyAdmin/graphiti) has no corpus-quality layer; these
extend the engine for the 100 TB web-text case (SURVEY §2 "beyond the
reference"), composing with sampling.filter_by_quantile for the actual
keep/drop decision.

Scale notes:
  - Training is corpus-scan + groupBy(gram): one shuffle each; counts
    are map-side combinable, so hot grams ("the the") combine before
    the exchange. Model size is bounded by the REFERENCE corpus (the
    curated clean set), not the crawl.
  - Scoring joins the exploded crawl gram stream to the model on the
    gram key: plain hash-shuffle joins (the model may exceed broadcast
    size; AQE converts when it doesn't). Per-doc reduction is again a
    combinable sum.
  - DSIR's bucket space is a CONSTANT (n_buckets), so its model is two
    n_buckets-row tables — always broadcastable; the crawl-side pass is
    one explode + one groupBy(doc, bucket) + one broadcast join.
  - Nothing here collects to the driver except the 1-row vocab size.

Determinism contract: tokens via textstats._tokens (the engine-wide
single-space contract), ln/exp in double on both engines, scores
rounded to 4 dp AFTER the full computation and normalized ``+ 0.0``
(BENCH/BASELINE.md tie rules).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens

ALPHA = 0.1  # add-alpha smoothing mass per bigram continuation
DSIR_BUCKETS = 64  # hashed feature space (DSIR uses 10k; oracle-sized here)
DSIR_SEED = "dsir"


def _bigram_stream(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair. Docs with <2
    tokens contribute nothing (callers re-attach them)."""
    toks = docs.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("t")
    ).filter(F.size("t") >= 2)
    n = F.size("t")
    pairs = F.arrays_zip(
        F.slice("t", 1, n - 1).alias("w1"),
        F.slice("t", 2, n - 1).alias("w2"),
    )
    return toks.select("id", F.explode(pairs).alias("p")).select(
        "id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


@dataclass
class BigramLM:
    """Add-alpha bigram model as three DataFrames (no driver state):
    bigram counts, prefix counts (sum of continuations per w1 — derived
    from the bigram table, no second corpus pass), and the 1-row
    reference vocabulary size."""

    bigrams: DataFrame  # (w1, w2, c12)
    prefixes: DataFrame  # (w1, c1)
    vocab: DataFrame  # (v) single row


def train_bigram_lm(
    ref_docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> BigramLM:
    big = _bigram_stream(ref_docs, id_col, text_col)
    bigrams = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    prefixes = bigrams.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        ref_docs.select(
            F.explode(_tokens(F.col(text_col))).alias("w")
        )
        .agg(F.countDistinct("w").alias("v"))
    )
    return BigramLM(bigrams=bigrams, prefixes=prefixes, vocab=vocab)


def perplexity(
    docs: DataFrame,
    lm: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
) -> DataFrame:
    """Per-doc bigram perplexity under the reference LM. Output
    (id, n_bigrams, ppl); ppl = exp(-sum ln P(w2|w1) / n_bigrams),
    P = (c12 + a) / (c1 + a*V) with c12, c1 = 0 for unseen grams
    (so an unseen prefix degrades to the uniform 1/V). Docs with <2
    tokens carry n_bigrams = 0 and ppl NULL.

    Two key-shuffle joins (bigram, prefix) + one combinable per-doc
    sum; the 1-row vocab is a broadcast cross join.
    """
    big = _bigram_stream(docs, id_col, text_col)
    joined = (
        big.join(lm.bigrams, ["w1", "w2"], "left")
        .join(lm.prefixes, ["w1"], "left")
        .crossJoin(F.broadcast(lm.vocab))
        .select(
            "id",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
                / (
                    F.coalesce(F.col("c1"), F.lit(0))
                    + F.lit(alpha) * F.col("v")
                )
            ).alias("lp"),
        )
    )
    scored = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("lp_sum")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            (
                F.round(
                    F.exp(-F.col("lp_sum") / F.col("n_bigrams")), 4
                )
                + F.lit(0.0)
            ).alias("ppl"),
        )
    )


def _feature_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    seed: str,
) -> DataFrame:
    """(id, bucket) — one row per unigram AND bigram occurrence,
    hashed into n_buckets via 52 sha256 bits (engine-reproducible;
    a production run swaps xxhash64 for the cheaper digest)."""
    uni = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("f"),
    )
    big = _bigram_stream(docs, id_col, text_col).select(
        "id", F.concat_ws(" ", "w1", "w2").alias("f")
    )
    # an empty text tokenizes to [''] under the engine-wide split
    # contract; '' is not a feature (matches the oracle's list_filter)
    feats = uni.unionByName(big).filter(F.col("f") != "")
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(f"{seed}:"), F.col("f")), 256), 1, 13
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    return feats.select("id", bucket.alias("bucket"))


def dsir_bucket_probs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """Add-one-smoothed bucket distribution of a corpus:
    (bucket, logp). Exactly n_buckets rows (absent buckets get the
    smoothing floor), so the result is always broadcastable."""
    counts = (
        _feature_stream(docs, id_col, text_col, n_buckets, seed)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    spark = docs.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").alias("bucket")
    )
    filled = all_buckets.join(counts, "bucket", "left").select(
        "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    total = filled.agg(F.sum("c").alias("tot"))
    return filled.crossJoin(F.broadcast(total)).select(
        "bucket",
        F.log(
            (F.col("c") + F.lit(1.0))
            / (F.col("tot") + F.lit(float(n_buckets)))
        ).alias("logp"),
    )


def dsir_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """Per-raw-doc DSIR importance log-weight:
    sum over feature occurrences of (log p_target(b) - log p_raw(b)).
    Output (id, n_feats, logw). Docs with zero features get logw 0.

    The two bucket tables are n_buckets rows — broadcast joins; the
    raw-side pass is one explode + combinable groupBy.
    """
    p_t = dsir_bucket_probs(target_docs, id_col, text_col, n_buckets, seed)
    p_r = dsir_bucket_probs(raw_docs, id_col, text_col, n_buckets, seed)
    ratio = p_t.select(
        "bucket", F.col("logp").alias("lp_t")
    ).join(
        p_r.select("bucket", F.col("logp").alias("lp_r")), "bucket"
    ).select("bucket", (F.col("lp_t") - F.col("lp_r")).alias("lr"))
    feats = _feature_stream(raw_docs, id_col, text_col, n_buckets, seed)
    scored = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr").alias("logw_sum"),
        )
    )
    return (
        raw_docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_feats"), F.lit(0))
            .cast("bigint")
            .alias("n_feats"),
            (
                F.round(F.coalesce(F.col("logw_sum"), F.lit(0.0)), 4)
                + F.lit(0.0)
            ).alias("logw"),
        )
    )
