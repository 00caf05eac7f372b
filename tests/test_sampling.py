"""Deterministic sampling / mixture operators (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.sampling import (
    filter_by_quantile,
    mix_corpus,
    mixture_rates,
    sample_fraction,
    sample_stratified,
    uniform_hash_col,
)


def test_uniform_hash_is_deterministic_and_uniform(spark):
    ids = spark.range(2000)
    u1 = ids.select(uniform_hash_col(F.col("id"), "s1").alias("u"))
    stats = u1.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("m")
    ).head()
    assert 0.0 <= stats.lo and stats.hi < 1.0
    assert abs(stats.m - 0.5) < 0.02  # 2000 draws: sd of mean ~0.0065
    # same seed -> identical draws; different seed -> different draws
    again = ids.select(uniform_hash_col(F.col("id"), "s1").alias("u"))
    assert u1.exceptAll(again).count() == 0
    other = ids.select(uniform_hash_col(F.col("id"), "s2").alias("u"))
    assert u1.exceptAll(other).count() > 1900


def test_sample_fraction_rate_and_determinism(spark):
    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    kept = sample_fraction(docs, 0.25, seed="frac")
    n = kept.count()
    assert 400 <= n <= 600  # binomial(2000, .25): mean 500, sd ~19
    assert kept.filter(F.col("u") >= 0.25).count() == 0
    # re-running yields the identical sample (content-derived draws)
    again = sample_fraction(docs, 0.25, seed="frac")
    assert kept.exceptAll(again).count() == 0
    with pytest.raises(ValueError):
        sample_fraction(docs, 1.5)


def test_sample_stratified_honors_rate_map(spark):
    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a")
        .when(F.col("id") % 3 == 1, "b")
        .otherwise("c")
        .alias("src"),
    )
    kept = sample_stratified(
        docs, {"a": 1.0, "b": 0.3}, stratum_col="src", seed="st"
    )
    by = {r.src: r.n for r in kept.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert by["a"] == 1000  # rate 1.0 keeps everything
    assert 230 <= by["b"] <= 370
    assert "c" not in by  # absent from the rate map -> default 0


def test_mixture_rates_budget_and_cap(spark):
    # stratum a: 100 docs x 100 tokens = 10_000; b: 20 x 50 = 1_000
    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "a").otherwise("b").alias("src"),
        F.when(F.col("id") < 100, 100).otherwise(50).alias("n_tok"),
    )
    rates = {
        r.stratum: r
        for r in mixture_rates(
            docs, {"a": 0.5, "b": 0.5}, 4000, "src", "n_tok"
        ).collect()
    }
    assert rates["a"].n_docs == 100 and rates["a"].n_tokens == 10_000
    assert rates["a"].rate == pytest.approx(0.2)  # 2000 / 10_000
    assert rates["b"].rate == 1.0  # 2000 > 1_000 -> capped, under-supplied
    assert rates["a"].target_share == 0.5


def test_mix_corpus_hits_token_budget(spark):
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3000, "big").otherwise("small").alias("src"),
        F.lit(10).alias("n_tok"),
    )  # big: 30_000 tokens, small: 10_000
    kept = mix_corpus(
        docs, {"big": 0.8, "small": 0.2}, 10_000, "src", "n_tok", seed="m"
    )
    toks = {
        r.stratum: r.t
        for r in kept.groupBy("stratum").agg(F.sum("n_tokens").alias("t")).collect()
    }
    # big: rate 8000/30000 -> expect ~8000 tokens; small: 2000/10000 -> ~2000
    assert abs(toks["big"] - 8000) < 800
    assert abs(toks["small"] - 2000) < 450
    # draws below the stratum rate, never at/above
    assert kept.filter(F.col("u") >= F.col("rate")).count() == 0


def test_filter_by_quantile_per_stratum_with_tie_blocks(spark):
    rows = [
        # stratum x: distinct scores 1 < 2 < 3 < 4 -> pr 0, 1/3, 2/3, 1
        (1, "x", 1.0), (2, "x", 2.0), (3, "x", 3.0), (4, "x", 4.0),
        # stratum y: tie block below a single top -> pr 0, 0, 0, 1
        (5, "y", 5.0), (6, "y", 5.0), (7, "y", 5.0), (8, "y", 9.0),
    ]
    df = spark.createDataFrame(rows, "id long, s string, score double")
    kept = filter_by_quantile(df, 0.5, "score", stratum_col="s")
    ids = sorted(r.id for r in kept.collect())
    assert ids == [3, 4, 8]  # x keeps pr 2/3 and 1; y's tie block drops whole
    with pytest.raises(ValueError):
        filter_by_quantile(df, -0.1, "score")


def test_filter_by_quantile_global_when_unstratified(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, score double"
    )
    kept = filter_by_quantile(df, 0.75, "score")
    assert sorted(r.id for r in kept.collect()) == [7, 8, 9]  # pr 7/9..1


def test_split_by_cluster_is_leakage_free_and_ratioed(spark):
    from graphiti_spark.operators.sampling import split_by_cluster, split_leakage

    # 3000 docs in 1000 clusters of 3 (ids 3k, 3k+1, 3k+2 share cluster 3k)
    canon = spark.range(3000).select(
        F.col("id"),
        (F.col("id") - F.col("id") % 3).alias("canonical_id"),
    )
    out = split_by_cluster(
        canon, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t"
    )
    # no cluster straddles two splits
    assert split_leakage(out).count() == 0
    # ratios hold at cluster granularity (1000 clusters, sd ~13 for 0.8)
    sizes = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert 2250 <= sizes["train"] <= 2550
    assert 150 <= sizes["val"] <= 450 and 150 <= sizes["test"] <= 450
    assert sum(sizes.values()) == 3000
    # deterministic: identical re-run
    again = split_by_cluster(
        canon, {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t"
    )
    assert out.exceptAll(again).count() == 0
    with pytest.raises(ValueError):
        split_by_cluster(canon, {"train": 0.9, "val": 0.2})
    with pytest.raises(ValueError):
        split_by_cluster(canon, {"all": 1.0})


def test_split_leakage_flags_row_keyed_split(spark):
    from graphiti_spark.operators.sampling import split_by_cluster, split_leakage

    canon = spark.range(3000).select(
        F.col("id"),
        (F.col("id") - F.col("id") % 3).alias("canonical_id"),
    )
    # drawing on the row id (the WRONG key) must leak across clusters
    leaky = split_by_cluster(
        canon.withColumnRenamed("id", "row_id")
        .withColumnRenamed("canonical_id", "cid")
        .select(F.col("row_id").alias("id"), F.col("cid").alias("canonical_id")),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        cluster_col="id",  # row-keyed draw
        seed="t",
    )
    assert split_leakage(leaky).count() > 0


def test_cap_per_group_keeps_n_smallest_draws(spark):
    from graphiti_spark.operators.sampling import cap_per_group

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 2 == 0).cast("string").alias("g")
    )
    out = cap_per_group(df, "g", 10, seed="c")
    rows = out.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append((r["u"], r["id"]))
    assert all(len(v) == 10 for v in by_g.values())
    # survivors are exactly the 10 smallest (u, id) of each group
    full = df.withColumn(
        "u",
        __import__(
            "graphiti_spark.operators.sampling", fromlist=["uniform_hash_col"]
        ).uniform_hash_col(F.col("id"), seed="c"),
    ).collect()
    for g in ("true", "false"):
        want = sorted((r["u"], r["id"]) for r in full if r["g"] == g)[:10]
        assert sorted(by_g[g]) == want
    # a group smaller than n passes through whole
    tiny = spark.range(3).select(F.col("id"), F.lit("t").alias("g"))
    assert cap_per_group(tiny, "g", 10).count() == 3
    with pytest.raises(ValueError):
        cap_per_group(df, "g", 0)


def test_epoch_order_shards_and_positions(spark):
    from graphiti_spark.operators.sampling import epoch_order

    docs = spark.range(400)
    out = epoch_order(docs, n_shards=4, seed="e0").collect()
    shards = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        shards.setdefault(r["shard"], []).append(r["pos"])
    # positions are dense 0..k-1 within every shard
    for poss in shards.values():
        assert sorted(poss) == list(range(len(poss)))
    assert sum(len(v) for v in shards.values()) == 400
    # deterministic; a different epoch seed reshuffles
    a = {(r["id"], r["shard"], r["pos"]) for r in out}
    b = {
        (r["id"], r["shard"], r["pos"])
        for r in epoch_order(docs, n_shards=4, seed="e0").collect()
    }
    c = {
        (r["id"], r["shard"], r["pos"])
        for r in epoch_order(docs, n_shards=4, seed="e1").collect()
    }
    assert a == b and a != c
    with pytest.raises(ValueError):
        epoch_order(docs, n_shards=0)
