"""Mergeable-sketch laws: KMV mergeability/partition-invariance and
the Misra-Gries superset guarantee behind exact heavy hitters."""

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.sketch import (
    _mg_fold,
    heavy_hitters,
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def values(spark):
    # 400 skewed values over 3 groups: v = i % (17 + 29*g) gives each
    # group a different true cardinality.
    rows = [
        (g, f"v{i % (17 + 29 * g)}") for g in range(3) for i in range(400)
    ]
    return spark.createDataFrame(rows, "g int, v string")


def test_kmv_merge_equals_whole(values):
    """Mergeability: sketch(A) ⊕ sketch(B) == sketch(A ∪ B) for any
    split — the law that makes the sketch shippable across shards."""
    k = 8
    h1 = values.filter(F.col("v") < "v3")
    h2 = values.filter(F.col("v") >= "v3")
    merged = kmv_estimate(
        kmv_merge(
            [kmv_sketch(h1, ["g"], "v", k), kmv_sketch(h2, ["g"], "v", k)],
            ["g"],
            k,
        ),
        ["g"],
        k,
    )
    whole = kmv_distinct(values, ["g"], "v", k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_kmv_partition_and_fanout_invariant(values):
    a = kmv_distinct(values.repartition(1), ["g"], "v", k=8, fanout=4)
    b = kmv_distinct(values.repartition(13), ["g"], "v", k=8, fanout=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmv_exact_below_k(values):
    """Fewer distinct values than k ⇒ the sketch degrades to the exact
    count (group 0 has 17 distinct values < k=32)."""
    est = {
        r["g"]: (r["n_kept"], r["est_distinct"])
        for r in kmv_distinct(values, ["g"], "v", k=32).collect()
    }
    assert est[0] == (17, 17.0)


def test_mg_fold_guarantee():
    """Batched MG undercounts any item by at most N/(m+1): an item with
    frequency above that threshold always survives."""
    # 1000 items: 'hot' appears 300x, 99 distinct cold fillers.
    seq = ["hot"] * 300 + [f"c{i % 99}" for i in range(700)]
    counts: dict = {}
    for i in range(0, len(seq), 50):  # fold in 20 batches
        batch = seq[i : i + 50]
        vals = {v: batch.count(v) for v in set(batch)}
        counts = _mg_fold(counts, list(vals), list(vals.values()), m=9)
    assert "hot" in counts
    assert counts["hot"] >= 300 - 1000 // 10  # undercount <= N/(m+1)
    assert len(counts) <= 9


def test_heavy_hitters_exact_and_partition_invariant(values):
    toks = values.select(F.col("v").alias("tok"))
    n = toks.count()
    exact = {
        (r["tok"], r["count"])
        for r in toks.groupBy("tok").count().collect()
        if r["count"] * 40 >= n
    }
    for parts in (1, 7):
        got = {
            (r["value"], r["cnt"])
            for r in heavy_hitters(
                toks.repartition(parts), "tok", 1, 40
            ).collect()
        }
        assert got == exact and len(got) > 0


def test_heavy_hitters_capacity_guard(values):
    with pytest.raises(ValueError):
        heavy_hitters(values, "v", 1, 100, capacity=10)


def test_kmv_jaccard_exact_when_union_below_k(spark):
    """|A ∪ B| < k ⇒ both sketches are the full hash sets and the
    estimate is the true Jaccard / intersection, exactly."""
    from graphiti_spark.operators.sketch import kmv_jaccard, kmv_sketch

    a_vals = [f"v{i}" for i in range(20)]
    b_vals = [f"v{i}" for i in range(10, 30)]  # |∩|=10, |∪|=30, J=1/3
    a = kmv_sketch(
        spark.createDataFrame([(v,) for v in a_vals], "v string"), [], "v", k=64
    )
    b = kmv_sketch(
        spark.createDataFrame([(v,) for v in b_vals], "v string"), [], "v", k=64
    )
    r = kmv_jaccard(a, b, [], 64).head()
    assert (r["n_common"], r["n_m"]) == (10, 30)
    assert r["jaccard_est"] == round(10 / 30, 4)
    assert r["est_union"] == 30.0
    assert r["est_intersection"] == round((10 / 30) * 30.0, 4)


def test_kmv_jaccard_estimates_in_sketch_regime(spark):
    """Union ≫ k: the estimate lands near the true Jaccard (k=256 ⇒
    |J−Ĵ| within ~4/√k of truth for this fixture) and the sketch-only
    path never touches corpus-sized state."""
    from graphiti_spark.operators.sketch import kmv_jaccard, kmv_sketch

    a_vals = [f"x{i}" for i in range(3000)]
    b_vals = [f"x{i}" for i in range(1500, 4500)]  # J = 1500/4500 = 1/3
    k = 256
    a = kmv_sketch(
        spark.createDataFrame([(v,) for v in a_vals], "v string"), [], "v", k=k
    )
    b = kmv_sketch(
        spark.createDataFrame([(v,) for v in b_vals], "v string"), [], "v", k=k
    )
    r = kmv_jaccard(a, b, [], k).head()
    assert r["n_m"] == k
    assert abs(r["jaccard_est"] - 1 / 3) < 4 / (k ** 0.5)
    assert abs(r["est_union"] - 4500) / 4500 < 0.25


# ---- bottom-k quantile sample sketch ----


@pytest.fixture(scope="module")
def measured(spark):
    # 3 groups × 400 rows; values are a deterministic spread so every
    # quantile has a known exact answer. ids are globally unique (the
    # disjointness the merge law assumes).
    rows = [
        (g, f"d{g}_{i}", float((i * 37) % 1000) / 10.0)
        for g in range(3)
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "g int, id string, x double")


def _exact_quantile(vals, q):
    import math

    vs = sorted(vals)
    rank = max(1, math.ceil(q * len(vs)))
    return vs[rank - 1]


def test_sample_sketch_merge_equals_whole(measured):
    from graphiti_spark.operators.sketch import (
        quantile_estimate,
        sample_merge,
        sample_sketch,
    )

    k = 16
    h1 = measured.filter(F.col("x") < 50.0)
    h2 = measured.filter(F.col("x") >= 50.0)
    merged = quantile_estimate(
        sample_merge(
            [
                sample_sketch(h1, ["g"], "id", "x", k),
                sample_sketch(h2, ["g"], "id", "x", k),
            ],
            ["g"],
            k,
        ),
        ["g"],
        [0.25, 0.5, 0.9],
    )
    whole = quantile_estimate(
        sample_sketch(measured, ["g"], "id", "x", k), ["g"], [0.25, 0.5, 0.9]
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_sample_merge_rejects_oversized_merge_k():
    """ADVICE r4: merging with a k larger than the sketches' build k
    silently returns an undersized sample (and quantile_estimate then
    misreads truncated groups as exact); with build_k supplied the
    mismatch fails loudly before any frame is touched."""
    import pytest

    from graphiti_spark.operators.sketch import sample_merge

    with pytest.raises(ValueError, match="exceeds the sketches' build k"):
        sample_merge([None], ["g"], k=32, build_k=16)


def test_sample_sketch_partition_and_fanout_invariant(measured):
    from graphiti_spark.operators.sketch import bottomk_quantiles

    a = bottomk_quantiles(
        measured.repartition(1), ["g"], "id", "x", [0.5], k=16, fanout=4
    )
    b = bottomk_quantiles(
        measured.repartition(13), ["g"], "id", "x", [0.5], k=16, fanout=64
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_quantiles_exact_below_k(measured):
    """n_rows ≤ k ⇒ the sample is the whole group: estimates must equal
    the exact order-statistic quantiles and carry exact=true."""
    from graphiti_spark.operators.sketch import bottomk_quantiles

    qs = [0.0, 0.1, 0.5, 0.75, 1.0]
    got = bottomk_quantiles(measured, ["g"], "id", "x", qs, k=512)
    rows = got.collect()
    by_g = {}
    for r in measured.collect():
        by_g.setdefault(r["g"], []).append(r["x"])
    assert all(r["exact"] for r in rows)
    for r in rows:
        assert r["n_sample"] == 400 and r["n_rows"] == 400
        assert r["est"] == round(_exact_quantile(by_g[r["g"]], r["q"]), 4)


def test_quantile_estimator_rank_arithmetic(spark):
    """Hand-checked: 4 values, q=0.5 → ceil(0.5·4)=2nd smallest; q=0
    clamps to the minimum; q=1 → the maximum."""
    from graphiti_spark.operators.sketch import bottomk_quantiles

    df = spark.createDataFrame(
        [("a", "i1", 10.0), ("a", "i2", 20.0), ("a", "i3", 30.0),
         ("a", "i4", 40.0)],
        "g string, id string, x double",
    )
    est = {
        r["q"]: r["est"]
        for r in bottomk_quantiles(
            df, ["g"], "id", "x", [0.0, 0.5, 1.0], k=8
        ).collect()
    }
    assert est == {0.0: 10.0, 0.5: 20.0, 1.0: 40.0}


def test_quantile_sampling_accuracy(measured):
    """k=64 over 400 rows: every estimate's true rank must sit within
    0.15 of the target quantile (deterministic draw, fixed fixture)."""
    from graphiti_spark.operators.sketch import bottomk_quantiles

    got = bottomk_quantiles(measured, ["g"], "id", "x", [0.25, 0.5, 0.9], k=64)
    by_g = {}
    for r in measured.collect():
        by_g.setdefault(r["g"], []).append(r["x"])
    for r in got.collect():
        assert not r["exact"] and r["n_sample"] == 64
        vs = sorted(by_g[r["g"]])
        true_rank = sum(1 for v in vs if v <= r["est"]) / len(vs)
        assert abs(true_rank - r["q"]) < 0.15, (r["g"], r["q"], true_rank)
