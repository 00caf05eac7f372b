"""Deterministic k-means: exact-integer mean accumulation (the
order-independence contract) and Lloyd refinement behavior."""

from pyspark.sql import functions as F

from graphiti_spark.operators.kmeans import kmeans_lloyd, mean_pool


def test_mean_pool_partitioning_invariant(spark):
    """The whole point of the 1e-9 integer-unit accumulation: identical
    bits no matter how the input is partitioned."""
    rows = [
        (i % 3, [float((i * 37 + d) % 100) / 7.0 for d in range(8)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g int, vec array<float>")
    a = sorted(map(tuple, mean_pool(df.repartition(1), ["g"], "vec").collect()))
    b = sorted(map(tuple, mean_pool(df.repartition(13), ["g"], "vec").collect()))
    assert a == b


def test_mean_pool_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0, -6.0])],
        "g int, vec array<float>",
    )
    out = {r["g"]: (r["cvec"], r["n_members"]) for r in
           mean_pool(df, ["g"], "vec").collect()}
    assert out == {1: ([2.0, 3.0], 2), 2: ([5.0, -6.0], 1)}


def test_kmeans_separable_clusters_converge(spark):
    """Two orthogonal direction bundles; after 2 rounds each centroid
    is the exact mean of its bundle and members split correctly."""
    rows = (
        [(i, [10.0 + (i % 3), 0.1 * (i % 3), 0.0]) for i in range(12)]
        + [(100 + i, [0.1 * (i % 3), 7.0 + (i % 3), 0.0]) for i in range(12)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_lloyd(df, n_cells=2, n_iter=2).collect()
    assert sorted(r["n_members"] for r in cents) == [12, 12]
    for r in cents:
        v = r["cvec"]
        # each centroid points into exactly one bundle's quadrant
        assert (v[0] > 1.0) != (v[1] > 1.0)


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    """A seeded centroid that wins no points (duplicate direction,
    larger cid loses min-cid ties) must survive with n_members=0 and
    its vector unchanged — no silent respawn."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.9, 0.02])],
        "vec_id long, embedding array<float>",
    )
    init = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [1.0, 0.0])],  # identical -> 20 starves
        "cid long, cvec array<double>",
    )
    out = {r["cid"]: r for r in
           kmeans_lloyd(df, n_iter=1, init=init).collect()}
    assert out[20]["n_members"] == 0 and out[20]["cvec"] == [1.0, 0.0]
    assert out[10]["n_members"] == 3


def test_trained_centroids_full_recall_on_clustered_data(spark):
    """On genuinely clustered vectors, 2 Lloyd rounds align the cells
    with the bundles: probing ONE cell already recovers the full
    brute-force top-10 for an in-bundle query (the scan-fraction win
    IVF training buys at corpus scale)."""
    from graphiti_spark.search.similarity import cosine_topk, cosine_topk_ivf

    rows = []
    for b, base in enumerate([[10.0, 0.0, 0.0], [0.0, 10.0, 0.0],
                              [0.0, 0.0, 10.0]]):
        for i in range(20):
            v = [x + 0.05 * ((i * 7 + d) % 5) for d, x in enumerate(base)]
            rows.append((b * 100 + i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_lloyd(emb, n_cells=3, n_iter=2)
    q = [10.0, 0.1, 0.1]
    brute = [r["id"] for r in cosine_topk(emb, q, limit=10).collect()]
    ivf = [
        r["id"]
        for r in cosine_topk_ivf(
            emb, q, limit=10, n_probe=1, centroids=cents
        ).collect()
    ]
    assert set(ivf) == set(brute) and len(ivf) == 10


def test_mean_state_fold_law(spark):
    """finalize(merge(state(A), state(B))) == mean_pool(A ∪ B) exactly
    — the integer-unit sums make prototype updates associative, so a
    standing state absorbs new batches without re-reading the corpus."""
    from graphiti_spark.operators.kmeans import (
        mean_state,
        mean_state_finalize,
        mean_state_merge,
        mean_pool,
    )

    rows = [
        (i % 4, [float((i * 31 + d * 7) % 97) / 9.0 for d in range(6)])
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "g int, vec array<float>")
    a, b = df.filter("g IS NOT NULL AND vec[0] < 5"), df.filter(
        "vec[0] >= 5"
    )
    folded = mean_state_finalize(
        mean_state_merge(
            [mean_state(a, ["g"], "vec"), mean_state(b, ["g"], "vec")],
            ["g"],
        ),
        ["g"],
    )
    whole = mean_pool(df, ["g"], "vec")
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_mean_state_three_way_merge_associative(spark):
    from graphiti_spark.operators.kmeans import (
        mean_state,
        mean_state_finalize,
        mean_state_merge,
    )

    rows = [(0, [float(i), float(-i)]) for i in range(30)]
    df = spark.createDataFrame(rows, "g int, vec array<float>")
    thirds = [df.filter(f"vec[0] % 3 = {k}") for k in range(3)]
    states = [mean_state(t, ["g"], "vec") for t in thirds]
    left = mean_state_merge(
        [mean_state_merge(states[:2], ["g"]), states[2]], ["g"]
    )
    right = mean_state_merge(
        [states[0], mean_state_merge(states[1:], ["g"])], ["g"]
    )
    l = mean_state_finalize(left, ["g"]).collect()
    r = mean_state_finalize(right, ["g"]).collect()
    assert sorted(map(tuple, l)) == sorted(map(tuple, r))
    assert l[0]["cvec"] == [14.5, -14.5] and l[0]["n_members"] == 30


def test_mean_state_subtract_is_exact_takedown(spark):
    """subtract(state(A ∪ B), state(B)) == state(A) bit-for-bit — the
    exact-integer sums make removal a subtraction, no rebuild; a group
    fully removed disappears."""
    from graphiti_spark.operators.kmeans import (
        mean_state,
        mean_state_finalize,
        mean_state_subtract,
    )

    rows = [
        (i % 3, i, [float((i * 13 + d) % 50) / 3.0 for d in range(5)])
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "g int, i int, vec array<float>")
    keep, gone = df.filter("i % 4 <> 0"), df.filter("i % 4 = 0")
    repaired = mean_state_subtract(
        mean_state(df, ["g"], "vec"),
        mean_state(gone, ["g"], "vec"),
        ["g"],
    )
    direct = mean_state(keep, ["g"], "vec")
    assert sorted(map(tuple, repaired.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # full-group removal: group 0 rows all removed -> row disappears
    g0_gone = df.filter("g = 0")
    left = mean_state_subtract(
        mean_state(df, ["g"], "vec"),
        mean_state(g0_gone, ["g"], "vec"),
        ["g"],
    )
    assert sorted(r["g"] for r in left.collect()) == [1, 2]
    # finalize of the repaired state equals the direct mean
    assert sorted(
        map(tuple, mean_state_finalize(repaired, ["g"]).collect())
    ) == sorted(map(tuple, mean_state_finalize(direct, ["g"]).collect()))


def test_mean_state_merge_keeps_null_group_keys(spark):
    """NULL is a legal grouping value: a nullable-label prototype must
    survive the shard merge (a join-based merge would silently drop it
    — null never equi-matches null)."""
    from graphiti_spark.operators.kmeans import (
        mean_state,
        mean_state_finalize,
        mean_state_merge,
        mean_pool,
    )

    df = spark.createDataFrame(
        [(None, [1.0, 2.0]), (None, [3.0, 4.0]), ("a", [5.0, 6.0])],
        "g string, vec array<float>",
    )
    halves = [df.limit(0), df]  # degenerate split incl. an empty state
    folded = mean_state_finalize(
        mean_state_merge(
            [mean_state(h, ["g"], "vec") for h in halves], ["g"]
        ),
        ["g"],
    )
    whole = mean_pool(df, ["g"], "vec")
    got = sorted(map(tuple, folded.collect()), key=str)
    assert got == sorted(map(tuple, whole.collect()), key=str)
    assert {r[0] for r in got} == {None, "a"}


def test_mean_state_subtract_null_group_and_unknown_group(spark):
    """Takedown applies to NULL-keyed groups too, and a removal for a
    group the state never saw is ignored (no negative ghost rows)."""
    from graphiti_spark.operators.kmeans import (
        mean_state,
        mean_state_subtract,
    )

    df = spark.createDataFrame(
        [(None, [2.0]), (None, [4.0]), ("a", [6.0])],
        "g string, vec array<float>",
    )
    gone = spark.createDataFrame(
        [(None, [2.0]), ("zzz", [9.0])], "g string, vec array<float>"
    )
    out = {
        r["g"]: (r["sums"], r["n"])
        for r in mean_state_subtract(
            mean_state(df, ["g"], "vec"),
            mean_state(gone, ["g"], "vec"),
            ["g"],
        ).collect()
    }
    assert set(out) == {None, "a"}
    assert int(out[None][0][0]) == 4_000_000_000 and out[None][1] == 1
