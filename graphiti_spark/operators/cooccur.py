"""Co-occurrence analytics over grouped item sets: pair counts, lift
association scores, and exact triangle counting with degree-ordered
orientation.

The reference (peabodyAdmin/graphiti) derives entity relatedness from
LLM-extracted facts only; a corpus-scale KG additionally wants the
distributional signal — which items appear together more often than
chance (lift) and how clustered the resulting graph is (triangles).
These are the classic market-basket / graph-statistics operators a
100 TB pipeline runs over (order, product), (episode, entity) or
(document, shingle) tables (SURVEY §2 "beyond the reference" family).

Scale notes:
  - ``cooccurrence_pairs`` aggregates each group to a sorted distinct
    item array (map-side combinable) and emits pairs per row — the
    quadratic blow-up is bounded by ``max_per_group`` (deterministic:
    the smallest items win, never a sample), so a pathological group
    (one order with 10^5 items) cannot explode the shuffle. The pair
    count shuffle keys on the (a, b) pair — uniform content keys.
  - ``lift_scores`` adds two item-keyed joins (marginal counts) and a
    1-row group-count broadcast; no driver collect.
  - ``triangle_count`` uses the degree-ordered orientation: every
    undirected edge points from its lexicographically smaller
    (degree, id) endpoint, so each node's OUT-degree is O(sqrt(m))
    and wedge generation is O(m^1.5) total — the hub-safe algorithm
    (a naive neighbor self-join is quadratic in the hub degree).
    All arithmetic is exact integers; results are engine-portable.

Determinism: counts and triangles are exact; ``lift`` is one IEEE
double division of exact integers (bit-identical across engines).
PMI = ln(lift) is left to the consumer — cross-engine log parity is
not guaranteed to the last ulp, ratios are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooccurrence_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_per_group: int | None = None,
) -> DataFrame:
    """Undirected co-occurrence counts: c_ab = number of groups whose
    distinct item set contains both a and b (a < b). Output
    (a, b, c_ab), filtered to ``c_ab >= min_count``.

    ``max_per_group`` keeps only each group's ``max_per_group``
    smallest items (deterministic truncation) before pairing —
    the cap that makes the per-group quadratic safe at scale."""
    its = F.array_sort(F.collect_set(F.col(item_col)))
    grouped = df.groupBy(F.col(group_col).alias("g")).agg(its.alias("its"))
    if max_per_group is not None:
        grouped = grouped.select(
            "g", F.slice(F.col("its"), 1, max_per_group).alias("its")
        )
    arr = F.col("its")
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(
                    arr,
                    i + F.lit(2),
                    F.greatest(F.lit(0), F.size(arr) - i - F.lit(1)),
                ),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )


def lift_scores(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_per_group: int | None = None,
) -> DataFrame:
    """Association lift per co-occurring pair:

        lift(a, b) = (c_ab * N) / (c_a * c_b)

    where N = distinct groups and c_x = groups containing x (the
    marginals are computed over the UNCAPPED item sets, so a capped
    pair generation never inflates lift). lift > 1 means a and b
    co-occur more often than independence predicts; PMI = ln(lift).
    Output (a, b, c_ab, c_a, c_b, lift)."""
    pairs = cooccurrence_pairs(
        df, group_col, item_col, min_count, max_per_group
    )
    gi = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).distinct()
    marg = gi.groupBy("i").agg(F.count(F.lit(1)).alias("c"))
    n = gi.select(F.countDistinct("g").alias("n"))
    return (
        pairs.join(marg.select(F.col("i").alias("a"), F.col("c").alias("c_a")), "a")
        .join(marg.select(F.col("i").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "c_ab",
            "c_a",
            "c_b",
            (
                (F.col("c_ab") * F.col("n")).cast("double")
                / (F.col("c_a") * F.col("c_b")).cast("double")
            ).alias("lift"),
        )
    )


def _und_deg(edges: DataFrame, a_col: str, b_col: str):
    """Canonical undirected distinct edge set (self-loops dropped) and
    per-node degrees over it — the shared base of triangle_count and
    local_clustering."""
    a, b = F.col(a_col), F.col(b_col)
    und = (
        edges.select(
            F.least(a, b).alias("u"), F.greatest(a, b).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("id"))
        .unionAll(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    return und, deg


def triangle_count(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Exact per-node triangle counts over an undirected (multi)edge
    list (self-loops and duplicate/reversed edges collapse first).
    Output (id, n_triangles) for every node on >= 1 triangle.

    Degree-ordered orientation: each edge points from the smaller
    (degree, id) endpoint, capping out-degrees at O(sqrt(m)); wedges
    are generated on out-neighbor pairs and closed against the
    canonical undirected edge set. Three shuffles (degree count,
    wedge join, closing join), all on uniform node/pair keys."""
    und, deg = _und_deg(edges, a_col, b_col)
    withdeg = (
        und.join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dv")), "v")
    )
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = withdeg.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("y"),
    )
    o1 = oriented.select(F.col("x"), F.col("y").alias("y1"))
    o2 = oriented.select(F.col("x"), F.col("y").alias("y2"))
    wedges = o1.join(o2, "x").filter(F.col("y1") < F.col("y2"))
    tri = wedges.join(
        und.select(F.col("u").alias("y1"), F.col("v").alias("y2")),
        ["y1", "y2"],
    )
    return (
        tri.select(
            F.explode(
                F.array(F.col("x"), F.col("y1"), F.col("y2"))
            ).alias("id")
        )
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def local_clustering(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Local clustering coefficient per node: lcc = 2·T(v) / (d·(d−1))
    — the fraction of a node's neighbor pairs that are themselves
    connected. A per-node graph feature (spam/link-farm neighborhoods
    cluster abnormally; organic hubs don't), exact integers into one
    IEEE division, 4 dp. Nodes of degree < 2 get lcc 0.0.

    Cost = triangle_count (degree-ordered orientation, hub-safe) plus
    one left join of its per-node counts back onto the degree table.
    Output (id, degree, n_triangles, lcc) for EVERY node of the
    undirected simple graph."""
    und, deg = _und_deg(edges, a_col, b_col)
    tri = triangle_count(edges, a_col, b_col)
    d = F.col("d")
    t = F.coalesce(F.col("n_triangles"), F.lit(0))
    lcc = F.when(
        d >= 2,
        F.round(
            F.lit(2.0) * t.cast("double") / (d * (d - 1)).cast("double"), 4
        )
        + F.lit(0.0),
    ).otherwise(F.lit(0.0))
    return deg.join(tri, "id", "left").select(
        "id",
        d.cast("long").alias("degree"),
        t.cast("long").alias("n_triangles"),
        lcc.alias("lcc"),
    )
