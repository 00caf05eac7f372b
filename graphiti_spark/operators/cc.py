"""Connected components over a DataFrame of duplicate pairs
(SURVEY.md D13/D14; north_rule: "connected-components-based entity
canonicalization (large-star/small-star iterations on DataFrames)").

The reference canonicalizes alias→canonical chains with an in-memory
union-find (bulk_utils.py:69-98 directed, :498-535 undirected with
min-uuid root). That is driver-bound; at 10^12-document scale the dedup
pair set itself is distributed, so canonicalization runs as the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) expressed as plain
DataFrame ops:

  large-star: for each node u, attach every strictly-larger neighbor v to
              u's minimum neighbor m (including u): emit (v, m) for v > u
  small-star: attach u's minimum neighbor-or-self m to every neighbor
              v ≤ u (v ≠ m): emit (v, m), plus (u, m)

Iterate to fixpoint; afterwards every node points at the minimum id of
its component — exactly the reference's min-uuid root convention
(bulk_utils.py:513-517). Each iteration is two shuffles on node id;
`localCheckpoint` truncates the growing lineage. Skew note: hub
components concentrate on their minimum node; large-star halves long
chains logarithmically, and AQE skew-join splitting handles the residual
hot keys, so convergence is O(log n) iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(pairs: DataFrame) -> DataFrame:
    forward = pairs.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        forward.union(forward.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) symmetric → for each u: m = min(N(u) ∪ {u}); emit (v, m) for
    every neighbor v > u."""
    nbr_min = edges.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )
    return (
        edges.join(nbr_min, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to (larger → smaller), then per node u link all small
    neighbors (and u) to the minimum."""
    oriented = edges.filter(F.col("v") < F.col("u"))  # u > v: u's smaller nbrs
    nbr_min = oriented.groupBy("u").agg(F.min("v").alias("m"))
    link_nbrs = (
        oriented.join(nbr_min, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
    )
    link_self = nbr_min.select(F.col("u").alias("src"), F.col("m").alias("dst"))
    return (
        link_nbrs.union(link_self)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """pairs(src, dst) undirected → (uuid, canonical_uuid) for every node
    appearing in pairs, canonical = min id in its component.

    Isolated nodes (not in pairs) are absent; callers coalesce(canonical,
    own) after a left join — same contract as the reference's uuid_map.
    """
    # Materialize the (possibly expensive) pair plan EXACTLY ONCE:
    # checkpoint first, then probe emptiness on the checkpointed frame.
    # The previous order (full count for the emptiness probe, THEN an
    # eager checkpoint) evaluated an UNPERSISTED caller's entire pair
    # pipeline twice — the curation funnel measured its 83 s MinHash
    # stage 2× from exactly this (r5); persisted callers (the flagship
    # pipeline persists `pairs`) were shielded by the cache and are
    # unaffected by the reorder. isEmpty on a checkpointed frame is a
    # cheap take(1) over materialized partitions — the take-retry
    # UDF-re-run hazard the old comment guarded against is gone because
    # nothing upstream of the checkpoint can re-run.
    edges = _symmetrize(
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint(eager=True)
    if edges.isEmpty():
        spark = pairs.sparkSession
        # JVM-side empty frame — createDataFrame([]) builds a Python-RDD
        # plan whose 32 empty tasks each pay Python-worker spin-up.
        return spark.range(0).select(
            F.col("id").cast("string").alias("uuid"),
            F.col("id").cast("string").alias("canonical_uuid"),
        )

    def _fingerprint(df: DataFrame) -> tuple:
        """(row count, order-insensitive hash-sum) — one cheap agg job per
        iteration instead of two exceptAll scans for convergence testing."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: xxhash64 sums overflow long under ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    current = edges  # already checkpointed above
    prev_fp = _fingerprint(current)
    for _ in range(max_iterations):
        ls_sym = _symmetrize(_large_star(current))
        nxt = _symmetrize(_small_star(ls_sym)).localCheckpoint(eager=True)
        fp = _fingerprint(nxt)
        current = nxt
        if fp == prev_fp:
            break
        prev_fp = fp

    # After convergence each edge links a node to its component minimum.
    members = current.groupBy("u").agg(F.min("v").alias("m"))
    mapping = members.select(
        F.col("u").alias("uuid"),
        F.least(F.col("m"), F.col("u")).alias("canonical_uuid"),
    )
    return mapping


def build_directed_uuid_map(pairs: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Directed alias→canonical collapse (reference bulk_utils.py:69-98).

    The reference's directed union-find ultimately just merges the chain's
    connected component and picks the final find() root; with deterministic
    content-derived ids the undirected min-uuid component is the stable
    equivalent (the reference itself notes aliases may be lexicographically
    smaller than the canonical — determinism, not direction, is what the
    output contract needs). Returns (uuid, canonical_uuid) for all touched
    nodes, identity rows included.
    """
    mapping = connected_components(pairs, src=src, dst=dst)
    touched = (
        pairs.select(F.col(src).alias("uuid"))
        .union(pairs.select(F.col(dst).alias("uuid")))
        .distinct()
    )
    return touched.join(mapping, "uuid", "left").select(
        "uuid", F.coalesce("canonical_uuid", "uuid").alias("canonical_uuid")
    )
