"""Bi-temporal edge invalidation as window functions (SURVEY.md T1–T3;
north_star: "temporal edge invalidation (valid_at/invalid_at intervals
keyed by warc_ts) reproduced as window functions over edge history").

Reference semantics (edge_operations.py:406-441, 619-639):
  - a contradicting edge with a LATER valid_at closes the earlier edge:
    earlier.invalid_at := later.valid_at, earlier.expired_at := now (T1);
    the same rule applied to the new edge itself is T2 — in batch mode all
    edges flow through one uniform window, so T1/T2 collapse into one rule.
  - intervals already disjoint are skipped (the strictly-greater check);
  - any edge with invalid_at set but no expired_at gets expired_at := now
    (T3, edge_operations.py:622-623).
  - the deterministic contradiction set (replacing the LLM's
    contradicted_facts, SURVEY.md D18): same (group_id, subject, predicate)
    with a different object — merged edges within that partition are
    guaranteed distinct objects/facts, so "next distinct valid_at in the
    partition" is exactly the invalidation instant.

Scale/skew: a naive window over (group, src, pred) puts every fact about a
hub subject in one partition. Instead the successor instant is computed on
DISTINCT (keys, valid_at) rows — the timestamp skyline — which is bounded
by distinct timestamps, not by fan-out, then broadcast-joined back. The
distinct aggregation does map-side partial combining, so hub keys never
concentrate raw rows on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def invalidate_edges(edges: DataFrame, run_ts) -> DataFrame:
    """edges(… group_id, source_node_uuid, name, valid_at …) →
    + invalid_at (next distinct valid_at within (group, subject, predicate))
    + expired_at (run_ts where invalid_at was set)."""
    keys = ["group_id", "source_node_uuid", "name"]

    skyline = edges.select(*keys, "valid_at").distinct()
    w = Window.partitionBy(*keys).orderBy("valid_at")
    successor = skyline.withColumn("invalid_at", F.lead("valid_at").over(w))

    out = edges.join(successor, keys + ["valid_at"], "left")
    return out.withColumn(
        "expired_at",
        F.when(F.col("invalid_at").isNotNull(), F.lit(run_ts)).otherwise(
            F.lit(None).cast("timestamp")
        ),
    )


def episode_context_window(episodes: DataFrame, last_n: int = 3) -> DataFrame:
    """Previous-episode context (SURVEY.md S3/T5; reference
    graph_data_operations.py:61-120): for each episode, the ≤ last_n
    episodes in the same group with strictly earlier valid_at, returned
    with rank 1 = most recent. Self-join bounded by last_n via row_number.

    Output: (episode_uuid, prev_episode_uuid, rank).

    Implemented as lag(1..n) over one window instead of a per-episode
    self-join: a group's whole history never materializes as a cross
    product, so the cost is O(n · last_n) regardless of group size.
    Ties on valid_at are broken by uuid (the reference's LIMIT over an
    ORDER BY is equally arbitrary under ties).
    """
    w = Window.partitionBy("group_id").orderBy("valid_at", "uuid")
    # Window exprs can't sit inside a generator projection — compute the
    # lag array first, posexplode in a second select.
    lagged = episodes.select(
        F.col("uuid").alias("episode_uuid"),
        F.array(*[F.lag("uuid", k).over(w) for k in range(1, last_n + 1)]).alias(
            "prevs"
        ),
    )
    exploded = lagged.select(
        "episode_uuid",
        F.posexplode("prevs").alias("rank0", "prev_episode_uuid"),
    )
    return exploded.filter(F.col("prev_episode_uuid").isNotNull()).select(
        "episode_uuid",
        "prev_episode_uuid",
        (F.col("rank0") + 1).alias("rank"),
    )
