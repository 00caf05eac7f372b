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


def invalidate_by_candidates(
    edges: DataFrame, candidates: DataFrame, run_ts
) -> DataFrame:
    """T4→T1 wiring: close edges against their contradiction CANDIDATES
    (either-endpoint sharers from edge_dedup.invalidation_candidates)
    under the reference truth table (edge_operations.py:406-441,
    FIXTURES.md §5):

      - pairs whose intervals are already disjoint are skipped
        (E.invalid_at ≤ N.valid_at, or N.invalid_at ≤ E.valid_at);
      - a candidate N with LATER valid_at closes E:
        E.invalid_at := N.valid_at, E.expired_at := run_ts (T3);
      - batch form: all pairs are evaluated against the INITIAL edge
        state in one synchronized round, and the EARLIEST closing
        instant wins (min over qualifying N.valid_at) — the
        deterministic equivalent of the reference's per-edge loop.

    Unlike invalidate_edges' same-(group, subject, predicate) window,
    candidates span predicates and either endpoint — a fact can be
    closed by a contradicting fact about the same entity under a
    different relation name.

    candidates: (new_uuid, candidate_uuid, …) — candidate_uuid is the
    edge being closed, new_uuid the potential closer. Pass the output of
    invalidation_candidates(edges, edges, …) for a full-batch pass.
    """
    e = edges.select(
        F.col("uuid").alias("candidate_uuid"),
        F.col("valid_at").alias("e_valid"),
        F.col("invalid_at").alias("e_invalid")
        if "invalid_at" in edges.columns
        else F.lit(None).cast("timestamp").alias("e_invalid"),
    )
    n = edges.select(
        F.col("uuid").alias("new_uuid"),
        F.col("valid_at").alias("n_valid"),
        F.col("invalid_at").alias("n_invalid")
        if "invalid_at" in edges.columns
        else F.lit(None).cast("timestamp").alias("n_invalid"),
    )
    pairs = candidates.select("new_uuid", "candidate_uuid").join(
        e, "candidate_uuid"
    ).join(n, "new_uuid")
    disjoint = (
        (F.col("e_invalid").isNotNull() & (F.col("e_invalid") <= F.col("n_valid")))
        | (F.col("n_invalid").isNotNull() & (F.col("n_invalid") <= F.col("e_valid")))
    )
    closing = (
        pairs.filter(~disjoint)
        .filter(
            F.col("e_valid").isNotNull()
            & F.col("n_valid").isNotNull()
            & (F.col("e_valid") < F.col("n_valid"))
        )
        .groupBy("candidate_uuid")
        .agg(F.min("n_valid").alias("closing_at"))
    )
    out = edges.join(
        closing.withColumnRenamed("candidate_uuid", "uuid"), "uuid", "left"
    )
    if "invalid_at" in edges.columns:
        # closing takes precedence: the reference OVERWRITES invalid_at
        # with the closer's valid_at (edge_operations.py:436), and the
        # disjointness guard guarantees every qualifying closer precedes
        # the existing invalid_at.
        out = out.withColumn(
            "invalid_at", F.coalesce(F.col("closing_at"), F.col("invalid_at"))
        )
    else:
        out = out.withColumn("invalid_at", F.col("closing_at"))
    prior_expired = (
        F.col("expired_at")
        if "expired_at" in edges.columns
        else F.lit(None).cast("timestamp")
    )
    return out.withColumn(
        "expired_at",
        F.when(F.col("invalid_at").isNotNull(),
               F.coalesce(prior_expired, F.lit(run_ts)))
        .otherwise(prior_expired),
    ).drop("closing_at")


def invalidate_cross_predicate(edges: DataFrame, run_ts) -> DataFrame:
    """T4→T1 in default-DAG form: close each edge at the earliest LATER
    valid_at among edges sharing EITHER endpoint, across predicates —
    the reference truth table (edge_operations.py:406-441) applied to the
    either-endpoint candidate reach of get_edge_invalidation_candidates
    (search_utils.py:1545-1729, endpoint clause :1680).

    Equivalent to
      ``invalidate_by_candidates(e, invalidation_candidates(e, e,
      min_score=None), run_ts)``
    under the pipeline invariants (valid_at non-null per merged edge;
    any pre-set invalid_at > valid_at) — but O(|edges|) instead of the
    pair join's O(Σ endpoint-degree²): the closing instant is read from
    a per-endpoint DISTINCT-valid_at skyline (same hub-safe shape as
    invalidate_edges), so a hub entity with 10⁶ incident edges costs its
    distinct-timestamp count, never 10¹² candidate pairs.

    Also subsumes the same-(group, subject, predicate) window of
    invalidate_edges: that partition shares the subject endpoint, so its
    successor instant is ≥ the endpoint skyline's — composing this after
    (or instead of) invalidate_edges yields the same invalid_at.
    """
    sides = edges.filter(F.col("valid_at").isNotNull()).select(
        "uuid",
        F.explode(
            F.array(F.col("source_node_uuid"), F.col("target_node_uuid"))
        ).alias("endpoint"),
        "valid_at",
    )
    skyline = sides.select("endpoint", "valid_at").distinct()
    w = Window.partitionBy("endpoint").orderBy("valid_at")
    successor = skyline.withColumn("next_at", F.lead("valid_at").over(w))
    # closing instant per edge = earliest successor over its endpoints
    # (min skips the null successor of an endpoint's last instant)
    closing = (
        sides.join(successor, ["endpoint", "valid_at"])
        .groupBy("uuid")
        .agg(F.min("next_at").alias("closing_at"))
    )
    out = edges.join(closing, "uuid", "left")
    if "invalid_at" in edges.columns:
        # an existing invalid_at bounds qualification (disjointness guard:
        # a closer starting at/after it is skipped); a qualifying closer
        # OVERWRITES it (reference edge_operations.py:436)
        qualified = F.when(
            F.col("closing_at").isNotNull()
            & (
                F.col("invalid_at").isNull()
                | (F.col("closing_at") < F.col("invalid_at"))
            ),
            F.col("closing_at"),
        )
        out = out.withColumn("invalid_at", F.coalesce(qualified, "invalid_at"))
    else:
        out = out.withColumn("invalid_at", F.col("closing_at"))
    prior_expired = (
        F.col("expired_at")
        if "expired_at" in edges.columns
        else F.lit(None).cast("timestamp")
    )
    return out.withColumn(
        "expired_at",
        F.when(
            F.col("invalid_at").isNotNull(),
            F.coalesce(prior_expired, F.lit(run_ts)),
        ).otherwise(prior_expired),
    ).drop("closing_at")


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


def asof_snapshot(edges: DataFrame, at) -> DataFrame:
    """The graph AS OF an event time: edges whose validity interval
    covers ``at`` (valid_at ≤ at < invalid_at, open-ended when never
    invalidated) — the bi-temporal read the reference's interval model
    exists for (SURVEY §1.1). Pure filter: partition/min-max pruning
    applies when the table is laid out on valid_at."""
    at_l = F.lit(at)
    return edges.filter(
        (F.col("valid_at") <= at_l)
        & (F.col("invalid_at").isNull() | (F.col("invalid_at") > at_l))
    )


def asof_diff(edges: DataFrame, t1, t2) -> DataFrame:
    """What changed between two event times: edges live at t2 but not
    t1 (``added``) and live at t1 but not t2 (``removed`` — closed by a
    later fact). ONE shuffle-free pass computing both liveness flags
    per row; unchanged edges drop out. The downstream-sync primitive a
    bi-temporal store owes its consumers."""
    l1 = F.lit(t1)
    l2 = F.lit(t2)

    def live(at):
        return (F.col("valid_at") <= at) & (
            F.col("invalid_at").isNull() | (F.col("invalid_at") > at)
        )

    status = (
        F.when(live(l2) & ~live(l1), F.lit("added"))
        .when(live(l1) & ~live(l2), F.lit("removed"))
        .otherwise(F.lit(None))
    )
    return edges.withColumn("status", status).filter(
        F.col("status").isNotNull()
    )
