"""Event-stream relational operators Spark lacks natively: keyed as-of
join and gap-based sessionization.

The reference (peabodyAdmin/graphiti) has no event-analytics layer —
these extend the engine for the event/telemetry side of a large
training-data pipeline (SURVEY §2 "beyond the reference" family):
attributing an event to the most recent prior event of another kind
(as-of join — the operator the task spec calls out as missing from
Spark's built-ins) and segmenting per-user activity into sessions.

Scale notes:
  - Both operators shuffle ONCE on the entity key (user id): the as-of
    join is the union-sort-backfill form — no per-row range probe, no
    join explosion, O(|left| + |right|) rows through one window — and
    sessionization is a lag + running sum over the same partitioning,
    so composing them reuses the exchange.
  - Windows are sequential per key; at web scale the key is a user/
    device id with bounded per-key cardinality (not a hub-prone graph
    key). AQE skew-split does not apply inside a window, so a truly
    pathological key (one user = half the events) would serialize —
    the same caveat as any keyed sessionization, noted here honestly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(c: Column) -> Column:
    """Microseconds since epoch; accepts TIMESTAMP and TIMESTAMP_NTZ
    (parquet timestamps load as NTZ under the session's UTC
    normalization — unix_micros itself rejects NTZ, so reinterpret in
    the session's UTC zone first; gaps are zone-invariant anyway)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (direction='backward', inclusive) or the
    least ``right_ts`` >= ``left_ts`` ('forward') within the same ``on``
    key; no match (or outside ``tolerance_s``) yields NULLs (left join
    semantics).

    Union-sort-backfill plan: tag both sides, sort each key's rows by
    time once, and carry the latest right payload across left rows with
    ``last(..., ignorenulls)`` — equal timestamps order the right row
    on the matching side of the left row, which is what makes the match
    inclusive. One shuffle on ``on``; never a range-probe join.

    Right rows must be unique per (``on``, ``right_ts``) — pre-dedupe
    otherwise (which of two simultaneous right rows wins would be
    nondeterministic).

    Output: all left columns, then ``{right_ts}{suffix}`` and each
    value column (suffixed only on collision with a left column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    from pyspark.sql.types import StructField, StructType

    rfields = [right_ts] + list(value_cols)
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rpay = F.struct(*[F.col(c).alias(c) for c in rfields])
    lpay = F.struct(*[F.col(c).alias(c) for c in left.columns])
    # the absent side must be a truly NULL struct — a struct OF nulls is
    # non-null and last(..., ignorenulls) would pick it instead of the
    # carried payload
    null_rpay = F.lit(None).cast(
        StructType([StructField(c, rtypes[c]) for c in rfields])
    )
    null_lpay = F.lit(None).cast(
        StructType([StructField(c, ltypes[c]) for c in left.columns])
    )

    lk = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(True).alias("_l"),
        lpay.alias("_lp"),
        null_rpay.alias("_rp"),
    )
    rk = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(False).alias("_l"),
        null_lpay.alias("_lp"),
        rpay.alias("_rp"),
    )
    u = lk.unionByName(rk)

    if direction == "backward":
        # right sorts before left at equal ts -> inclusive match
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_l").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = F.last("_rp", ignorenulls=True).over(w)
    else:
        # left sorts before right at equal ts -> inclusive match
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_l").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        matched = F.first("_rp", ignorenulls=True).over(w)

    out = u.withColumn("_m", matched).filter(F.col("_l"))
    m = F.col("_m")
    if tolerance_s is not None:
        gap = _micros(F.col("_ts")) - _micros(m[right_ts])
        if direction == "forward":
            gap = -gap
        m = F.when(gap <= tolerance_s * 1_000_000, F.col("_m"))
    cols = [F.col("_lp")[c].alias(c) for c in left.columns]
    cols.append(m[right_ts].alias(f"{right_ts}{suffix}"))
    for c in value_cols:
        name = f"{c}{suffix}" if c in left.columns else c
        cols.append(m[c].alias(name))
    return out.select(*cols)


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: float = 1800.0,
) -> DataFrame:
    """Gap-based sessions: within a user (ordered by ``ts_col`` then
    ``id_col`` for deterministic ties), a row starts a new session when
    it is the user's first event or arrives more than ``gap_s`` seconds
    after the previous one. Output: the input columns plus
    ``session_idx`` (1-based running count of session starts)."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | (_micros(F.col(ts_col)) - _micros(prev) > int(gap_s * 1_000_000)),
        1,
    ).otherwise(0)
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.withColumn("session_idx", sess.cast("long"))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_s: float = 1800.0,
) -> DataFrame:
    """Per-session aggregates over ``sessionize``'s assignment: event
    count, bounds, and the value total (summed in decimal(18,2) — exact
    regardless of aggregation order, so results are engine- and
    partitioning-independent). Output (user_id, session_idx, n_events,
    t_start, t_end, total_value)."""
    s = sessionize(events, user_col, ts_col, id_col, gap_s)
    return (
        s.groupBy(F.col(user_col), F.col("session_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.col(ts_col)).alias("t_start"),
            F.max(F.col(ts_col)).alias("t_end"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )
