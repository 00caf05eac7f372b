"""Stateful streaming sessionization: the Structured-Streaming twin of
``operators/events.session_stats``, built on ``applyInPandasWithState``
(the custom-stateful-operator API — arbitrary per-key state with
event-time timeouts, which windowed aggregation cannot express because
a session's extent depends on the data, not a fixed grid).

Semantics (matching the batch operator when events arrive in event-time
order per user — the contract ``tests/test_streaming_sessions.py``
hash-proves):

  - events group by user; a session closes when the next event arrives
    more than ``gap_s`` after the previous one, OR when the event-time
    watermark passes ``t_end + gap_s`` (the timeout — no later event
    can extend the session once the watermark guarantees none is
    coming).
  - ``session_idx`` is the user's 1-based session counter (emission
    order = event-time order under the ordered-arrival contract).
  - ``total_value`` reproduces the batch decimal(18,2) semantics
    exactly: each value is quantized to cents with HALF_UP (the same
    rounding Spark's CAST(double AS DECIMAL(18,2)) applies), summed as
    exact integers in state, and divided back out once at emission —
    no float accumulation order anywhere.

Late events (beyond the watermark) open a NEW session rather than
silently extending an emitted one — the standard streaming-session
trade-off, stated honestly.

Scale: state is O(1) per active user (five scalars); the shuffle keys
on user id — the same bounded-cardinality entity key as the batch
sessionizer; timeouts bound state lifetime to gap + watermark delay.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
        StructField("n_events", LongType()),
        StructField("t_start", TimestampType()),
        StructField("t_end", TimestampType()),
        StructField("total_value", DoubleType()),
    ]
)

# (sessions emitted so far, open-session start/end micros, event count,
# value cents) — five scalars per active user.
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_emitted", LongType()),
        StructField("t_start_us", LongType()),
        StructField("t_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("cents", LongType()),
    ]
)


def _cents(v: float) -> int:
    # Spark's CAST(double AS DECIMAL(18,2)) = exact binary expansion,
    # then setScale(2, HALF_UP); Decimal(float) is the same expansion.
    return int(
        Decimal(v).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) * 100
    )


def _emit(user: int, idx: int, st: tuple) -> pd.DataFrame:
    _, t_start_us, t_end_us, n_events, cents = st
    return pd.DataFrame(
        {
            "user_id": [user],
            "session_idx": [idx],
            "n_events": [n_events],
            "t_start": [pd.Timestamp(t_start_us, unit="us")],
            "t_end": [pd.Timestamp(t_end_us, unit="us")],
            # one exact decimal->double conversion, same as the batch
            # sum(decimal(18,2)).cast(double)
            "total_value": [float(Decimal(cents) / 100)],
        }
    )


def _session_fn(gap_us: int, retention_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            st = state.get
            n_emitted, t_start_us = st[0], st[1]
            if t_start_us is not None:
                # close the open session but KEEP the counter — a
                # removed counter would restart session_idx at 1 and
                # collide with already-emitted indices after a restart
                yield _emit(user, n_emitted + 1, st)
                state.update((n_emitted + 1, None, None, 0, 0))
                state.setTimeoutTimestamp(
                    state.getCurrentWatermarkMs() + retention_ms
                )
            else:
                # counter-retention TTL expired with no new sessions
                state.remove()
            return

        if state.exists:
            n_emitted, t_start_us, t_end_us, n_events, cents = state.get
        else:
            n_emitted, t_start_us, t_end_us, n_events, cents = (
                0, None, None, 0, 0,
            )

        out = []
        # applyInPandasWithState delivers one group's micro-batch across
        # MULTIPLE Arrow chunks (default 10k rows) with no cross-chunk
        # ordering guarantee — sorting each chunk independently would
        # silently mis-split sessions for groups larger than a chunk.
        # Materialize the whole group's batch and sort ONCE; state stays
        # O(1) per user, this buffer is one user's micro-batch rows.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = (
                pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
            )
            vals = pdf["value"].tolist()
            for t, v in zip(ts_us, vals):
                if t_start_us is None:
                    t_start_us, t_end_us, n_events, cents = t, t, 1, _cents(v)
                elif t - t_end_us > gap_us:
                    n_emitted += 1
                    out.append(
                        _emit(
                            user,
                            n_emitted,
                            (None, t_start_us, t_end_us, n_events, cents),
                        )
                    )
                    t_start_us, t_end_us, n_events, cents = t, t, 1, _cents(v)
                else:
                    t_end_us = max(t_end_us, t)
                    n_events += 1
                    cents += _cents(v)

        if t_start_us is not None:
            state.update((n_emitted, t_start_us, t_end_us, n_events, cents))
            # close the open session once the watermark passes
            # t_end + gap (clamped: a timeout must sit strictly past
            # the current watermark or Spark rejects it)
            state.setTimeoutTimestamp(
                max(
                    (t_end_us + gap_us) // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        if out:
            yield pd.concat(out, ignore_index=True)

    return fn


def streaming_sessions(
    events: DataFrame,
    gap_s: float = 1800.0,
    watermark: str = "2 hours",
    counter_retention_s: float = 30 * 86400.0,
) -> DataFrame:
    """Gap-based per-user session aggregates over an event STREAM
    (columns: user_id long, ts timestamp, event_id long, value double).
    Emits one row per CLOSED session — closed by a gap-exceeding event
    or by the event-time timeout. Output schema = the batch
    ``session_stats`` contract.

    ``counter_retention_s`` bounds idle state: after a session closes
    by timeout, the user's 5-scalar counter state survives this long
    (event time) so session_idx stays a per-user lifetime counter; a
    user idle beyond it restarts at 1 — the standard session-store TTL
    trade-off, stated explicitly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(
                int(gap_s * 1_000_000), int(counter_retention_s * 1000)
            ),
            SESSION_OUTPUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
