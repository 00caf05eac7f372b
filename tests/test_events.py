"""As-of join and sessionization (operators/events.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.events import (
    asof_join,
    session_stats,
    sessionize,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (2, 10, _ts("2024-01-01 12:00:00")),
            (3, 10, _ts("2024-01-01 08:00:00")),  # before any right row
            (4, 20, _ts("2024-01-01 10:30:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 09:00:00"), "a"),
            (10, _ts("2024-01-01 10:00:00"), "b"),  # ts-equal to left 1
            (10, _ts("2024-01-01 11:30:00"), "c"),
        ],
        "user_id long, ts timestamp, tag string",
    )
    return left, right


def test_asof_backward_inclusive_and_left_join(spark):
    left, right = _frames(spark)
    got = {
        r.event_id: r
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got[1].tag == "b"  # equal ts matches (inclusive)
    assert got[2].tag == "c"  # latest at/before 12:00
    assert got[3].tag is None and got[3].ts_matched is None  # nothing prior
    assert got[4].tag is None  # key absent from right
    assert len(got) == 4  # left join: every left row survives


def test_asof_forward_and_tolerance(spark):
    left, right = _frames(spark)
    fwd = {
        r.event_id: r
        for r in asof_join(left, right, on="user_id", direction="forward").collect()
    }
    assert fwd[1].tag == "b"  # equal ts inclusive forward too
    assert fwd[3].tag == "a"  # earliest at/after 08:00
    assert fwd[2].tag is None  # nothing after 12:00
    tol = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", tolerance_s=1800
        ).collect()
    }
    assert tol[1].tag == "b"  # gap 0 <= 30 min
    assert tol[2].tag == "c"  # gap 30 min, inclusive
    # widen left 2's gap beyond tolerance -> match nulled out
    tol2 = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", tolerance_s=1799
        ).collect()
    }
    assert tol2[2].tag is None
    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", direction="nearest")


def test_asof_suffixes_colliding_value_columns(spark):
    left, right = _frames(spark)
    right2 = right.withColumn("event_id", F.lit(99).cast("long"))
    out = asof_join(left, right2, on="user_id", value_cols=["event_id"])
    assert "event_id_matched" in out.columns  # collision suffixed
    got = {r.event_id: r for r in out.collect()}
    assert got[1].event_id_matched == 99
    assert got[4].event_id_matched is None


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00"), 1.0),
            (2, 7, _ts("2024-01-01 10:29:59"), 2.0),  # gap < 30 min: same
            (3, 7, _ts("2024-01-01 10:59:59"), 3.0),  # exactly 30 min: same
            (4, 7, _ts("2024-01-01 11:30:00"), 4.0),  # 30 min + 1 s: new
            (5, 8, _ts("2024-01-01 10:00:00"), 5.0),  # other user: own count
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {r.event_id: r.session_idx for r in sessionize(ev).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_session_stats_exact_totals(spark):
    ev = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00"), 0.1),
            (2, 7, _ts("2024-01-01 10:10:00"), 0.2),
            (3, 7, _ts("2024-01-01 20:00:00"), 0.3),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    rows = {
        r.session_idx: r for r in session_stats(ev, gap_s=1800).collect()
    }
    assert rows[1].n_events == 2
    assert rows[1].total_value == pytest.approx(0.3, abs=1e-12)  # decimal sum
    assert rows[1].t_start == _ts("2024-01-01 10:00:00")
    assert rows[1].t_end == _ts("2024-01-01 10:10:00")
    assert rows[2].n_events == 1
