"""applyInPandasWithState sessionization: the streaming operator must
reproduce the batch session_stats rows exactly (bounds, counts, and
cent-exact value totals) when events arrive in event-time order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.events import session_stats
from graphiti_spark.streaming.sessions import streaming_sessions

SF = "/root/testdata/sf0.001"
GAP_S = 28800  # 8 h — the non-trivial split for this corpus
SENTINEL_USER = -1


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
    )


def _drain(spark, feed, ckpt, name):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        streaming_sessions(stream, gap_s=GAP_S, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).filter(F.col("user_id") != SENTINEL_USER)


def test_streaming_sessions_equal_batch(spark, tmp_path):
    ev = _events(spark)
    max_ts = ev.agg(F.max("ts")).first()[0]

    # event-time-ordered feed in two files (two micro-batches), plus a
    # far-future sentinel that pushes the watermark past every open
    # session's timeout so the final sessions emit
    feed = str(tmp_path / "feed")
    ev.filter(F.col("ts") <= F.lit(max_ts) - F.expr("INTERVAL 100 HOURS")).coalesce(1).write.parquet(feed + "/f=a")
    ev.filter(F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 100 HOURS")).coalesce(1).write.parquet(feed + "/f=b")
    spark.createDataFrame(
        [(SENTINEL_USER, None, 0, 0.0)],
        "user_id long, ts timestamp, event_id long, value double",
    ).withColumn(
        "ts", F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")
    ).coalesce(1).write.parquet(feed + "/f=z")

    got = _drain(spark, feed, str(tmp_path / "ckpt"), "stream_sessions")

    batch = session_stats(ev, gap_s=GAP_S)

    def rows(df):
        return {
            (
                r.user_id,
                r.session_idx,
                r.n_events,
                r.t_start,
                r.t_end,
                r.total_value,
            )
            for r in df.collect()
        }

    g, b = rows(got), rows(batch)
    assert len(b) > ev.select("user_id").distinct().count()  # gap splits
    assert g == b


def _drain_to_parquet(spark, feed, ckpt, out):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = (
        streaming_sessions(stream, gap_s=GAP_S, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_sessions_restart_resumes_state(spark, tmp_path):
    """Open sessions survive a stop/restart through the checkpoint
    (memory sinks cannot recover — the file sink accumulates across
    runs): draining the feed in two runs, with the second file and the
    watermark sentinel added between them, still matches batch."""
    ev = _events(spark)
    max_ts = ev.agg(F.max("ts")).first()[0]
    cut = F.lit(max_ts) - F.expr("INTERVAL 100 HOURS")

    feed = str(tmp_path / "feed2")
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")
    ev.filter(F.col("ts") <= cut).coalesce(1).write.parquet(feed + "/f=a")
    _drain_to_parquet(spark, feed, ckpt, out)

    ev.filter(F.col("ts") > cut).coalesce(1).write.parquet(feed + "/f=b")
    spark.createDataFrame(
        [(SENTINEL_USER, None, 0, 0.0)],
        "user_id long, ts timestamp, event_id long, value double",
    ).withColumn(
        "ts", F.lit(max_ts) + F.expr("INTERVAL 30 DAYS")
    ).coalesce(1).write.parquet(feed + "/f=z")
    _drain_to_parquet(spark, feed, ckpt, out)

    def rows(df):
        return {tuple(r) for r in df.collect()}

    got = spark.read.parquet(out).filter(F.col("user_id") != SENTINEL_USER)
    assert rows(got) == rows(session_stats(ev, gap_s=GAP_S))
