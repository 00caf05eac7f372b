"""Cluster entry point for the streaming corpus-quality monitor.

  spark-submit --py-files /tmp/graphiti_spark.zip \
    jobs/monitor_corpus.py --feed /data/pages_feed \
    --output /data/quality_stats --checkpoint /data/quality_ckpt

Tails a pages feed directory (the same parquet feed shape
streaming/ingest.py consumes) and maintains per-(event-time window,
predicted language) doc counts, token volume, and exact mean quality —
the health dashboard a standing crawl ingest watches for language-mix
drift and quality collapse. The per-row scoring expressions are shared
with the batch operators (textstats), so the monitor can never disagree
with a batch audit; the quality sum accumulates in decimal, so replays
and reshuffles cannot drift the mean (streaming ≡ batch, law-tested in
tests/test_streaming_monitor.py).

``--once`` drains what's currently in the feed (availableNow) and
exits — the cron-shaped deployment; without it the query runs
continuously on micro-batch triggers.

Package the library with:  python scripts/make_zip.py
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--feed", required=True, help="streaming feed dir (pages parquet)")
    ap.add_argument("--output", required=True, help="append-mode parquet sink dir")
    ap.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--watermark", default="2 hours")
    ap.add_argument("--once", action="store_true", help="drain the feed (availableNow) and exit")
    ap.add_argument("--max-files-per-trigger", type=int, default=16,
                    help="bounded files per micro-batch (bounded memory over a backlog)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("graphiti-monitor-corpus")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "100000")
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from graphiti_spark.streaming.ingest import PAGES_FEED_SCHEMA
    from graphiti_spark.streaming.monitor import windowed_quality_stats

    # bounded files per trigger → bounded micro-batch memory even when
    # pointed at weeks of backlog (the same bound streaming/ingest.py
    # applies to this feed shape)
    stream = (
        spark.readStream.schema(PAGES_FEED_SCHEMA)
        .option("maxFilesPerTrigger", str(args.max_files_per_trigger))
        .parquet(args.feed)
    )
    stats = windowed_quality_stats(
        stream, window=args.window, watermark=args.watermark
    )
    writer = (
        stats.writeStream.format("parquet")
        .option("path", args.output)
        .option("checkpointLocation", args.checkpoint)
        .outputMode("append")  # windows emit once the watermark closes them
    )
    if args.once:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        q.awaitTermination()


if __name__ == "__main__":
    main()
