"""Streaming corpus-quality telemetry: the watermarked windowed monitor
must agree bit-for-bit with the same aggregation run as a batch job
(the decimal quality sum makes the mean order-independent)."""

from graphiti_spark.sources.pages import load_pages
from graphiti_spark.streaming.ingest import PAGES_FEED_SCHEMA
from graphiti_spark.streaming.monitor import windowed_quality_stats

SF = "/root/testdata/sf0.001"


def test_windowed_quality_stats_streaming_equals_batch(spark, tmp_path):
    feed = str(tmp_path / "qfeed")
    pages = load_pages(spark, SF)
    pages.write.parquet(feed)
    stream = spark.readStream.schema(PAGES_FEED_SCHEMA).parquet(feed)
    agg = windowed_quality_stats(stream, window="1 hour")
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("qmon")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(
        map(tuple, spark.sql("SELECT * FROM qmon").collect())
    )
    batch = sorted(
        map(
            tuple,
            windowed_quality_stats(
                spark.read.parquet(feed), window="1 hour"
            ).collect(),
        )
    )
    assert streamed == batch and len(batch) > 0
    # sanity: every row has a defensible mean and a known language code
    for (_, _, lang, n_docs, n_tokens, mean_q) in batch:
        assert lang in ("de", "en", "es", "fr", "und")
        assert n_docs > 0 and n_tokens >= 0 and 0.0 <= mean_q <= 1.0
