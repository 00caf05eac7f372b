"""Watermarked streaming corpus-quality telemetry.

A standing ingest wants per-window health signals — docs per language,
token volume, mean quality — without a batch job over the whole corpus
each time. This is the textstats family lifted onto Structured
Streaming: per-row language/quality expressions (pure codegen, shared
with the batch operators so streaming and batch can never disagree on
a score) feeding a watermarked tumbling-window aggregate.

Determinism: the quality sum accumulates in decimal(18,2) (scores are
exact quarter values), so the per-window mean is a pure function of
the window's rows — streaming ≡ batch bit-for-bit, asserted by
tests/test_streaming_monitor.py. State is bounded by the watermark
(late rows beyond it are dropped, as windowed_episode_counts does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.operators.textstats import (
    _tokens,
    pred_lang_col,
    quality_score_col,
)


def windowed_quality_stats(
    docs_stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (event-time window, predicted language): doc count, token
    sum, and exact mean quality. Works identically on a batch frame
    (the streaming ≡ batch test runs both)."""
    toks = F.filter(_tokens(F.col(text_col)), lambda x: x != "")
    rows = docs_stream.withWatermark(ts_col, watermark).select(
        F.col(ts_col).alias("_ts"),
        pred_lang_col(F.col(text_col)).alias("pred_lang"),
        F.size(toks).cast("long").alias("_n_tok"),
        quality_score_col(F.col(text_col))
        .cast("decimal(18,2)")
        .alias("_q"),
    )
    agg = rows.groupBy(F.window("_ts", window), "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_n_tok").cast("long").alias("n_tokens"),
        F.sum("_q").alias("_qsum"),
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "pred_lang",
        "n_docs",
        "n_tokens",
        (
            F.round(
                F.col("_qsum").cast("double") / F.col("n_docs"), 4
            )
            + F.lit(0.0)
        ).alias("mean_quality"),
    )
