"""JSONL corpus source: the other wire format a Common-Crawl-style
pipeline ingests (WET/CC-News dumps ship as gzipped JSON-lines; the
parquet `pages` table is what you MATERIALIZE, this is what ARRIVES).

Contract: one JSON object per line with
  url string (required) · warc_ts ISO-8601 string (required) ·
  text string (required) · html string (optional; wrapped to binary) ·
  lang string (optional) · group_id string (optional)

Design rules for 100 TB:
  - The schema is DECLARED, never inferred — schema inference is a
    full extra pass over the input.
  - Malformed lines are NEVER silently dropped: PERMISSIVE mode routes
    them to a `_corrupt` column and ``split_corrupt`` hands them back
    as a quarantine frame (same observability contract as the
    dropped-LSH-bucket metrics).
  - gzip JSONL is NOT splittable — one file = one task regardless of
    size; the reader repartitions to the session parallelism after the
    scan (same rationale as pages.load_pages), and the docstring is
    the place that says "shard your dumps or use zstd/bzip2" out loud.

Reference mapping: one JSONL record = one EpisodicNode-to-be — the
output schema equals pages.load_pages's contract, so
``pages_to_episodes`` and the whole DAG consume either source
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

JSONL_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", StringType()),
        StructField("text", StringType()),
        StructField("html", StringType()),
        StructField("lang", StringType()),
        StructField("group_id", StringType()),
        StructField("_corrupt", StringType()),
    ]
)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Raw JSONL scan with the declared schema; malformed lines carry
    the offending text in `_corrupt` and NULLs elsewhere."""
    return (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): a row is quarantined when the line failed
    to parse OR a required field is missing/unparseable — bad rows are
    surfaced for inspection, never silently dropped."""
    # try_to_timestamp: ANSI mode makes to_timestamp THROW on the very
    # malformed values this function exists to quarantine
    parsed = raw.withColumn("_ts", F.try_to_timestamp(F.col("warc_ts")))
    bad = (
        F.col("_corrupt").isNotNull()
        | F.col("url").isNull()
        | F.col("text").isNull()
        | F.col("_ts").isNull()
    )
    return parsed.filter(~bad), parsed.filter(bad)


def load_pages_jsonl(
    spark: SparkSession, path: str, quarantine_sink: list | None = None
) -> DataFrame:
    """JSONL → the pages contract (url, warc_ts timestamp, html binary,
    lang, group_id, text). Records without html get the text wrapped
    (pages.wrap_html twin) so the E10 extraction stage always has real
    bytes; absent lang/group_id default to 'und'/'jsonl'.

    ``quarantine_sink``: optional list; the malformed-row frame is
    appended for the caller to count/persist (lazy)."""
    valid, quarantine = split_corrupt(read_pages_jsonl(spark, path))
    if quarantine_sink is not None:
        quarantine_sink.append(quarantine)
    from graphiti_spark.textnorm import extract_text_udf

    # html-escape the wrapped text (ordered, '&' first — the same five
    # entities as textnorm.wrap_html) so extract_text(html) round-trips
    # the original text byte-identically, the E10 invariant.
    esc = F.col("text")
    for raw, ent in (
        ("&", "&amp;"),
        ("<", "&lt;"),
        (">", "&gt;"),
        ('"', "&quot;"),
        ("'", "&#x27;"),
    ):
        esc = F.regexp_replace(esc, F.lit(raw), F.lit(ent))
    pages = valid.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("url"),
        F.col("_ts").alias("warc_ts"),
        F.coalesce(
            F.col("html"),
            F.concat(
                F.lit("<html><body><p>"), esc, F.lit("</p></body></html>")
            ),
        )
        .cast("binary")
        .alias("html"),
        F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
        F.coalesce(F.col("group_id"), F.lit("jsonl")).alias("group_id"),
    )
    return pages.withColumn("text", extract_text_udf(F.col("html")))
