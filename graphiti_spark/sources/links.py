"""The `links` fetch-log table: (doc_id, url, fetch_ts) with realistic
crawl-URL mess — case variants, tracking params, default ports, www.
aliases, fragments — derived deterministically from documents.parquet
(same derivation contract as sources/pages.py: both engines compute the
table from doc_id with literally the same arithmetic, so the DuckDB
oracles rebuild it exactly).

Each canonical URL appears under up to four surface variants (variant
chosen by doc_id % 4, canonical identity by doc_id % 211), so
weblinks.url_dedup has genuine collisions to resolve at every sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.sources.pages import CRAWL_EPOCH, load_documents

CANON_MOD = 211  # canonical-identity modulus (prime, SF-independent)

HOSTS = [
    "site0.com",
    "site1.org",
    "news.site2.co.uk",
    "blog.site3.com",
    "site4.net",
    "media.site5.ac.uk",
    "site6.io",
]

# DuckDB twin fragments (keep in lockstep with load_links).
_SQL_HOSTS = "[" + ", ".join(f"'{h}'" for h in HOSTS) + "]"
SQL_LINKS_CTE = f"""
raw_links AS (
  SELECT doc_id,
         (doc_id % {CANON_MOD}) AS c,
         ({_SQL_HOSTS})[CAST((doc_id % {CANON_MOD}) % 7 AS INT) + 1] AS host,
         '/art/' || CAST(doc_id % {CANON_MOD} AS VARCHAR) AS path,
         CAST((doc_id % {CANON_MOD}) % 3 AS VARCHAR) AS bval,
         doc_id % 4 AS v,
         TIMESTAMP '{CRAWL_EPOCH}'
           + CAST(doc_id AS INT) * INTERVAL 1 MINUTE AS fetch_ts
  FROM documents
),
links AS (
  SELECT doc_id, fetch_ts,
         CASE v
           WHEN 0 THEN 'https://' || host || path || '?a=1&b=' || bval
           WHEN 1 THEN 'HTTPS://' || upper(host) || path
                       || '?a=1&b=' || bval || '#frag'
           WHEN 2 THEN 'https://www.' || host || path
                       || '/?b=' || bval || '&utm_source=feed&a=1'
           ELSE 'https://' || host || ':443' || path
                || '?a=1&gclid=xyz&b=' || bval
         END AS url
  FROM raw_links
)"""

# What canonicalize_url must reduce every variant to.
SQL_CANON_CTE = f"""
canon_links AS (
  SELECT doc_id,
         TIMESTAMP '{CRAWL_EPOCH}'
           + CAST(doc_id AS INT) * INTERVAL 1 MINUTE AS fetch_ts,
         'https://'
           || ({_SQL_HOSTS})[CAST((doc_id % {CANON_MOD}) % 7 AS INT) + 1]
           || '/art/' || CAST(doc_id % {CANON_MOD} AS VARCHAR)
           || '?a=1&b=' || CAST((doc_id % {CANON_MOD}) % 3 AS VARCHAR)
           AS url_canon
  FROM documents
)"""


def load_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → links(doc_id, url, fetch_ts)."""
    docs = load_documents(spark, sf_dir)
    c = F.col("doc_id") % CANON_MOD
    host = F.element_at(
        F.array(*[F.lit(h) for h in HOSTS]), (c % 7).cast("int") + 1
    )
    path = F.concat(F.lit("/art/"), c.cast("string"))
    bval = (c % 3).cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(
            v == 0,
            F.concat(F.lit("https://"), host, path, F.lit("?a=1&b="), bval),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("HTTPS://"),
                F.upper(host),
                path,
                F.lit("?a=1&b="),
                bval,
                F.lit("#frag"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://www."),
                host,
                path,
                F.lit("/?b="),
                bval,
                F.lit("&utm_source=feed&a=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"),
                host,
                F.lit(":443"),
                path,
                F.lit("?a=1&gclid=xyz&b="),
                bval,
            )
        )
    )
    fetch_ts = F.to_timestamp(F.lit(CRAWL_EPOCH)) + F.make_interval(
        mins=F.col("doc_id").cast("int")
    )
    return docs.select(
        "doc_id", url.alias("url"), fetch_ts.alias("fetch_ts"), "n_chars"
    )
