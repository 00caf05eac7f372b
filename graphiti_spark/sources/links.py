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


# ---------------------------------------------------------------------------
# Page-anchor table: (doc_id, url, html) where html embeds <a href> tags
# in the four shapes a crawler must handle (absolute + tracking params,
# protocol-relative, root-relative, and noise hrefs that MUST be
# dropped: mailto:, fragment-only, single-quoted). Link targets derive
# from doc_id with closed-form arithmetic, so the DuckDB twins assert
# the EXPECTED resolved canonical edges rather than re-running the same
# regexes (the urls_canonical adjudication style).

_A_HOST2 = "(c * 3 + 1) % 7"  # SQL fragments kept in lockstep below
_A_HOST3 = "(c * 5 + 2) % 7"
_A_K2 = f"(c * 7 + 3) % {CANON_MOD}"
_A_K3 = f"(c * 11 + 5) % {CANON_MOD}"
_A_K4 = f"(c * 13 + 7) % {CANON_MOD}"

# Closed-form canonical link targets per doc (DuckDB side). Column c
# must be in scope (doc_id % CANON_MOD).
SQL_ANCHOR_EDGES_CTE = f"""
anchor_edges AS (
  SELECT doc_id,
         'https://' || ({_SQL_HOSTS})[CAST(c % 7 AS INT) + 1]
           || '/art/' || CAST(c AS VARCHAR)
           || '?a=1&b=' || CAST(c % 3 AS VARCHAR) AS src,
         unnest([
           'https://' || ({_SQL_HOSTS})[CAST({_A_HOST2} AS INT) + 1]
             || '/art/' || CAST({_A_K2} AS VARCHAR) || '?z=9',
           'https://' || ({_SQL_HOSTS})[CAST({_A_HOST3} AS INT) + 1]
             || '/art/' || CAST({_A_K3} AS VARCHAR),
           'https://' || ({_SQL_HOSTS})[CAST(c % 7 AS INT) + 1]
             || '/art/' || CAST({_A_K4} AS VARCHAR)
         ]) AS dst
  FROM (SELECT doc_id, doc_id % {CANON_MOD} AS c FROM documents)
)"""


# Host-level closed form of the same anchors (src host, three dst
# hosts per doc — the third is the self-host root-relative link).
SQL_ANCHOR_HOSTS_CTE = f"""
anchor_host_edges AS (
  SELECT doc_id,
         ({_SQL_HOSTS})[CAST(c % 7 AS INT) + 1] AS src_host,
         unnest([
           ({_SQL_HOSTS})[CAST({_A_HOST2} AS INT) + 1],
           ({_SQL_HOSTS})[CAST({_A_HOST3} AS INT) + 1],
           ({_SQL_HOSTS})[CAST(c % 7 AS INT) + 1]
         ]) AS dst_host
  FROM (SELECT doc_id, doc_id % {CANON_MOD} AS c FROM documents)
)"""


# The same closed-form edges WITH their anchor texts (the three
# resolvable anchors carry 'next' / 'mirror' / 'related' in the html
# load_page_anchors emits; the dropped noise anchors carry none).
SQL_ANCHOR_TEXT_CTE = f"""
anchor_text_edges AS (
  SELECT doc_id,
         'https://' || ({_SQL_HOSTS})[CAST(c % 7 AS INT) + 1]
           || '/art/' || CAST(c AS VARCHAR)
           || '?a=1&b=' || CAST(c % 3 AS VARCHAR) AS src,
         unnest([
           {{'dst': 'https://' || ({_SQL_HOSTS})[CAST({_A_HOST2} AS INT) + 1]
             || '/art/' || CAST({_A_K2} AS VARCHAR) || '?z=9',
             't': 'next'}},
           {{'dst': 'https://' || ({_SQL_HOSTS})[CAST({_A_HOST3} AS INT) + 1]
             || '/art/' || CAST({_A_K3} AS VARCHAR), 't': 'mirror'}},
           {{'dst': 'https://' || ({_SQL_HOSTS})[CAST(c % 7 AS INT) + 1]
             || '/art/' || CAST({_A_K4} AS VARCHAR), 't': 'related'}}
         ], recursive := true)
  FROM (SELECT doc_id, doc_id % {CANON_MOD} AS c FROM documents)
)"""


def load_page_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → (doc_id, url, html): the page's crawl URL
    (the SAME messy surface variant load_links emits, so base-URL
    resolution must survive case/port/www noise) plus an html body
    carrying six anchors — three resolvable (absolute with a tracking
    param, protocol-relative, root-relative/self-host) and three that
    extract_links must drop (mailto:, fragment-only, single-quoted)."""
    links = load_links(spark, sf_dir)
    c = F.col("doc_id") % CANON_MOD
    hosts = F.array(*[F.lit(h) for h in HOSTS])
    host2 = F.element_at(hosts, ((c * 3 + 1) % 7).cast("int") + 1)
    host3 = F.element_at(hosts, ((c * 5 + 2) % 7).cast("int") + 1)
    k2 = ((c * 7 + 3) % CANON_MOD).cast("string")
    k3 = ((c * 11 + 5) % CANON_MOD).cast("string")
    k4 = ((c * 13 + 7) % CANON_MOD).cast("string")
    html = F.concat(
        F.lit("<html><body><p>article "),
        c.cast("string"),
        F.lit('</p><a href="https://'),
        host2,
        F.lit("/art/"),
        k2,
        F.lit('?utm_campaign=x&z=9">next</a> <a href="//'),
        host3,
        F.lit("/art/"),
        k3,
        F.lit('">mirror</a> <a href="/art/'),
        k4,
        F.lit('">related</a> <a href="mailto:ed@example.com">mail</a>'),
        F.lit('<a href="#top">top</a>'),
        F.lit("<a href='/art/ignored'>squote</a></body></html>"),
    )
    return links.select("doc_id", "url", html.alias("html"))


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
