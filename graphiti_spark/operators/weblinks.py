"""URL canonicalization, registered-domain extraction, URL-level dedup
and per-domain corpus stats — the front door of every Common-Crawl-style
pipeline (the BASELINE input is a table of web pages keyed by ``url``).

The reference (peabodyAdmin/graphiti) ingests episodes whose names are
already unique; a 10^12-page crawl is not so lucky: the same document is
fetched under scheme/case variants, tracking-parameter decorations,
default ports, ``www.`` aliases and fragment anchors. CC pipelines
(CCNet, RefinedWeb, FineWeb) therefore (1) canonicalize URLs, (2) dedup
by canonical URL keeping one fetch, and (3) aggregate/filter at the
registered-domain level. This module adds those three operators
Spark-first.

Scale notes:
  - ``canonicalize_url`` / ``registered_domain`` are pure per-row
    column expressions (regexp + array ops) — whole-stage codegen, no
    shuffle, no UDFs; they run inside the page scan.
  - ``url_dedup`` is ONE map-side-combinable aggregation keyed by the
    canonical url: the winner is ``min(struct(ts, id))``, so hot URLs
    (fetched millions of times) combine before the shuffle — the same
    hub-safety argument as curation.dedup_lines.
  - ``domain_stats`` is one groupBy on the registered domain; domains
    are heavy-tailed but the aggregates are all combinable (count /
    sum / distinct-count via approx or exact count of pre-deduped
    urls), so skew costs only a fat reduce task, not a cross join.
  - ``domain_filter`` broadcasts the blocklist — bounded by the
    blocklist (KB-scale curated list), never the corpus.

Every regex is restricted to the Java-regex ∩ RE2 subset (character
classes, anchors, bounded alternation — no lookaround) so the DuckDB
oracles reproduce matches exactly (same contract as curation.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# scheme://authority/path?query#fragment (RFC-3986-lite: enough for the
# crawl URL shapes this engine ingests; bad rows fall through with
# url_canon = lower(trimmed input) so nothing is silently dropped).
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

# Query parameters that never change page content (click-tracking).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="

# Multi-label public suffixes this engine recognizes (closed list — a
# production deployment swaps in the full Mozilla PSL as a broadcast
# lookup; the algorithm is the same: longest known suffix wins).
MULTI_SUFFIXES = sorted(
    ["co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "co.jp", "com.br"]
)


def _parts(url):
    return {
        "scheme": F.lower(F.regexp_extract(url, _URL_RE, 1)),
        "auth": F.lower(F.regexp_extract(url, _URL_RE, 2)),
        "path": F.regexp_extract(url, _URL_RE, 3),
        "query": F.regexp_extract(url, _URL_RE, 4),
    }


def canonicalize_url(url) -> F.Column:
    """Canonical form of a crawl URL, as one codegen expression:
    lower-cased scheme and host, ``www.`` stripped, default ports
    (:80 http / :443 https) stripped, trailing path slashes stripped
    (bare host → '/'), tracking query params removed, surviving params
    sorted, fragment dropped. Non-URL rows pass through as
    ``lower(trim(url))`` so corrupt rows stay observable.
    """
    url = F.trim(url)
    p = _parts(url)
    host0 = F.regexp_replace(p["auth"], r"^www\.", "")
    host = (
        F.when(p["scheme"] == "http", F.regexp_replace(host0, r":80$", ""))
        .when(p["scheme"] == "https", F.regexp_replace(host0, r":443$", ""))
        .otherwise(host0)
    )
    path = F.regexp_replace(p["path"], r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    kept = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    canon = F.concat(
        p["scheme"],
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(url.rlike(_URL_RE), canon).otherwise(F.lower(url))


def registered_domain(host) -> F.Column:
    """Registered (pay-level) domain of a host: last two labels, or
    last three when the trailing two are a known multi-label public
    suffix (MULTI_SUFFIXES). Single-label hosts pass through."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    in_multi = last2.isin(*MULTI_SUFFIXES)
    return F.when(n <= 2, host).when(in_multi & (n >= 3), last3).otherwise(last2)


def host_of(url_canon) -> F.Column:
    """Host component of an (already canonical) URL."""
    return F.regexp_extract(url_canon, _URL_RE, 2)


def url_dedup(
    links: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per canonical URL: the first fetch wins (min fetch_ts,
    id as tiebreak — the CC 'keep earliest capture' rule), plus the
    fetch count. min(struct) is map-side combinable, so a URL fetched
    a million times combines inside its input partitions before the
    single key shuffle."""
    canon = links.withColumn("url_canon", canonicalize_url(F.col(url_col)))
    return canon.groupBy("url_canon").agg(
        F.min(F.struct(F.col(ts_col), F.col(id_col))).alias("w"),
        F.count(F.lit(1)).alias("n_fetches"),
    ).select(
        "url_canon",
        F.col("w")[ts_col].alias("first_ts"),
        F.col("w")[id_col].alias("winner_id"),
        "n_fetches",
    )


def domain_stats(
    links: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    chars_col: str | None = None,
) -> DataFrame:
    """Per registered domain: fetch count, distinct canonical URLs,
    (optional) mean doc length. One groupBy; count_distinct(url_canon)
    is exact — at crawl scale swap for approx_count_distinct or feed
    this the output of url_dedup (then every count is combinable)."""
    canon = links.withColumn("url_canon", canonicalize_url(F.col(url_col)))
    canon = canon.withColumn(
        "domain", registered_domain(host_of(F.col("url_canon")))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_fetches"),
        F.countDistinct("url_canon").alias("n_urls"),
    ]
    if chars_col is not None:
        aggs.append(
            (F.round(F.avg(F.col(chars_col)), 4) + F.lit(0.0)).alias(
                "avg_chars"
            )
        )
    return canon.groupBy("domain").agg(*aggs)


# href="..." attribute values (double-quoted only — the documented
# extraction contract; single-quoted/unquoted hrefs are rare in modern
# markup and a production build widens the regex, not the algorithm).
_HREF_RE = r'href="([^"]*)"'
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def extract_links(
    pages: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Out-link edges of a crawl page: href extraction + relative-URL
    resolution + canonicalization, all in one codegen stage (regexp +
    array ops — no shuffle, no Python; runs inside the page scan).

    Resolution handles the closed deterministic subset that covers the
    overwhelming majority of crawl anchors: absolute (``scheme://``),
    protocol-relative (``//host/…`` — inherits the base scheme), and
    root-relative (``/path`` — base scheme + host). Everything else
    (mailto:/javascript:/fragment-only/path-relative) is dropped —
    scheme-only hrefs like ``mailto:`` do NOT match the absolute branch
    because it requires ``://``. The base URL is canonicalized FIRST,
    so resolution survives case/port/www./tracking noise in the page's
    own crawl URL. Output (id, src, dst) canonical URL edges."""
    src = canonicalize_url(F.col(url_col))
    base_scheme = F.regexp_extract(src, _URL_RE, 1)
    base_host = F.regexp_extract(src, _URL_RE, 2)
    h = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), 1)
    ).alias("href")
    exploded = pages.select(
        F.col(id_col).alias("id"), src.alias("src"),
        base_scheme.alias("bs"), base_host.alias("bh"), h
    )
    return (
        exploded.withColumn(
            "dst",
            canonicalize_url(
                _resolve_href(F.col("href"), F.col("bs"), F.col("bh"))
            ),
        )
        .filter(F.col("dst").isNotNull())
        .select("id", "src", "dst")
    )


def _resolve_href(href, base_scheme, base_host):
    """Shared href→absolute-URL resolution (see extract_links docstring
    for the covered subset); unresolvable hrefs become NULL."""
    return (
        F.when(href.rlike(_ABS_RE), href)
        .when(
            href.startswith("//"),
            F.concat(base_scheme, F.lit(":"), href),
        )
        .when(
            href.startswith("/"),
            F.concat(base_scheme, F.lit("://"), base_host, href),
        )
        .otherwise(F.lit(None))
    )


# Full <a> elements with their inner text (double-quoted href, no
# nested tags inside the anchor body — the same closed deterministic
# contract as _HREF_RE so DuckDB twins can assert closed-form output).
_ANCHOR_RE = r'<a href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_anchor_texts(
    pages: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(id, src, dst, anchor): link edges WITH their normalized anchor
    text — the web's own description of the target page (crawl
    prioritization, KG entity naming, target-side quality signal).

    Same extraction/resolution contract as ``extract_links`` (the dst
    sets are identical), one extra captured group: the anchor's inner
    text, lower-cased and whitespace-trimmed; empty texts become NULL
    (kept — the edge still exists, it just carries no description).
    Pure codegen: regexp_extract_all full matches, per-element group
    pulls inside ``F.transform``, explode, resolve — no shuffle, no
    Python; runs inside the page scan at 100 TB."""
    src = canonicalize_url(F.col(url_col))
    base_scheme = F.regexp_extract(src, _URL_RE, 1)
    base_host = F.regexp_extract(src, _URL_RE, 2)
    matches = F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), 0)
    pair = F.explode(
        F.transform(
            matches,
            lambda m: F.struct(
                F.regexp_extract(m, _ANCHOR_RE, 1).alias("href"),
                F.regexp_extract(m, _ANCHOR_RE, 2).alias("txt"),
            ),
        )
    ).alias("a")
    exploded = pages.select(
        F.col(id_col).alias("id"), src.alias("src"),
        base_scheme.alias("bs"), base_host.alias("bh"), pair
    )
    anchor = F.trim(F.lower(F.col("a.txt")))
    return (
        exploded.withColumn(
            "dst",
            canonicalize_url(
                _resolve_href(F.col("a.href"), F.col("bs"), F.col("bh"))
            ),
        )
        .filter(F.col("dst").isNotNull())
        .select(
            "id", "src", "dst",
            F.when(anchor != "", anchor).alias("anchor"),
        )
    )


def anchor_text_profile(
    anchors: DataFrame, max_texts: int = 8
) -> DataFrame:
    """Per-target anchor-text aggregation: how the rest of the corpus
    describes each page. Output (dst, n_refs, n_srcs, texts) where
    ``texts`` is the '|'-joined sorted distinct anchor texts, capped at
    ``max_texts`` (lexicographically first k) so hub pages with
    millions of in-links stay bounded — the cap is a per-group window
    over DISTINCT (dst, anchor), never an unbounded collect. All three
    shuffles key on dst, so AQE coalesces them into one exchange
    lineage."""
    counts = anchors.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("src").alias("n_srcs"),
    )
    w = Window.partitionBy("dst").orderBy("anchor")
    texts = (
        anchors.filter(F.col("anchor").isNotNull())
        .select("dst", "anchor")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_texts)
        .groupBy("dst")
        .agg(
            F.array_join(F.array_sort(F.collect_list("anchor")), "|").alias(
                "texts"
            )
        )
    )
    return counts.join(texts, "dst", "left")


def host_graph(
    link_edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Collapse URL-level link edges to the weighted host graph:
    (src_host, dst_host, n_links). One map-side-combinable groupBy —
    hot host pairs combine before the shuffle. Self-loops are kept
    (same-host navigation is real crawl-prioritization signal; drop
    them at the consumer if unwanted)."""
    return (
        link_edges.groupBy(
            host_of(F.col(src_col)).alias("src_host"),
            host_of(F.col(dst_col)).alias("dst_host"),
        )
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def domain_filter(
    links: DataFrame, blocked_domains: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registered domain is on the blocklist. The
    blocklist join is a broadcast anti-join bounded by the curated
    list, never the corpus."""
    from graphiti_spark.functions.smalldf import literal_df

    block = literal_df(
        links.sparkSession,
        [(d,) for d in sorted(set(blocked_domains))],
        [("domain", "string")],
    )
    canon = links.withColumn("url_canon", canonicalize_url(F.col(url_col)))
    canon = canon.withColumn(
        "domain", registered_domain(host_of(F.col("url_canon")))
    )
    return canon.join(F.broadcast(block), "domain", "left_anti")


def snapshot_diff(
    prev: DataFrame,
    curr: DataFrame,
    key_col: str = "url_canon",
    sha_col: str = "content_sha",
) -> DataFrame:
    """Diff two crawl snapshots by canonical URL and content identity:
    one row per URL seen in either snapshot, tagged ``new`` (in curr
    only), ``gone`` (in prev only), ``changed`` (both, different
    content sha) or ``unchanged``.

    This is the incremental-crawl front door: a recrawl of a 10^12-page
    corpus re-processes only ``status IN ('new','changed')`` (the
    refetch set feeds ``operators.incremental.ingest_incremental`` as
    the batch, and ``gone`` drives takedown deletes — the same
    delete-then-append delta contract as materialize.apply_graph_delta).
    The reference re-ingests every episode on every run
    (graphiti_core/graphiti.py add_episode has no snapshot notion); at
    crawl scale the diff IS the workload reduction.

    Scale shape: both inputs are one-row-per-canonical-URL (run
    ``url_dedup`` first); the diff is a single full-outer sort-merge
    join co-partitioned on the canonical URL — one shuffle per side,
    status derivation is pure whole-stage codegen on the joined row.
    No UDFs, no skew hazard beyond the key itself (canonical URLs are
    unique by construction after url_dedup).
    """
    p = prev.select(F.col(key_col), F.col(sha_col).alias("prev_sha"))
    c = curr.select(F.col(key_col), F.col(sha_col).alias("curr_sha"))
    joined = p.join(c, key_col, "full_outer")
    status = (
        F.when(F.col("prev_sha").isNull(), F.lit("new"))
        .when(F.col("curr_sha").isNull(), F.lit("gone"))
        .when(F.col("prev_sha") == F.col("curr_sha"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col(key_col), status.alias("status"), "prev_sha", "curr_sha"
    )


def refetch_set(diff: DataFrame) -> DataFrame:
    """The URLs a recrawl must actually process: ``new`` + ``changed``
    rows of a ``snapshot_diff``. Pure filter — pushes down into the
    diff join's output, no extra shuffle."""
    return diff.filter(F.col("status").isin("new", "changed"))
