"""Corpus-curation operators for training-data pipelines: PII
detection / redaction, benchmark decontamination, token-window
chunking.

The reference (peabodyAdmin/graphiti) has no corpus-hygiene layer —
like textstats.py these extend the engine for the 100 TB web-text use
case (SURVEY §2 "beyond the reference" family): a Common-Crawl-style
corpus is scanned for PII before any text leaves the pipeline,
decontaminated against evaluation benchmarks before training, and
chunked into token windows for the training loader.

Scale notes:
  - ``pii_scan`` / ``pii_redact`` / ``chunk_tokens`` are pure per-row
    column expressions — whole-stage codegen, no shuffle, no UDFs.
  - ``decontaminate`` shuffles once (the per-doc hit count); its only
    join is against the benchmark gram set, which is bounded by the
    benchmark suite (MB-scale by construction, NOT the corpus), so the
    broadcast is safe at any corpus size — the one case where a forced
    broadcast is the honest default (``broadcast=False`` opts out).

Every regex below is deliberately restricted to the syntax subset that
Java regex (Spark) and RE2 (DuckDB) evaluate identically: character
classes, bounded repetition, ``\\b`` word boundaries — no lookaround,
no backreferences — so the DuckDB oracles reproduce matches exactly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One tokenization + gram-window contract across fingerprinting and
# decontamination — a second copy here would silently desynchronize the
# oracles' single-space-split equivalence argument.
from .textstats import _tokens, gram_shas as _gram_shas

# Detection order matters for redaction: emails first (their domains
# contain dot-runs an IPv4 pattern could half-match), then IPs, then
# phones. Counting re-scans the already-redacted text so a span is
# never attributed to two types.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}-\d{3}-\d{3}-\d{4}\b",
}

DECONTAM_GRAM = 13  # GPT-3-style 13-gram exact-overlap rule


def pii_scan(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-type PII match counts. Output (id, n_email, n_ipv4,
    n_phone, n_pii). Spans already consumed by an earlier type are not
    re-counted by a later one (same masking order as ``pii_redact``,
    so scan counts always equal redaction counts)."""
    masked = F.col(text_col)
    cols = [F.col(id_col).alias("id")]
    total = F.lit(0).cast("long")
    for name, pat in PII_PATTERNS.items():
        c = F.size(F.regexp_extract_all(masked, F.lit(pat), F.lit(0))).cast(
            "long"
        )
        cols.append(c.alias(f"n_{name}"))
        total = total + c
        masked = F.regexp_replace(masked, pat, f"<{name.upper()}>")
    cols.append(total.alias("n_pii"))
    return docs.select(*cols)


def pii_redact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Replace every PII span with its type tag (``<EMAIL>`` /
    ``<IPV4>`` / ``<PHONE>``). Output (id, redacted, n_redacted)."""
    red = F.col(text_col)
    n = F.lit(0).cast("long")
    for name, pat in PII_PATTERNS.items():
        n = n + F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0))).cast(
            "long"
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.select(
        F.col(id_col).alias("id"),
        red.alias("redacted"),
        n.alias("n_redacted"),
    )




def benchmark_grams(
    benchmark: DataFrame,
    text_col: str = "text",
    gram: int = DECONTAM_GRAM,
) -> DataFrame:
    """Distinct sha256 gram-window hashes of the benchmark suite.
    Output (gram_sha) — build once per benchmark release and reuse
    across corpus sweeps."""
    return (
        benchmark.select(
            F.explode(_gram_shas(_tokens(F.col(text_col)), gram)).alias(
                "gram_sha"
            )
        )
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram: int = DECONTAM_GRAM,
    broadcast: bool = True,
) -> DataFrame:
    """GPT-3-style benchmark decontamination: a document is
    contaminated when any of its ``gram``-token windows appears
    verbatim in the benchmark suite. Output (id, n_contaminated_grams,
    contaminated).

    The exploded doc-gram stream is corpus-sized (≈ one row per
    token), but it never shuffles: the benchmark-gram join is a
    broadcast hash join and the per-doc count is map-side combinable,
    so the only full shuffle is |docs| rows of (id, count)."""
    bg = benchmark_grams(benchmark, text_col, gram)
    if broadcast:
        bg = F.broadcast(bg)
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_gram_shas(_tokens(F.col(text_col)), gram)).alias(
            "gram_sha"
        ),
    )
    hits = (
        doc_grams.join(bg, "gram_sha")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(
                F.col("n_contaminated_grams"), F.lit(0).cast("long")
            ).alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_sep: str = "\n",
) -> DataFrame:
    """C4/CCNet-style corpus-level line dedup: each distinct normalized
    (trim+lower) line survives only at its FIRST occurrence — minimal
    (doc id, line position) across the whole corpus; later copies
    (boilerplate, nav bars, cookie banners) are dropped and docs are
    reassembled from their surviving lines in original order.

    Scale: the first-occurrence winner per line is a map-side-combinable
    ``min(struct(doc, idx))`` keyed by the line hash, so hot boilerplate
    lines partially aggregate before the shuffle — no hub reducer; the
    keep join is keyed by the (hash, doc, idx) triple, unique per input
    line, so no shuffle key carries more than one row per occurrence.
    Output (id, text_dedup, n_kept, n_dropped)."""
    # F.split takes a REGEX but concat_ws rejoins with the literal —
    # escape so separators like "." or "|" split literally too.
    sep_pat = re.escape(line_sep)
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep_pat, -1)).alias(
            "idx", "line"
        ),
    ).withColumn(
        "lh", F.sha2(F.trim(F.lower(F.col("line"))).cast("binary"), 256)
    )
    winners = lines.groupBy("lh").agg(
        F.min(F.struct(F.col("id"), F.col("idx"))).alias("w")
    )
    kept = lines.join(
        winners.select(
            "lh", F.col("w.id").alias("id"), F.col("w.idx").alias("idx")
        ),
        ["lh", "id", "idx"],
    )
    agg = (
        kept.groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("idx"), F.col("line")))
            ).alias("ls")
        )
        .select(
            "id",
            F.concat_ws(
                line_sep, F.transform(F.col("ls"), lambda s: s["line"])
            ).alias("text_dedup"),
            F.size(F.col("ls")).cast("long").alias("n_kept"),
        )
    )
    totals = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), sep_pat, -1))
        .cast("long")
        .alias("n_total"),
    )
    return totals.join(agg, "id", "left").select(
        "id",
        F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


def chunk_tokens(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Token-window chunking for training loaders: windows of ``size``
    tokens stepping by ``size - overlap``, final window truncated at
    the doc end. A window is emitted only if it contributes at least
    one token not covered by its predecessor (starts stop at
    ``n - overlap``), so the chunk set covers every token exactly and
    carries no fully-redundant tail. Output (id, chunk_idx,
    start_token, n_tokens, chunk_text) — per-row map, no shuffle; the
    chunk grid is a pure function of the token count."""
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    toks_col = _tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), toks_col.alias("toks"))
    n = F.size(F.col("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(stride)
    )
    return base.select(
        "id", "toks", F.explode(starts).alias("start_token")
    ).select(
        "id",
        ((F.col("start_token") - 1) / F.lit(stride))
        .cast("int")
        .alias("chunk_idx"),
        F.col("start_token").cast("int").alias("start_token"),
        F.least(
            F.lit(size), F.size(F.col("toks")) - F.col("start_token") + 1
        )
        .cast("long")
        .alias("n_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("start_token"), F.lit(size))
        ).alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 128,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
) -> DataFrame:
    """Concat-and-chunk sequence packing for pretraining loaders: the
    corpus's token streams, concatenated in ascending id order, are cut
    into fixed ``seq_len``-token training sequences; a document may
    straddle a boundary, so the output is one row per (sequence,
    document) overlap segment.

    The global running token offset is the scale trap here: a bare
    ``Window.orderBy(id)`` funnels the corpus through ONE partition. The
    distributed form is the classic two-pass prefix sum — a
    hash-partitioned within-bucket cumsum (bucket = id // bucket_size)
    plus a bucket-level prefix over the AGGREGATED frame (|buckets|
    rows — the only single-partition window, bounded by corpus /
    bucket_size, ~25 M rows at 100 TB-scale doc counts, itself
    bucketable again if ever needed) broadcast back. Everything else is
    codegen arithmetic + one explode over the sequences each doc covers.

    Tokens = non-empty whitespace tokens of lower(trim(text)) — the
    n_ws_tokens convention (textstats.token_stats). Empty docs occupy no
    positions and emit no rows. The final sequence may be partial;
    ``seq_n_tokens`` lets loaders drop or pad it. Ids must be numeric
    (the bucket arithmetic and the packing order both use them); hash a
    string id into a dense long upstream if needed.

    Output: (seq_id, id, doc_token_start, seq_token_start, n_tokens,
    seq_n_tokens) — doc ``id`` contributes tokens [doc_token_start,
    doc_token_start + n_tokens) at offset seq_token_start of sequence
    seq_id.
    """
    from pyspark.sql import Window

    counts = docs.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(_tokens(F.col(text_col)), lambda x: x != ""))
        .cast("long")
        .alias("n_toks"),
        (F.col(id_col).cast("long") / F.lit(bucket_size))
        .cast("long")
        .alias("bucket"),
    ).filter(F.col("n_toks") > 0)

    wb = Window.partitionBy("bucket").orderBy("id")
    in_bucket = counts.withColumn(
        "cum_in_bucket", F.sum("n_toks").over(wb)
    )
    totals = counts.groupBy("bucket").agg(F.sum("n_toks").alias("btot"))
    wt = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket", F.coalesce(F.sum("btot").over(wt), F.lit(0)).alias("boff")
    )
    placed = in_bucket.join(F.broadcast(offsets), "bucket").select(
        "id",
        "n_toks",
        (F.col("boff") + F.col("cum_in_bucket") - F.col("n_toks")).alias(
            "start"
        ),
        (F.col("boff") + F.col("cum_in_bucket")).alias("end"),
    )

    L = F.lit(int(seq_len)).cast("long")
    total = placed.agg(F.max("end").alias("t"))
    segs = placed.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                (F.col("start") / L).cast("long"),
                ((F.col("end") - 1) / L).cast("long"),
            )
        ),
    ).select(
        "seq_id",
        "id",
        F.greatest(F.col("start"), F.col("seq_id") * L).alias("g0"),
        F.least(F.col("end"), (F.col("seq_id") + 1) * L).alias("g1"),
        "start",
    )
    return (
        segs.crossJoin(F.broadcast(total))
        .select(
            F.col("seq_id").cast("long").alias("seq_id"),
            "id",
            (F.col("g0") - F.col("start")).cast("long").alias(
                "doc_token_start"
            ),
            (F.col("g0") - F.col("seq_id") * L).cast("long").alias(
                "seq_token_start"
            ),
            (F.col("g1") - F.col("g0")).cast("long").alias("n_tokens"),
            F.least(
                L, F.col("t") - F.col("seq_id") * L
            ).cast("long").alias("seq_n_tokens"),
        )
    )


def strip_host_boilerplate(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_pages: int = 3,
    frac: float = 0.5,
    line_sep: str = "\n",
) -> DataFrame:
    """Host-scoped boilerplate removal: drop every line that appears on
    at least ``frac`` of a host's pages (hosts with ≥ ``min_pages``
    pages only). This is the nav-bar / footer / cookie-banner cut that
    corpus-GLOBAL line dedup (``dedup_lines``) cannot express: here ALL
    copies go (including the first — boilerplate has no canonical
    occurrence), and an identical line on a small host survives because
    the evidence threshold is per-host.

    Scale: the line-frequency table is a distinct + map-side-combinable
    count keyed by (host, line-hash); the boilerplate set is bounded by
    over-threshold (host, line) pairs, and the removal is a left-anti
    join on the same key — one row per key on the build side, so hub
    hosts fan out but never hot-reduce. The ``frac·n_pages`` threshold
    multiplies a double by an exact integer — bit-identical across
    engines.

    Output (id, host, text_clean, n_kept, n_dropped)."""
    sep_pat = re.escape(line_sep)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(host_col).alias("host"),
        F.col(text_col).alias("text"),
    )
    lines = base.select(
        "id",
        "host",
        F.posexplode(F.split(F.col("text"), sep_pat, -1)).alias(
            "idx", "line"
        ),
    ).withColumn(
        "lh", F.sha2(F.trim(F.lower(F.col("line"))).cast("binary"), 256)
    )
    host_pages = base.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages")
    )
    line_df = (
        lines.select("host", "lh", "id")
        .distinct()
        .groupBy("host", "lh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    boiler = (
        line_df.join(host_pages, "host")
        .filter(
            (F.col("n_pages") >= F.lit(int(min_pages)))
            & (F.col("n_docs") >= F.lit(float(frac)) * F.col("n_pages"))
        )
        .select("host", "lh")
    )
    kept = lines.join(boiler, ["host", "lh"], "left_anti")
    agg = (
        kept.groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("idx"), F.col("line")))
            ).alias("ls")
        )
        .select(
            "id",
            F.concat_ws(
                line_sep, F.transform(F.col("ls"), lambda s: s["line"])
            ).alias("text_clean"),
            F.size(F.col("ls")).cast("long").alias("n_kept"),
        )
    )
    totals = base.select(
        "id",
        "host",
        F.size(F.split(F.col("text"), sep_pat, -1)).cast("long").alias(
            "n_total"
        ),
    )
    return totals.join(agg, "id", "left").select(
        "id",
        "host",
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        (F.col("n_total") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.45,
    broadcast: bool = True,
) -> DataFrame:
    """Embedding-level benchmark decontamination: a document is flagged
    when its embedding's cosine against ANY benchmark embedding reaches
    ``threshold`` — the semantic complement of the exact 13-gram rule
    (``decontaminate``), catching paraphrased/reworded eval leakage
    that verbatim n-grams miss. Output one row per corpus doc:
    (id, max_benchmark_cos, n_matches, contaminated, checked).

    ``checked`` is False for a corpus doc whose OWN embedding is NULL —
    such a doc was never actually compared, and for a contamination
    gate "silently passes as clean" is the unsafe default (ADVICE r4).
    Unchecked rows carry NULL max_benchmark_cos/n_matches/contaminated
    so callers can quarantine them explicitly instead of mistaking
    them for verified-clean.

    Scale shape: the benchmark suite is bounded by the EVAL SETS, not
    the corpus, so its vectors broadcast; the corpus makes ONE pass
    (broadcast nested-loop + map-side-combinable max/count per doc —
    no shuffle wider than |corpus| rows of (id, max, count)). Both
    norms are projected ONCE per side before the cross join (the same
    left-to-right double fold as functions.embed.cosine_col, so the
    quotient is bit-identical to computing them inline), cosines round
    to 4 dp BEFORE the threshold compare and the max (house rules).
    An EMPTY benchmark frame returns every corpus doc clean (max 0.0,
    0 matches) — the per-doc contract holds; don't mistake it for a
    run that checked something."""

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a = corpus.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).cast("array<double>").alias("av"),
    ).withColumn("an", F.sqrt(dot(F.col("av"), F.col("av"))))
    b = benchmark.select(
        F.col(emb_col).cast("array<double>").alias("bv")
    ).withColumn("bn", F.sqrt(dot(F.col("bv"), F.col("bv"))))
    if broadcast:
        b = F.broadcast(b)

    cos = F.when(F.col("bv").isNull(), F.lit(None).cast("double")).otherwise(
        F.round(
            F.when(
                (F.col("an") == 0.0) | (F.col("bn") == 0.0), F.lit(0.0)
            ).otherwise(
                dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
            ),
            4,
        )
        + F.lit(0.0)
    )
    # LEFT outer against the broadcast benchmark: an empty suite keeps
    # one (null-cos) row per corpus doc instead of erasing the corpus —
    # still ONE pass, no corpus-keyed join back
    scored = a.join(b, F.lit(True), "left").select(
        "id", cos.alias("cos"), F.col("av").isNotNull().alias("_ok")
    )
    agg = scored.groupBy("id").agg(
        F.coalesce(F.max("cos") + F.lit(0.0), F.lit(0.0)).alias("_mx"),
        F.sum(F.when(F.col("cos") >= threshold, 1).otherwise(0))
        .cast("long")
        .alias("_nm"),
        F.max("_ok").alias("checked"),
    )
    return agg.select(
        "id",
        F.when(F.col("checked"), F.col("_mx")).alias("max_benchmark_cos"),
        F.when(F.col("checked"), F.col("_nm")).alias("n_matches"),
        F.when(F.col("checked"), F.col("_nm") > 0).alias("contaminated"),
        "checked",
    )


def curation_funnel(
    docs: DataFrame,
    near_dup_threshold: float = 0.95,
    langs: tuple = ("en", "und"),
    min_quality: float = 0.25,
    sample_rate: float = 0.5,
    sample_seed: str = "curate",
) -> DataFrame:
    """The composed curation funnel as ONE declarative DataFrame — the
    oracle-able core of jobs/curate_corpus.py (stages 1-4 + 7): exact
    dedup → MinHash near-dup canonicals → C4 line dedup → language +
    quality gates → deterministic sample. Each stage is individually
    hash-verified elsewhere; this entry hash-proves their COMPOSITION
    (each stage consuming the previous survivors, the rewrite text
    flowing into the gates and the final content sha).

    Output per surviving doc: (doc_id, content_sha = sha256 of the
    line-deduped text, pred_lang, quality, u — the sampling draw).

    Stage boundaries localCheckpoint — but ID-SIZED frames only (r5):
    the dedup stages reference their input 3-4× each, so composing them
    nests the upstream plan multiplicatively (the measured 542 MB
    plan-string lesson in jobs/curate_corpus.py). Checkpointing the
    full text frame at every boundary bounded the plan but serialized
    the whole corpus to local disk 3× — a non-scaling IO component the
    1→4-core protocol measured at ~90 s/leg (37 % of the 4-core wall,
    efficiency 0.723). Checkpointing only the SURVIVOR-ID sets keeps
    the plan linear for the same reason (each downstream reference of
    the stage frame embeds one constant-size scan+join subplan, never
    the upstream dedup pipeline) while the re-scans of the parquet
    source are distributed work that scales with cores. The one
    text-sized checkpoint kept is the stage-3 rewrite map — dedup_lines
    is the costliest stage and is referenced 3× downstream."""
    from graphiti_spark.operators.dedup_docs import (
        canonical_docs,
        exact_dedup,
        minhash_near_dup,
    )
    from graphiti_spark.operators.sampling import sample_fraction
    from graphiti_spark.operators.textstats import language_id, quality_score

    # 1. exact dedup: the canonical copy survives (checkpoint = id set)
    ex = exact_dedup(docs)
    ids1 = (
        ex.filter(F.col("id") == F.col("canonical_id"))
        .select(F.col("id").alias("doc_id"))
        .localCheckpoint()
    )
    d = docs.join(ids1, "doc_id")

    # 2. near-dup canonicals over the survivors (checkpoint = id set)
    canon = canonical_docs(
        d, minhash_near_dup(d, threshold=near_dup_threshold, mode="word")
    )
    ids2 = (
        canon.filter(F.col("id") == F.col("canonical_id"))
        .select(F.col("id").alias("doc_id"))
        .localCheckpoint()
    )
    d = d.join(ids2, "doc_id")

    # 3. corpus-level line dedup; docs emptied by the rewrite drop out
    dl = dedup_lines(d)
    d = (
        d.drop("text")
        .join(
            dl.select(
                F.col("id").alias("doc_id"),
                F.col("text_dedup").alias("text"),
            ),
            "doc_id",
        )
        .filter(F.length("text") > 0)
        .localCheckpoint()
    )

    # 4. language + quality gates over the REWRITTEN text
    lang = language_id(d).select(F.col("id").alias("doc_id"), "pred_lang")
    qual = quality_score(d).select(
        F.col("id").alias("doc_id"), F.col("score").alias("quality")
    )
    d = (
        d.join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter(F.col("pred_lang").isin(*langs))
        .filter(F.col("quality") >= min_quality)
    )

    # 7. deterministic sample (stage numbering mirrors the job)
    d = sample_fraction(d, sample_rate, seed=sample_seed)
    return d.select(
        "doc_id",
        F.sha2(F.col("text").cast("binary"), 256).alias("content_sha"),
        "pred_lang",
        "quality",
        "u",
    )
