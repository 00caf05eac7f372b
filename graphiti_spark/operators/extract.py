"""Deterministic mention + triple extraction (SURVEY.md E1/E4).

The reference extracts entities and (subj, pred, obj) facts per episode
with LLM prompts (extract_nodes: node_operations.py:88-208; extract_edges:
edge_operations.py:89-238). This engine replaces the LLM with a FROZEN
gazetteer grammar over the corpus's closed vocabulary (config.py):

  mention  := [ADJECTIVE] ENTITY_NOUN           (name = "adj noun" | "noun")
  triple   := for every RELATION_VERB token v:
                subj = nearest mention at position < v
                obj  = nearest mention at position > v
                pred = upper(verb); fact = "subj verb obj"
              (skipped if either side is missing or subj == obj)

Execution is 100% native Spark — posexplode + two window functions — so
extraction stays inside whole-stage codegen with zero Python per row.
The window partitions by episode uuid: per-partition work is bounded by
document length, embarrassingly parallel, skew-free at any corpus size.

extract_mentions_and_triples returns (mentions_df, triples_df) where
  mentions_df: (episode_uuid, group_id, valid_at, name)     one row per
               DISTINCT mention name per episode
  triples_df:  (episode_uuid, group_id, valid_at, subj_name, pred,
               obj_name, fact)                              distinct per episode

A pure-Python twin (`extract_from_text`) encodes the same frozen grammar
for expectation-set construction in tests (P/R harness) — the two are
asserted equal in tests/test_extract.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.config import (
    ADJECTIVES,
    ADJECTIVES_SORTED,
    ENTITY_NOUNS,
    ENTITY_NOUNS_SORTED,
    RELATION_VERBS,
    RELATION_VERBS_SORTED,
)

# ----------------------------------------------------------- pure python --


def tokenize(text: str) -> list[str]:
    return [t for t in text.split() if t]


def extract_from_text(text: str) -> tuple[list[str], list[tuple[str, str, str, str]]]:
    """Frozen-grammar extraction of one document.

    Returns (distinct mention names in first-occurrence order,
             distinct (subj, pred, obj, fact) in first-occurrence order).
    """
    toks = tokenize(text)
    mention_at: dict[int, str] = {}
    for i, tok in enumerate(toks):
        if tok in ENTITY_NOUNS:
            if i > 0 and toks[i - 1] in ADJECTIVES:
                mention_at[i] = f"{toks[i - 1]} {tok}"
            else:
                mention_at[i] = tok

    mentions: list[str] = []
    seen_m: set[str] = set()
    for i in sorted(mention_at):
        name = mention_at[i]
        if name not in seen_m:
            seen_m.add(name)
            mentions.append(name)

    positions = sorted(mention_at)
    triples: list[tuple[str, str, str, str]] = []
    seen_t: set[tuple[str, str, str]] = set()
    for v, tok in enumerate(toks):
        if tok not in RELATION_VERBS:
            continue
        prev = [p for p in positions if p < v]
        nxt = [p for p in positions if p > v]
        if not prev or not nxt:
            continue
        subj = mention_at[prev[-1]]
        obj = mention_at[nxt[0]]
        if subj == obj:
            continue
        key = (subj, tok.upper(), obj)
        if key in seen_t:
            continue
        seen_t.add(key)
        triples.append((subj, tok.upper(), obj, f"{subj} {tok} {obj}"))
    return mentions, triples


# ---------------------------------------------------------------- spark ---


# E6 in-text date extraction (replaces the reference's LLM date prompt,
# prompts/extract_edges.py DATETIME RULES + temporal_operations.py:33-71):
#   - first ISO date (yyyy-mm-dd) in the content → that date at 00:00:00
#   - else first standalone year (19xx/20xx)     → January 1st (rule:
#     "If only a year is mentioned, use January 1st at 00:00:00")
#   - else (ongoing / no time stated)            → REFERENCE_TIME, which
#     for a crawled page is its warc_ts (rule: "If the fact is ongoing,
#     set valid_at to REFERENCE_TIME")
_ISO_DATE_RE = r"\b(\d{4}-\d{2}-\d{2})\b"
_YEAR_RE = r"\b((?:19|20)\d{2})\b"


def stated_date_col(content, reference_time):
    """First stated date in ``content`` resolved against
    ``reference_time`` (native regexp_extract + to_timestamp)."""
    iso = F.regexp_extract(content, _ISO_DATE_RE, 1)
    year = F.regexp_extract(content, _YEAR_RE, 1)
    return (
        F.when(iso != "", F.to_timestamp(iso, "yyyy-MM-dd"))
        .when(year != "", F.to_timestamp(F.concat(year, F.lit("-01-01")), "yyyy-MM-dd"))
        .otherwise(reference_time)
    )


def tokens_df(episodes: DataFrame) -> DataFrame:
    """episodes(uuid, group_id, valid_at, content) → one row per token with
    its 0-based position and the previous token (for adjective attachment)."""
    toks = F.split(F.trim(F.col("content")), r"\s+")
    return (
        episodes.select(
            F.col("uuid").alias("episode_uuid"),
            "group_id",
            "valid_at",
            toks.alias("toks"),
        )
        .select(
            "episode_uuid",
            "group_id",
            "valid_at",
            F.posexplode("toks").alias("pos", "tok"),
            # element_at is 1-based → index `pos` is the previous token.
            F.when(F.col("pos") > 0, F.element_at(F.col("toks"), F.col("pos")))
            .otherwise(F.lit(None))
            .alias("prev_tok"),
        )
        .filter(F.col("tok") != "")
    )


def _mention_name_col():
    is_noun = F.col("tok").isin(*ENTITY_NOUNS_SORTED)
    prev_is_adj = F.col("prev_tok").isin(*ADJECTIVES_SORTED)
    return F.when(
        is_noun & prev_is_adj, F.concat_ws(" ", F.col("prev_tok"), F.col("tok"))
    ).when(is_noun, F.col("tok"))


def _mention_tagged(
    toks: DataFrame, excluded_entity_types: tuple = ()
) -> DataFrame:
    """tokens_df rows + the (exclusion-suppressed) mention_name column —
    the ONE place the surviving-mention rule lives; extract_token_stream
    (the pipeline path) and pronoun_mentions both consume it, so the E3
    semantics can't diverge between them."""
    mention_name = _mention_name_col()
    if excluded_entity_types:
        from graphiti_spark.functions.typing import entity_type_col

        mention_name = F.when(
            entity_type_col(mention_name).isin(sorted(excluded_entity_types)),
            F.lit(None),
        ).otherwise(mention_name)
    return toks.withColumn("mention_name", mention_name)


def extract_token_stream(
    episodes: DataFrame,
    excluded_entity_types: tuple = (),
) -> DataFrame:
    """The shared mention/verb token stream both extraction outputs
    derive from: one posexplode + tagging pass, filtered to the rows the
    windows need. Returned (not persisted) so the caller decides the
    reuse strategy — run_pipeline materializes it as its own stage so
    the extraction chain runs ONCE per batch, not once per output
    (VERDICT r03 wrong #1).

    ``excluded_entity_types`` (E3, reference node_operations.py:188-192):
    mentions classified into an excluded type are suppressed BEFORE the
    subject/object windows, so a verb between an excluded mention and an
    included one binds to the nearest SURVIVING mention — exactly the
    reference behaviour of extracting edges over the filtered entity
    list."""
    # E6: facts carry the episode's stated in-text date (else warc_ts);
    # pure regexp — a corpus without temporal expressions is unchanged.
    episodes = episodes.withColumn(
        "valid_at", stated_date_col(F.col("content"), F.col("valid_at"))
    )
    toks = tokens_df(episodes)
    tagged = _mention_tagged(toks, excluded_entity_types).withColumn(
        "is_verb", F.col("tok").isin(*RELATION_VERBS_SORTED)
    )
    # Only mention/verb rows participate in the windows; prev_tok is
    # consumed by the mention tagging above and dropped here so the
    # materialized stream carries only what the two outputs read.
    return tagged.filter(
        F.col("mention_name").isNotNull() | F.col("is_verb")
    ).select(
        "episode_uuid", "group_id", "valid_at", "pos", "tok",
        "mention_name", "is_verb",
    )


def mentions_from_stream(stream: DataFrame) -> DataFrame:
    """E1 mentions from the shared token stream: one distinct name per
    episode.

    distinct over ALL carried columns (group_id/valid_at are functions
    of episode_uuid): plain distinct → HashAggregate; a
    dropDuplicates(subset)+first() would force a SortAggregate over the
    full token stream — measurably slower at corpus scale."""
    return (
        stream.filter(F.col("mention_name").isNotNull())
        .select(
            "episode_uuid",
            "group_id",
            "valid_at",
            F.col("mention_name").alias("name"),
        )
        .distinct()
    )


def triples_from_stream(stream: DataFrame) -> DataFrame:
    """E4 triples from the shared token stream: nearest surviving mention
    on each side of every relation verb."""
    w = Window.partitionBy("episode_uuid").orderBy("pos")
    subj = F.last("mention_name", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    obj = F.first("mention_name", ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    triples = (
        stream.withColumn("subj_name", subj)
        .withColumn("obj_name", obj)
        .filter(
            F.col("is_verb")
            & F.col("subj_name").isNotNull()
            & F.col("obj_name").isNotNull()
            & (F.col("subj_name") != F.col("obj_name"))
        )
        .select(
            "episode_uuid",
            "group_id",
            "valid_at",
            "subj_name",
            F.upper(F.col("tok")).alias("pred"),
            "obj_name",
            F.concat_ws(" ", F.col("subj_name"), F.col("tok"), F.col("obj_name")).alias(
                "fact"
            ),
        )
        .distinct()  # fact/valid_at/group_id are functions of the key cols
    )
    return triples


def extract_mentions_and_triples(
    episodes: DataFrame,
    excluded_entity_types: tuple = (),
) -> tuple[DataFrame, DataFrame]:
    """Native-Spark twin of extract_from_text over the whole corpus:
    (mentions, triples), both derived from one shared token stream (the
    two returned frames share the stream PLAN; callers that consume both
    should materialize the stream via extract_token_stream + persist, as
    run_pipeline and ingest_incremental do)."""
    stream = extract_token_stream(episodes, excluded_entity_types)
    return mentions_from_stream(stream), triples_from_stream(stream)


# E1 pronoun disambiguation (reference prompts/extract_nodes.py:86-196
# instructs pronoun resolution during extraction). The FROZEN default
# grammar deliberately ignores pronouns — the expected-triple set is a
# contract — so this is a standalone operator, not a pipeline stage.
PRONOUNS = (
    "he", "she", "it", "they", "him", "her", "them", "his", "its",
    "their",
)


def pronoun_mentions(
    episodes: DataFrame, excluded_entity_types: tuple = ()
) -> DataFrame:
    """Resolve each pronoun token to the nearest PRECEDING surviving
    mention in its episode — the recency heuristic standing in for the
    reference's LLM pronoun disambiguation (E1). Trailing punctuation
    is stripped before the pronoun match; a pronoun with no preceding
    mention is dropped (the reference's unresolvable-pronoun guard).
    Output (episode_uuid, pronoun_idx, pronoun, antecedent) —
    ``pronoun_idx`` is the 1-based rank of the pronoun among the
    episode's RESOLVED pronouns in text order, not an absolute token
    offset: occurrence rank is invariant to how an engine numbers
    whitespace runs, so the oracle can't be destabilized by
    multi-space/tab content (absolute positions differ between
    split-then-filter and filter-then-number tokenizers).

    Scale shape: the same one-posexplode token pass and per-episode
    window as the main extraction — pure codegen, no Python. The
    mention tagging (incl. E3 exclusion suppression) is shared with
    extract_token_stream via _mention_tagged."""
    pron = F.regexp_replace(F.lower(F.col("tok")), r"[.,;:!?]+$", "")
    tagged = _mention_tagged(
        tokens_df(episodes), excluded_entity_types
    ).withColumn(
        "pronoun",
        F.when(
            pron.isin(*PRONOUNS) & F.col("mention_name").isNull(), pron
        ),
    )
    stream = tagged.filter(
        F.col("mention_name").isNotNull() | F.col("pronoun").isNotNull()
    )
    w = Window.partitionBy("episode_uuid").orderBy("pos")
    ante = F.last("mention_name", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    resolved = stream.withColumn("antecedent", ante).filter(
        F.col("pronoun").isNotNull() & F.col("antecedent").isNotNull()
    )
    idx = F.row_number().over(w)
    return resolved.select(
        "episode_uuid",
        idx.cast("int").alias("pronoun_idx"),
        "pronoun",
        "antecedent",
    )
