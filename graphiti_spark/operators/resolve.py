"""Entity resolution (SURVEY.md §2.3, D1–D10).

Reference flow (graphiti_core/utils/maintenance/node_operations.py:395-450 +
dedup_helpers.py): exact-normalized match → entropy gate → MinHash/LSH
blocking → Jaccard ≥ 0.9 accept → LLM escalation. This engine reproduces
the deterministic passes exactly (same constants) and replaces the LLM
escalation with an embedding-cosine fallback (D8', north_star).

Batch formulation (replaces the per-name loop):

  1. mentions → DISTINCT (group_id, name) candidate entities; exact
     canonicalization IS the identity `uuid = sha256(group_id|name_norm)`
     (D1: names that normalize equal share a uuid by construction).
  2. entropy gate (native columns) splits names into fuzzy-eligible vs not.
  3. fuzzy-eligible names: native shingles → MinHash (pandas UDF) →
     explode LSH bands → self-join on (band_idx, band_key) = THE blocking
     shuffle (reference's lsh_buckets, dedup_helpers.py:117-128,170-195).
  4. candidate pairs → native Jaccard; accept ≥ 0.9 (D7); pairs failing
     Jaccard get the embedding-cosine fallback ≥ 0.95 (D8').
  5. accepted duplicate pairs → connected components (min-uuid canonical,
     D13/D14) → uuid_map(alias → canonical).

Scale notes: everything after step 1 operates on DISTINCT names — orders
of magnitude smaller than the mention stream. The LSH band join is the
only quadratic-risk stage; bucket sizes are bounded by band collisions
(reference accepts the same bound), and a per-bucket cap guards
pathological buckets. groupBy in step 1 does map-side partial
aggregation; hub names never concentrate because the key is the name
itself (uniform by hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark import ids
from graphiti_spark.config import (
    EMBED_COSINE_THRESHOLD,
    FUZZY_JACCARD_THRESHOLD,
)
from graphiti_spark.functions.dedup_text import (
    entropy_gate_col,
    jaccard_col,
    lsh_band_keys_col,
    minhash_signature_udf,
    normalize_name_for_fuzzy_col,
    normalize_string_exact_col,
    shingles_col,
)
from graphiti_spark.functions.embed import cosine_col, make_embed_udf

# Guard against pathological LSH buckets (all-identical band values).
MAX_BUCKET_SIZE = 1000


def extracted_entities(mentions: DataFrame) -> DataFrame:
    """mentions(episode_uuid, group_id, name, …) → distinct candidate
    entities with deterministic exact-canonical uuids (D1)."""
    return (
        mentions.select(
            "group_id",
            normalize_string_exact_col(F.col("name")).alias("name"),
        )
        .groupBy("group_id", "name")
        .agg(F.count(F.lit(1)).alias("mention_count"))
        .withColumn("uuid", ids.entity_uuid_col(F.col("group_id"), F.col("name")))
    )


def banded_names(entities: DataFrame) -> DataFrame:
    """(uuid, group_id, name) → one row per LSH band of every
    fuzzy-eligible name: (uuid, group_id, name, shingles, band_idx,
    band_key). The shared blocking front-end of batch self-dedup (D12)
    and incremental resolve-vs-existing-graph (D9)."""
    prepared = (
        entities.withColumn("fuzzy", normalize_name_for_fuzzy_col(F.col("name")))
        .withColumn("gate", entropy_gate_col(F.col("fuzzy")))
        .filter(F.col("gate"))  # low-entropy names resolve via exact only (D3)
        .withColumn("shingles", shingles_col(F.col("fuzzy")))
        .withColumn("sig", minhash_signature_udf(F.col("shingles")))
        .withColumn("bands", lsh_band_keys_col(F.col("sig")))
    )
    return prepared.select(
        "uuid",
        "group_id",
        "name",
        "shingles",
        F.explode("bands").alias("band"),
    ).select(
        "uuid",
        "group_id",
        "name",
        "shingles",
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )


def capped_buckets(
    banded: DataFrame,
    max_bucket: int = MAX_BUCKET_SIZE,
    keys: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split banded rows into (kept, dropped_bucket_metrics).

    A bucket above max_bucket is a pathological LSH collision (e.g. all-
    identical band values); dropping it bounds the pair join but LOSES
    RECALL, so the drop is surfaced as a metrics frame
    (*keys, bucket_n) instead of silently vanishing — callers feed it to
    lineage/bench output."""
    keys = keys or ["group_id", "band_idx", "band_key"]
    bucket_sizes = banded.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    kept = banded.join(bucket_sizes.filter(F.col("bucket_n") <= max_bucket), keys)
    dropped = bucket_sizes.filter(F.col("bucket_n") > max_bucket)
    return kept, dropped


def _score_candidate_pairs(pairs: DataFrame) -> DataFrame:
    """Shared D7/D8' acceptance: exact Jaccard ≥ 0.9, else near-misses
    (0.5 ≤ j < 0.9) escalate to embedding cosine ≥ 0.95. Input columns:
    a_uuid, a_name, a_shingles, b_uuid, b_name, b_shingles."""
    embed_udf = make_embed_udf()
    scored = pairs.withColumn(
        "jaccard", jaccard_col(F.col("a_shingles"), F.col("b_shingles"))
    )
    by_jaccard = scored.filter(F.col("jaccard") >= FUZZY_JACCARD_THRESHOLD)
    near_miss = (
        scored.filter(
            (F.col("jaccard") < FUZZY_JACCARD_THRESHOLD) & (F.col("jaccard") >= 0.5)
        )
        .withColumn("a_emb", embed_udf(F.col("a_name")))
        .withColumn("b_emb", embed_udf(F.col("b_name")))
        .withColumn("cos", cosine_col(F.col("a_emb"), F.col("b_emb")))
        .filter(F.col("cos") >= EMBED_COSINE_THRESHOLD)
    )
    return (
        by_jaccard.select(F.col("a_uuid").alias("src"), F.col("b_uuid").alias("dst"))
        .union(
            near_miss.select(
                F.col("a_uuid").alias("src"), F.col("b_uuid").alias("dst")
            )
        )
        .distinct()
    )


def duplicate_pairs(
    entities: DataFrame, dropped_sink: list | None = None
) -> DataFrame:
    """Fuzzy duplicate discovery: LSH blocking + Jaccard + embedding
    fallback. Input: entities(uuid, group_id, name). Output: (src, dst)
    accepted duplicate pairs (src ≠ dst, undirected, distinct).

    ``dropped_sink``: optional list; if given, the dropped-bucket metrics
    DataFrame is appended (lazily evaluated by the caller)."""
    banded = banded_names(entities)
    capped, dropped = capped_buckets(banded)
    if dropped_sink is not None:
        dropped_sink.append(dropped)

    left = capped.select(
        "group_id",
        "band_idx",
        "band_key",
        F.col("uuid").alias("a_uuid"),
        F.col("name").alias("a_name"),
        F.col("shingles").alias("a_shingles"),
    )
    right = capped.select(
        "group_id",
        "band_idx",
        "band_key",
        F.col("uuid").alias("b_uuid"),
        F.col("name").alias("b_name"),
        F.col("shingles").alias("b_shingles"),
    )
    pairs = (
        left.join(right, ["group_id", "band_idx", "band_key"])
        .filter(F.col("a_uuid") < F.col("b_uuid"))
        .select("a_uuid", "a_name", "a_shingles", "b_uuid", "b_name", "b_shingles")
        .dropDuplicates(["a_uuid", "b_uuid"])
    )
    return _score_candidate_pairs(pairs)


def duplicate_pairs_between(
    new_entities: DataFrame,
    existing_entities: DataFrame,
    dropped_sink: list | None = None,
) -> DataFrame:
    """D9 batch form — resolve NEW names against the EXISTING graph's
    name index (reference node_operations.py:211-243 retrieves
    candidates per extracted name; here one LSH band join does it for
    the whole batch). Acceptance rules identical to duplicate_pairs.
    Output (src, dst) with src < dst so downstream CC treats the union
    of within-batch and cross-batch pairs uniformly."""
    new_banded = banded_names(new_entities)
    old_banded = banded_names(existing_entities)
    # cap on the combined bucket population (mirrors what one big batch
    # would have seen)
    combined, dropped = capped_buckets(new_banded.unionByName(old_banded))
    if dropped_sink is not None:
        dropped_sink.append(dropped)
    keys = ["group_id", "band_idx", "band_key"]
    kept_keys = combined.select(*keys).distinct()
    left = new_banded.join(kept_keys, keys).select(
        *keys,
        F.col("uuid").alias("a_uuid"),
        F.col("name").alias("a_name"),
        F.col("shingles").alias("a_shingles"),
    )
    right = old_banded.join(kept_keys, keys).select(
        *keys,
        F.col("uuid").alias("b_uuid"),
        F.col("name").alias("b_name"),
        F.col("shingles").alias("b_shingles"),
    )
    pairs = (
        left.join(right, keys)
        .filter(F.col("a_uuid") != F.col("b_uuid"))
        .select(
            F.least("a_uuid", "b_uuid").alias("lo"),
            F.greatest("a_uuid", "b_uuid").alias("hi"),
            F.when(F.col("a_uuid") < F.col("b_uuid"), F.col("a_name"))
            .otherwise(F.col("b_name"))
            .alias("lo_name"),
            F.when(F.col("a_uuid") < F.col("b_uuid"), F.col("b_name"))
            .otherwise(F.col("a_name"))
            .alias("hi_name"),
            F.when(F.col("a_uuid") < F.col("b_uuid"), F.col("a_shingles"))
            .otherwise(F.col("b_shingles"))
            .alias("lo_shingles"),
            F.when(F.col("a_uuid") < F.col("b_uuid"), F.col("b_shingles"))
            .otherwise(F.col("a_shingles"))
            .alias("hi_shingles"),
        )
        .dropDuplicates(["lo", "hi"])
        .select(
            F.col("lo").alias("a_uuid"),
            F.col("lo_name").alias("a_name"),
            F.col("lo_shingles").alias("a_shingles"),
            F.col("hi").alias("b_uuid"),
            F.col("hi_name").alias("b_name"),
            F.col("hi_shingles").alias("b_shingles"),
        )
    )
    return _score_candidate_pairs(pairs)


def canonical_uuid_map(entities: DataFrame, pairs: DataFrame) -> DataFrame:
    """entities × duplicate pairs → uuid_map(uuid → canonical_uuid) covering
    EVERY entity (identity rows included) — the reference's compressed
    uuid_map contract (bulk_utils.py:498-535, min-uuid root)."""
    from graphiti_spark.operators.cc import connected_components

    cc = connected_components(pairs)
    return entities.select("uuid").join(cc, "uuid", "left").select(
        "uuid", F.coalesce("canonical_uuid", "uuid").alias("canonical_uuid")
    )
