"""Incremental ingest: resolve a NEW batch of pages against an EXISTING
persisted graph and merge (SURVEY.md D9/Q7/Q8; VERDICT r01 "the one real
architectural gap").

Reference flow: each new episode's extracted entities are resolved
against the live graph — per-name candidate retrieval
(node_operations.py:211-243), `get_relevant_nodes`/`get_relevant_edges`
batch probes (search_utils.py:1206-1357, :1360-1542), and
`resolve_extracted_edges` vs persisted edges (edge_operations.py:241-403).

Batch-Spark formulation — the expensive resolution work is strictly
incremental (nothing re-blocks the prior graph against itself):

  cross_pairs  = LSH band join of NEW names vs the prior name index
                 (duplicate_pairs_between — D9; never prior × prior)
  pairs        = prior accepted pairs ∪ new-batch pairs ∪ cross_pairs
  uuid_map     = CC over pairs covering all aliases (min-uuid canonical)
  edges        = merge_edge_rows(prior edges exploded to provenance rows
                 ∪ new-batch rows)  — D17 episode union across batches
  nodes/mentions/temporal windows rebuilt over the merged frames

ASSOCIATIVITY CONTRACT: because ids are content-derived and CC picks the
min uuid of the merged component, ingesting batch A then batch B
incrementally produces the SAME graph as ingesting A ∪ B in one batch —
asserted hash-exactly by the `incremental_merge` driver oracle (whose
oracle SQL is the full-batch pipeline) and by tests/test_incremental.py.
The only divergence window is the LSH bucket cap (per-run bucket
populations), which never triggers below MAX_BUCKET_SIZE names per
bucket.

Graph state consumed/produced (materialize.GRAPH_TABLES): nodes, edges,
mention_edges, episodes, plus the resolution index `entities` (alias-
level name index — the Spark stand-in for the reference's graph-DB name
index that get_relevant_nodes probes) and `pairs` (accepted duplicate
pairs; the reference persists these as IS_DUPLICATE_OF edges).

Scale: cross_pairs shuffles |new batch distinct names| × bands rows
against the band-bucketed prior index — at a 10¹²-doc corpus the prior
index is large but the join is band-key-partitioned (uniform hash keys),
and only the NEW side is re-extracted. CC runs over the accepted-pair
graph only (tiny vs the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark import ids
from graphiti_spark.config import RunConfig
from graphiti_spark.operators.edges import (
    edge_provenance_rows,
    merge_edge_rows,
    resolve_edge_pointers,
)
from graphiti_spark.operators.extract import extract_mentions_and_triples
from graphiti_spark.operators.resolve import (
    canonical_uuid_map,
    duplicate_pairs,
    duplicate_pairs_between,
    extracted_entities,
)
from graphiti_spark.operators.temporal import invalidate_edges
from graphiti_spark.sources.pages import pages_to_episodes


def merge_entity_index(
    prior_entities: DataFrame, new_entities: DataFrame
) -> DataFrame:
    """Union the alias-level name indexes, summing mention counts on the
    shared deterministic uuid (exact-name matches across batches collapse
    here for free — same name ⇒ same sha256 uuid)."""
    return (
        prior_entities.select("uuid", "group_id", "name", "mention_count")
        .unionByName(new_entities.select("uuid", "group_id", "name", "mention_count"))
        .groupBy("uuid", "group_id", "name")
        .agg(F.sum("mention_count").alias("mention_count"))
    )


def get_relevant_nodes(
    probe_entities: DataFrame, existing_entities: DataFrame
) -> DataFrame:
    """Q7 batch probe: for each probe name, the existing-graph candidates
    it could resolve to (reference search_utils.py:1206-1357 — hybrid
    per-name retrieval, here the deterministic LSH-candidate set).
    Output (probe_uuid, candidate_uuid) distinct."""
    from graphiti_spark.operators.resolve import banded_names

    keys = ["group_id", "band_idx", "band_key"]
    probes = banded_names(probe_entities).select(
        *keys, F.col("uuid").alias("probe_uuid")
    )
    index = banded_names(existing_entities).select(
        *keys, F.col("uuid").alias("candidate_uuid")
    )
    return (
        probes.join(index, keys)
        .filter(F.col("probe_uuid") != F.col("candidate_uuid"))
        .select("probe_uuid", "candidate_uuid")
        .distinct()
    )


def get_relevant_edges(
    probe_edges: DataFrame, existing_edges: DataFrame
) -> DataFrame:
    """Q8 batch probe: existing edges sharing BOTH endpoints with a probe
    edge (reference search_utils.py:1360-1542 scopes candidates to the
    same source/target pair). Output (probe_uuid, candidate_uuid)."""
    keys = ["group_id", "source_node_uuid", "target_node_uuid"]
    probes = probe_edges.select(*keys, F.col("uuid").alias("probe_uuid"))
    index = existing_edges.select(*keys, F.col("uuid").alias("candidate_uuid"))
    return (
        probes.join(index, keys)
        .filter(F.col("probe_uuid") != F.col("candidate_uuid"))
        .select("probe_uuid", "candidate_uuid")
        .distinct()
    )


def prior_edge_provenance_rows(
    prior_edges: DataFrame,
    prior_episodes: DataFrame,
    uuid_map: DataFrame,
    map_is_small: bool | None = None,
) -> DataFrame:
    """Explode persisted edges back to provenance rows (the
    merge_edge_rows exchange format), re-canonicalizing endpoints through
    the NEW uuid_map (a cross-batch merge can re-point a prior canonical
    at a smaller merged uuid). Per-episode valid_at is recovered from the
    episodes table."""
    from graphiti_spark.operators.extract import stated_date_col

    exploded = prior_edges.select(
        "group_id",
        "source_node_uuid",
        "target_node_uuid",
        "name",
        "fact",
        F.explode("episodes").alias("episode_uuid"),
    )
    # Recover the per-episode reference instant the BATCH path used: the
    # E6 stated in-text date (extract.stated_date_col over the persisted
    # episode content), falling back to warc_ts (= episodes.valid_at).
    # Joining bare episodes.valid_at would diverge from one-batch ingest
    # on any corpus whose text states a date (ADVICE r02, high).
    with_ts = exploded.join(
        prior_episodes.select(
            F.col("uuid").alias("episode_uuid"),
            stated_date_col(F.col("content"), F.col("valid_at")).alias(
                "ep_valid_at"
            ),
        ),
        "episode_uuid",
    )
    remapped = resolve_edge_pointers(with_ts, uuid_map, map_is_small=map_is_small)
    from graphiti_spark.functions.dedup_text import normalize_string_exact_col

    return remapped.select(
        "group_id",
        "source_node_uuid",
        "target_node_uuid",
        "name",
        "fact",
        normalize_string_exact_col(F.col("fact")).alias("fact_norm"),
        "episode_uuid",
        "ep_valid_at",
    )


def rebuild_mention_edges(pairs: DataFrame, run_ts) -> DataFrame:
    """(episode_uuid, group_id, entity_uuid) pairs → MENTIONS edges with
    recomputed deterministic uuids."""
    return pairs.distinct().select(
        ids.mention_uuid_col(F.col("episode_uuid"), F.col("entity_uuid")).alias(
            "uuid"
        ),
        "group_id",
        "episode_uuid",
        "entity_uuid",
        F.lit(run_ts).alias("created_at"),
    )


def ingest_incremental(
    spark: SparkSession,
    new_pages: DataFrame,
    prior: dict[str, DataFrame],
    cfg: RunConfig | None = None,
) -> dict[str, DataFrame]:
    """Resolve + merge a new page batch into a prior graph.

    ``prior``: dict with at least {entities, pairs, edges, episodes,
    mention_edges} (load_graph output / a previous run's outputs).
    Returns the same output map as run_pipeline, covering the MERGED
    graph. See module docstring for the associativity contract.
    """
    from graphiti_spark.pipeline import build_nodes

    cfg = cfg or RunConfig()

    episodes_new = pages_to_episodes(new_pages, cfg.run_ts).persist()
    mentions_new, triples_new = extract_mentions_and_triples(episodes_new)
    entities_new = extracted_entities(mentions_new).persist()

    prior_entities = prior["entities"]
    entities_all = merge_entity_index(prior_entities, entities_new).persist()

    # --- resolution: only new-vs-new and new-vs-prior are blocked ---
    pairs_new = duplicate_pairs(entities_new)
    pairs_cross = duplicate_pairs_between(entities_new, prior_entities)
    pairs_all = (
        prior["pairs"].select("src", "dst")
        .unionByName(pairs_new)
        .unionByName(pairs_cross)
        .distinct()
        .persist()
    )
    uuid_map = canonical_uuid_map(entities_all, pairs_all).persist()
    from graphiti_spark.config import BROADCAST_MAP_MAX_ROWS

    map_small = uuid_map.count() <= BROADCAST_MAP_MAX_ROWS

    # --- edge merge across batches (D17 episode union) ---
    rows_new = edge_provenance_rows(triples_new, uuid_map, map_small)
    rows_prior = prior_edge_provenance_rows(
        prior["edges"], prior["episodes"], uuid_map, map_small
    )
    edges_merged = merge_edge_rows(
        rows_new.unionByName(rows_prior), cfg.run_ts
    ).persist()
    edges = invalidate_edges(edges_merged, cfg.run_ts)

    nodes = build_nodes(
        entities_all, uuid_map, edges_merged, cfg.run_ts, map_is_small=map_small
    )

    # --- mentions provenance across batches ---
    from graphiti_spark.functions.dedup_text import normalize_string_exact_col

    new_mention_pairs = mentions_new.select(
        "episode_uuid",
        "group_id",
        ids.entity_uuid_col(
            F.col("group_id"),
            normalize_string_exact_col(F.col("name")),
        ).alias("entity_uuid"),
    )
    prior_mention_pairs = prior["mention_edges"].select(
        "episode_uuid", "group_id", "entity_uuid"
    )
    all_pairs = new_mention_pairs.unionByName(prior_mention_pairs)
    remapped_pairs = (
        all_pairs.join(
            uuid_map.select(
                F.col("uuid").alias("entity_uuid"),
                F.col("canonical_uuid").alias("canon"),
            ),
            "entity_uuid",
            "left",
        )
        .select(
            "episode_uuid",
            "group_id",
            F.coalesce("canon", "entity_uuid").alias("entity_uuid"),
        )
    )
    mention_edges = rebuild_mention_edges(remapped_pairs, cfg.run_ts)

    episodes_all = prior["episodes"].unionByName(
        episodes_new, allowMissingColumns=True
    ).dropDuplicates(["uuid"])

    return {
        "episodes": episodes_all,
        "mentions": mentions_new,
        "triples": triples_new,
        "entities": entities_all,
        "pairs": pairs_all,
        "uuid_map": uuid_map,
        "edges_merged": edges_merged,
        "edges": edges,
        "nodes": nodes,
        "mention_edges": mention_edges,
    }
