"""Typed node-attribute extraction (SURVEY.md E7).

Reference: `extract_attributes_from_node(s)` fills user-supplied
entity-type attributes from the episode text with a small LLM
(/root/reference/graphiti_core/utils/maintenance/node_operations.py:
453-541; prompt prompts/extract_nodes.py:255-281). Deterministic
replacement: the "ontology" is a dict of attribute → regex with one
capture group; an attribute's value is the FIRST match (earliest
episode by valid_at, then episode uuid) across the episodes that
mention the node — mirroring the reference's convention that attributes
come from the node's own mention contexts.

Spark shape: mention-provenance join + per-attribute regexp_extract
(codegen) + one window for first-wins + map aggregation. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_attributes(
    mention_edges: DataFrame,
    episodes: DataFrame,
    spec: dict[str, str],
) -> DataFrame:
    """spec: attr_name → regex (value = capture group 1).

    Output: (entity_uuid, attributes map<string,string>) — only entities
    with ≥1 matched attribute appear."""
    ctx = mention_edges.select("entity_uuid", "episode_uuid").join(
        episodes.select(
            F.col("uuid").alias("episode_uuid"), "content", "valid_at"
        ),
        "episode_uuid",
    )
    per_attr = ctx.select(
        "entity_uuid",
        "episode_uuid",
        "valid_at",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("attr"),
                        F.regexp_extract("content", pattern, 1).alias("value"),
                    )
                    for name, pattern in sorted(spec.items())
                ]
            )
        ).alias("kv"),
    ).select(
        "entity_uuid", "episode_uuid", "valid_at",
        F.col("kv.attr").alias("attr"), F.col("kv.value").alias("value"),
    ).filter(F.col("value") != "")

    w = Window.partitionBy("entity_uuid", "attr").orderBy(
        "valid_at", "episode_uuid"
    )
    first_wins = (
        per_attr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return first_wins.groupBy("entity_uuid").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("attr", "value")))
        ).alias("attributes")
    )


def apply_attributes(nodes: DataFrame, attrs: DataFrame) -> DataFrame:
    """Merge extracted attributes into the nodes table (extracted values
    override existing keys — the reference re-extracts on each run)."""
    merged = nodes.join(
        F.broadcast(attrs.withColumnRenamed("entity_uuid", "uuid")
                    .withColumnRenamed("attributes", "__new_attrs")),
        "uuid",
        "left",
    )
    return merged.withColumn(
        "attributes",
        F.when(
            F.col("__new_attrs").isNotNull(),
            F.map_concat(
                F.map_filter(
                    F.coalesce(
                        F.col("attributes"),
                        F.map_from_arrays(
                            F.array().cast("array<string>"),
                            F.array().cast("array<string>"),
                        ),
                    ),
                    lambda k, _v: ~F.array_contains(F.map_keys(F.col("__new_attrs")), k),
                ),
                F.col("__new_attrs"),
            ),
        ).otherwise(F.col("attributes")),
    ).drop("__new_attrs")
