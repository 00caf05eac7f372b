"""EpisodeType-specific content handling (SURVEY.md S1/E1; VERDICT r01
"missing #4").

The reference defines three episode sources (nodes.py:51-84) with
distinct extraction handling (node_operations.py:133-153):

  message  content is dialogue lines "speaker: utterance"; the speaker
           (text before the colon) is ALWAYS extracted as an entity
           (prompts/extract_nodes.py:109-110 "Speaker Extraction").
  json     structured data; extraction traverses the object
           (prompts/extract_nodes.py extract_json).
  text     plain text (the default path).

Deterministic Spark twins:

  speaker_mentions   native per-line regexp over message episodes — the
                     speaker-first rule, zero Python.
  flatten_json_udf   Arrow-vectorized depth-first traversal: object keys
                     (sorted) and values join into a token stream the
                     frozen grammar then processes — the structured-
                     traversal twin. Non-JSON content passes through.
  extract_typed      dispatcher: flatten json content, run the grammar
                     extractor, union speaker mentions.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def flatten_json(text: str) -> str:
    """Depth-first 'key value' flattening with sorted object keys;
    returns the input unchanged if it is not valid JSON."""
    try:
        obj = json.loads(text)
    except (json.JSONDecodeError, TypeError):
        return text

    def walk(v) -> str:
        if isinstance(v, dict):
            return " ".join(f"{k} {walk(v[k])}" for k in sorted(v))
        if isinstance(v, list):
            return " ".join(walk(x) for x in v)
        return str(v)

    return walk(obj)


@F.pandas_udf(StringType())
def flatten_json_udf(content: pd.Series) -> pd.Series:
    return content.map(lambda t: None if t is None else flatten_json(t))


def speaker_mentions(episodes: DataFrame) -> DataFrame:
    """Per-line speaker extraction for message episodes (reference
    speaker-first rule): one mention row per distinct 'speaker:' prefix.
    Output matches the extractor's mentions schema
    (episode_uuid, group_id, valid_at, name)."""
    from graphiti_spark.operators.extract import stated_date_col

    lines = episodes.filter(F.col("source") == "message").select(
        F.col("uuid").alias("episode_uuid"),
        "group_id",
        stated_date_col(F.col("content"), F.col("valid_at")).alias("valid_at"),
        F.explode(F.split(F.col("content"), "\n")).alias("line"),
    )
    return (
        lines.select(
            "episode_uuid",
            "group_id",
            "valid_at",
            F.trim(F.regexp_extract(F.col("line"), r"^\s*([^:\n]+):\s", 1)).alias(
                "name"
            ),
        )
        .filter(F.col("name") != "")
        .distinct()
    )


def extract_typed(
    episodes: DataFrame, excluded_entity_types: tuple = ()
) -> tuple[DataFrame, DataFrame]:
    """EpisodeType-aware extraction: json content is flattened to its
    traversal token stream before the frozen grammar runs; message
    episodes additionally contribute their speakers as mentions.
    Returns (mentions, triples) in the extractor's schemas."""
    from graphiti_spark.operators.extract import extract_mentions_and_triples

    prepared = episodes.withColumn(
        "content",
        F.when(
            F.col("source") == "json", flatten_json_udf(F.col("content"))
        ).otherwise(F.col("content")),
    )
    mentions, triples = extract_mentions_and_triples(
        prepared, excluded_entity_types
    )
    mentions = mentions.unionByName(speaker_mentions(episodes)).distinct()
    return mentions, triples
