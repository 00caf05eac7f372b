"""Deterministic entity typing (E3/D19 support).

The reference classifies each extracted mention into user-supplied
entity types with an LLM (node_operations.py:133-208) and attaches the
chosen label after "Entity" (nodes.py:435-443). This engine's
deterministic twin: the mention's HEAD NOUN (last whitespace token of
the normalized name — the grammar emits "noun" or "adj noun") maps to a
frozen type via config.NOUN_ENTITY_TYPES; unmapped names fall back to
the bare "Entity" type.

Pure column expressions (one CASE chain — stays in whole-stage codegen)
plus the matching DuckDB SQL fragment for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from graphiti_spark.config import DEFAULT_ENTITY_TYPE, NOUN_ENTITY_TYPES


def head_noun_col(name: Column) -> Column:
    """Last whitespace token of a normalized name."""
    return F.element_at(F.split(name, " "), -1)


def entity_type_col(name: Column) -> Column:
    """Name → frozen entity type (CASE over the head noun)."""
    noun = head_noun_col(name)
    expr = F.lit(DEFAULT_ENTITY_TYPE)
    # build the CASE bottom-up in sorted order for plan determinism
    for n, t in sorted(NOUN_ENTITY_TYPES.items(), reverse=True):
        expr = F.when(noun == n, F.lit(t)).otherwise(expr)
    return expr


def labels_col(name: Column) -> Column:
    """labels array: ["Entity", <type>] (reference nodes.py:435-443 —
    "Entity" first, specific label appended); a bare Entity type yields
    the single-element array."""
    t = entity_type_col(name)
    return F.when(
        t == DEFAULT_ENTITY_TYPE, F.array(F.lit(DEFAULT_ENTITY_TYPE))
    ).otherwise(F.array(F.lit(DEFAULT_ENTITY_TYPE), t))


def sql_entity_type(name_expr: str) -> str:
    """The same head-noun CASE as DuckDB SQL (oracle side)."""
    arms = "\n    ".join(
        f"WHEN '{noun}' THEN '{etype}'"
        for noun, etype in sorted(NOUN_ENTITY_TYPES.items())
    )
    head = f"list_extract(string_split({name_expr}, ' '), -1)"
    return (
        f"CASE {head}\n    {arms}\n    ELSE '{DEFAULT_ENTITY_TYPE}' END"
    )
