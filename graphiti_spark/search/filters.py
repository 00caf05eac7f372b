"""Declarative search filters (SURVEY.md Q9).

Reference builds Cypher WHERE fragments from a SearchFilters model:
label OR-lists, edge-type lists, and AND-of-OR datetime comparison trees
incl. IS NULL operators (/root/reference/graphiti_core/search/
search_filters.py:26-251). Here the same tree compiles to a single
pyspark Column predicate — Catalyst pushes it into the parquet/Iceberg
scan (PushedFilters), which is the whole point of keeping it
declarative.

A comparison leaf is (field, op, value) with op ∈
{'=', '<>', '>', '>=', '<', '<=', 'is_null', 'is_not_null'}; the tree is
OR-of-leaves within each inner list, AND across outer lists — exactly
the reference's ComparisonOperator / DateFilter nesting.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from operator import and_, or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    "is_null": lambda c, v: c.isNull(),
    "is_not_null": lambda c, v: c.isNotNull(),
}


@dataclass
class SearchFilters:
    """Mirror of the reference's SearchFilters surface."""

    node_labels: list[str] | None = None          # OR within list
    edge_types: list[str] | None = None           # OR within list
    edge_uuids: list[str] | None = None
    group_ids: list[str] | None = None
    # AND-of-OR trees: [[(field, op, value), ...], ...]
    date_filters: list[list[tuple[str, str, object]]] = field(default_factory=list)


def _leaf(fieldname: str, op: str, value) -> Column:
    if op not in _OPS:
        raise ValueError(f"unsupported operator {op!r}")
    return _OPS[op](F.col(fieldname), F.lit(value) if value is not None else None)


def compile_filters(f: SearchFilters, kind: str = "edge") -> Column | None:
    """SearchFilters → one Column predicate (None = no filtering)."""
    clauses: list[Column] = []
    if f.group_ids:
        clauses.append(F.col("group_id").isin(f.group_ids))
    if kind == "edge":
        if f.edge_types:
            clauses.append(F.col("name").isin(f.edge_types))
        if f.edge_uuids:
            clauses.append(F.col("uuid").isin(f.edge_uuids))
    elif kind == "node" and f.node_labels:
        # node labels: any requested label present (reference `n:A|B`)
        clauses.append(
            reduce(
                or_,
                [F.array_contains(F.col("labels"), lbl) for lbl in f.node_labels],
            )
        )
    for or_group in f.date_filters:
        clauses.append(reduce(or_, [_leaf(*leaf) for leaf in or_group]))
    if not clauses:
        return None
    return reduce(and_, clauses)


def apply_filters(df: DataFrame, f: SearchFilters, kind: str = "edge") -> DataFrame:
    pred = compile_filters(f, kind)
    return df if pred is None else df.filter(pred)
