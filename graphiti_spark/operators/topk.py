"""Generic salted two-phase per-group top-k — the hub-skew pattern as a
first-class operator.

A per-group window (`row_number() OVER (PARTITION BY g ORDER BY ...)`)
serializes each group on ONE reducer; a hub group (a celebrity entity,
a boilerplate host, a hot key) turns that reducer into the stage's
critical path. The two-phase form spreads each group over ``n_salt``
reducers first (phase 1: per-(group, salt) top-k — the hub's rows
split by a row-content hash), then takes the global per-group top-k
over the ≤ k·n_salt survivors. The result is IDENTICAL to the unsalted
window — every global top-k row is in its own salt's top-k — which is
exactly what the DuckDB oracle proves (it runs the PLAIN window, no
salt: a different formulation, same rows).

This generalizes the inline salted summary window in
pipeline.build_nodes (SURVEY.md §4 skew rule; tests/test_salting.py)
into a reusable operator.

Requirement: ``order_by`` must be a TOTAL order within each group
(break ties down to a unique column) — with ties the choice of
survivors is otherwise partition-dependent in BOTH the salted and
unsalted forms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.config import N_SALT


def salted_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    n_salt: int | None = None,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Top-k rows per group under ``order_by``, hub-safe. Output: the
    input columns plus ``rank`` (1-based within the group).

    ``salt_expr`` defaults to xxhash64 over every input column — any
    per-row expression works; it only shapes the phase-1 spread, never
    the result (the oracle's unsalted window proves it)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_salt is not None and n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    for reserved in ("rank", "_salt", "_rn1"):
        if reserved in df.columns:
            raise ValueError(
                f"input already has a {reserved!r} column — rename it; "
                "salted_topk emits its own"
            )
    n_salt = n_salt or N_SALT
    salt = (
        salt_expr
        if salt_expr is not None
        else F.xxhash64(*[F.col(c) for c in df.columns])
    )
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_by)
    w2 = Window.partitionBy(*group_cols).orderBy(*order_by)
    phase1 = (
        df.withColumn("_salt", F.pmod(salt, F.lit(n_salt)))
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1")
    )
    return (
        phase1.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .drop("_salt")
    )
