"""JVM-side literal DataFrames.

``spark.createDataFrame(py_list)`` builds a Python-RDD-backed plan: every
task forks a Python worker even for a 3-row constant — ~10 s of pure
wait × partitions under load (measured via event-log task metrics:
309 s task time, 0.4 s CPU). For small constant relations (query terms,
LSH bucket ids, BFS origins, empty frames) build them as an exploded
array-of-structs literal instead: pure Catalyst, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def literal_df(
    spark: SparkSession,
    rows: list[tuple],
    cols: list[tuple[str, str]],
) -> DataFrame:
    """rows of python scalars + [(name, sql_type), ...] → DataFrame."""
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(t).alias(n) for n, t in cols]
        )
    structs = [
        F.struct(
            *[F.lit(v).cast(t).alias(n) for v, (n, t) in zip(row, cols)]
        )
        for row in rows
    ]
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("s"))
        .select(*[F.col(f"s.{n}").alias(n) for n, _ in cols])
    )
