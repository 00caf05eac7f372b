"""Graph materialization sinks (SURVEY.md S6–S8).

Reference persistence is MERGE-upsert Cypher per node/edge or UNWIND
bulk upsert (graphiti_core/utils/bulk_utils.py:128-251, Cypher in
models/nodes/node_db_queries.py:94-101). The Spark-native equivalent is
a partitioned table write:

  - tables partitioned by ``group_id`` (the reference's graph partition
    key — FalkorDB gives each group its own database; here it's
    partition pruning, graphiti.py:698-701);
  - upsert = idempotent overwrite by deterministic uuid: with
    content-derived ids, re-running a batch produces identical rows, so
    ``MERGE ON uuid`` degenerates to dynamic-partition overwrite. On an
    Iceberg catalog this becomes ``MERGE INTO t USING u ON t.uuid =
    u.uuid WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *``
    (upsert_sql below emits exactly that statement);
  - the S8 "index DDL" equivalent: sort-within-partitions by uuid on
    write, giving parquet min/max uuid skipping for S5 point lookups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

GRAPH_TABLES = (
    "nodes",
    "edges",
    "mention_edges",
    "episodes",
    "communities",
    # resolution state consumed by incremental ingest (operators/
    # incremental.py): the alias-level name index and accepted duplicate
    # pairs (the reference persists the latter as IS_DUPLICATE_OF edges)
    "entities",
    "pairs",
)


def save_graph(outputs: dict[str, DataFrame], path: str) -> dict[str, str]:
    """Write every present graph table to ``path/<table>`` parquet,
    partitioned by group_id (when present), sorted by uuid within
    partitions."""
    written: dict[str, str] = {}
    for name in GRAPH_TABLES:
        df = outputs.get(name)
        if df is None:
            continue
        target = os.path.join(path, name)
        if "group_id" in df.columns:
            sort_col = "uuid" if "uuid" in df.columns else df.columns[0]
            (
                # cluster rows by the partition column BEFORE the
                # partitioned write: otherwise every write task opens a
                # file per group it happens to hold (tasks × groups small
                # files — the classic partitionBy fan-out). AQE rebalances
                # skewed groups.
                df.repartition("group_id")
                .sortWithinPartitions(sort_col)
                .write.mode("overwrite")
                .partitionBy("group_id")
                .parquet(target)
            )
        else:  # e.g. pairs(src, dst)
            df.write.mode("overwrite").parquet(target)
        written[name] = target
    return written


def load_graph(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in GRAPH_TABLES:
        target = os.path.join(path, name)
        if os.path.isdir(target):
            out[name] = spark.read.parquet(target)
    return out


def create_table_sql(table: str, schema_ddl: str) -> str:
    """S8 DDL twin: the Iceberg CREATE TABLE this engine's graph tables
    map to on a real catalog (no catalog ships in this sandbox, so the
    statement is emitted, tested for shape, and documented rather than
    executed). The clauses carry the same physical design save_graph
    enforces on parquet:

      - PARTITIONED BY (group_id): the reference's graph partition key
        (database-per-group on FalkorDB, graphiti.py:698-701) becomes
        partition pruning;
      - WRITE ORDERED BY uuid: parquet min/max skipping on uuid — the
        S5 point-lookup/keyset-pagination "index";
      - the uuid identity is the upsert key (see upsert_sql).
    """
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({schema_ddl}) USING iceberg "
        "PARTITIONED BY (group_id) "
        "TBLPROPERTIES ('write.distribution-mode'='hash', "
        "'sort-order'='uuid ASC NULLS FIRST')"
    )


def graph_ddl(catalog_prefix: str = "graph") -> dict[str, str]:
    """CREATE TABLE statements for every graph table (column DDL from
    schemas.py StructTypes)."""
    from graphiti_spark import schemas

    ddl: dict[str, str] = {}
    for name, struct in (
        ("nodes", schemas.NODES_SCHEMA),
        ("edges", schemas.EDGES_SCHEMA),
        ("mention_edges", schemas.MENTIONS_SCHEMA),
        ("episodes", schemas.EPISODES_SCHEMA),
        ("communities", schemas.COMMUNITIES_SCHEMA),
    ):
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in struct)
        ddl[name] = create_table_sql(f"{catalog_prefix}.{name}", cols)
    return ddl


def upsert_sql(table: str, updates_view: str) -> str:
    """The Iceberg MERGE statement this write maps to on a real catalog
    (S6 single/bulk upsert semantics)."""
    return (
        f"MERGE INTO {table} t USING {updates_view} u ON t.uuid = u.uuid "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
