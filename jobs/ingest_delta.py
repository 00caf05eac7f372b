"""Cluster entry point for DELTA ingest: merge a new page batch into an
existing graph and commit only the changed rows.

  spark-submit --py-files /tmp/graphiti_spark.zip \
    jobs/ingest_delta.py --input /data/batch_pages --graph /data/graph \
    --delta-out /data/graph_deltas/00001 --run-id batch-2026-01-02

``--graph`` is a save_graph snapshot dir, optionally followed by prior
delta dirs via repeated ``--delta`` flags (merge-on-read, oldest first —
the load_graph_versions shape streaming/ingest.py commits). The job
writes ONE new delta dir (per-table upserts/deletes, the parquet
equivalent of an Iceberg MERGE per table — materialize.upsert_sql emits
the real MERGE for a catalog-backed deployment) and never rewrites the
graph: per-batch cost is O(|batch| + |touched subgraph|)
(operators/incremental.py; reference contrast: per-episode subgraph
updates, graphiti_core/utils/maintenance/edge_operations.py:241-403).

Package the library with:  python scripts/make_zip.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet (the new batch)")
    ap.add_argument("--graph", required=True, help="save_graph snapshot dir of the prior graph")
    ap.add_argument("--delta", action="append", default=[],
                    help="prior delta dir (repeatable, oldest first)")
    ap.add_argument("--delta-out", required=True, help="output dir for this batch's delta")
    ap.add_argument("--run-id", default="delta-0")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName(f"graphiti-delta-{args.run_id}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The delta DAG composed over a merge-on-read prior (snapshot +
        # delta chain) is the deepest plan in this engine; rendering it
        # for UI/debug listeners can alone OOM the driver (see
        # graphiti_spark/session.py). Cap rendering; execution unaffected.
        .config("spark.sql.maxPlanStringLength", "100000")
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from graphiti_spark.config import RunConfig
    from graphiti_spark.materialize import load_graph_versions, save_graph_delta
    from graphiti_spark.operators.incremental import ingest_incremental
    from graphiti_spark.sources.pages import load_pages

    prior = load_graph_versions(spark, [args.graph, *args.delta])
    batch = load_pages(spark, args.input)

    t0 = time.monotonic()
    merged = ingest_incremental(spark, batch, prior, RunConfig(run_id=args.run_id))
    written = save_graph_delta(merged["delta"], args.delta_out)
    wall = round(time.monotonic() - t0, 2)

    stats = {
        "run_id": args.run_id,
        "wall_sec": wall,
        "tables": written,
        "touched_prior_edges": merged["delta"]["edges_touched_prior"].count(),
        "delta_rows": {
            t: merged["delta"][t]["upserts"].count()
            for t in ("edges", "nodes", "mention_edges")
        },
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
