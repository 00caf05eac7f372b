"""Cluster entry point: spark-submit --py-files graphiti_spark.zip
jobs/build_graph.py --input <pages dir> --output <graph dir>.

north_rule: "run via spark-submit --py-files on a multi-executor
cluster at two cluster sizes". This script carries no local-mode
assumptions: the session master/executors come from spark-submit; the
only knobs here are data paths, checkpoint dir, and run id.

Package the library with:  python scripts/make_zip.py
Submit with:
  spark-submit --py-files /tmp/graphiti_spark.zip \
    jobs/build_graph.py --input /data/sf0.1 --output /data/graph \
    --checkpoint /data/ckpt --run-id run-2026-01-01
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir containing documents.parquet")
    ap.add_argument("--output", required=True, help="graph table output dir")
    ap.add_argument("--checkpoint", default=None, help="lineage/resume dir")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName(f"graphiti-build-{args.run_id}")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "100000")
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from graphiti_spark.config import RunConfig
    from graphiti_spark.materialize import save_graph
    from graphiti_spark.pipeline import run_pipeline

    cfg = RunConfig(checkpoint_dir=args.checkpoint, run_id=args.run_id)
    t0 = time.monotonic()
    out = run_pipeline(spark, args.input, cfg)
    written = save_graph(out, args.output)
    wall = round(time.monotonic() - t0, 2)

    stats = {
        "run_id": args.run_id,
        "wall_sec": wall,
        "tables": written,
        "rows": {k: out[k].count() for k in ("nodes", "edges", "mention_edges")},
    }
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
