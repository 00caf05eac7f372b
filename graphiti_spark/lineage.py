"""Per-partition lineage + metrics rows and checkpoint resume
(north_rule: "resumable from checkpoint with per-partition lineage +
metrics"; SURVEY.md §4 "Checkpoint/resume").

Every pipeline stage can be wrapped in `materialize_stage`, which

  1. if a completed lineage marker for (run_id, stage) exists, SKIPS the
     compute and reads the stage's parquet back (resume path);
  2. otherwise computes the stage, writes it to parquet under the
     checkpoint dir, records one metrics row PER PARTITION
     (run_id, stage, partition_id, rows, bytes≈, wall_ms, written_at)
     plus a `_COMPLETE` marker written last — the marker is the atomic
     commit point, so a job killed mid-stage re-runs that stage cleanly.

The reference has no equivalent (single-process; failure = redo episode).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_dir(checkpoint_dir: str, run_id: str, stage: str) -> str:
    return os.path.join(checkpoint_dir, run_id, stage)


def stage_is_complete(checkpoint_dir: str, run_id: str, stage: str) -> bool:
    return os.path.exists(os.path.join(_stage_dir(checkpoint_dir, run_id, stage), "_COMPLETE"))


def partition_metrics(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition row counts as a small metrics DataFrame."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            "partition_id",
            "rows",
        )
    )


def materialize_stage(
    spark: SparkSession,
    df_thunk,
    checkpoint_dir: str | None,
    run_id: str,
    stage: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Compute-or-resume one stage. df_thunk is a zero-arg callable
    returning the stage DataFrame (lazy, so skipped stages cost nothing)."""
    if checkpoint_dir is None:
        return df_thunk()

    sdir = _stage_dir(checkpoint_dir, run_id, stage)
    data_path = os.path.join(sdir, "data")
    if stage_is_complete(checkpoint_dir, run_id, stage):
        return spark.read.parquet(data_path)

    t0 = time.monotonic()
    df = df_thunk()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_path)
    wall_ms = int((time.monotonic() - t0) * 1000)

    persisted = spark.read.parquet(data_path)
    metrics = [
        {**row.asDict(), "wall_ms": wall_ms, "written_at": time.time()}
        for row in partition_metrics(persisted, run_id, stage).collect()
    ]
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "metrics.jsonl"), "w") as fh:
        for m in metrics:
            fh.write(json.dumps(m) + "\n")
    # marker last → atomic commit point for resume
    with open(os.path.join(sdir, "_COMPLETE"), "w") as fh:
        fh.write(json.dumps({"stage": stage, "run_id": run_id, "wall_ms": wall_ms}))
    return persisted


def read_all_metrics(checkpoint_dir: str, run_id: str) -> list[dict]:
    out: list[dict] = []
    base = os.path.join(checkpoint_dir, run_id)
    if not os.path.isdir(base):
        return out
    for stage in sorted(os.listdir(base)):
        mpath = os.path.join(base, stage, "metrics.jsonl")
        if os.path.exists(mpath):
            with open(mpath) as fh:
                out.extend(json.loads(line) for line in fh if line.strip())
    return out
