"""Delta-ingest locality bench: the SAME 50-page batch merged into a
small vs a 10x prior graph. Evidence for the r3 architectural claim
(VERDICT #1): per-batch cost is O(|batch| + |touched subgraph|), not
O(|whole graph|) — the touched-prior-edge count is set by the batch, so
it stays flat as the prior grows, and the commit writes only the delta
tables (materialize.save_graph_delta), never the full graph.

Wall clock is reported for honesty but is the weaker signal in this
sandbox (documented ~2x steal variance; the anti/semi joins that
classify untouched rows still SCAN the prior parquet once — cheap,
embarrassingly parallel, and exactly what a real cluster scales out).
The structural signal is rows: touched_prior_edges and the delta-upsert
sizes must track the batch, not the prior.

Usage: python scripts/bench_delta.py [sf_dir]   (default sf0.1)
Writes one JSON line to stdout; the driver-readable copy lives at
BENCH/BENCH_delta.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _count_delta_rows(delta: dict) -> dict:
    out = {}
    for table, frames in delta.items():
        if table == "edges_touched_prior":
            continue
        if isinstance(frames, dict):
            out[table] = {k: df.count() for k, df in frames.items()}
    return out


def leg(spark, pages, prior_pages_filter, batch_filter, label: str) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from graphiti_spark.config import RunConfig
    from graphiti_spark.materialize import load_graph, save_graph, save_graph_delta
    from graphiti_spark.operators.incremental import ingest_incremental
    from graphiti_spark.pipeline import run_pipeline_from_pages

    tmp = tempfile.mkdtemp(prefix=f"delta_bench_{label}_")
    try:
        # with_communities: the prior carries communities/has_member, so
        # the timed leg includes the G4 incremental community update
        # (r4) — its delta-row counts must track the batch like every
        # other table's
        prior_out = run_pipeline_from_pages(
            spark, pages.filter(prior_pages_filter),
            RunConfig(with_communities=True),
        )
        save_graph(prior_out, f"{tmp}/prior")
        spark.catalog.clearCache()
        prior = load_graph(spark, f"{tmp}/prior")
        prior_edges = prior["edges"].count()

        t0 = time.monotonic()
        merged = ingest_incremental(
            spark, pages.filter(batch_filter), prior
        )
        save_graph_delta(merged["delta"], f"{tmp}/delta")
        wall = round(time.monotonic() - t0, 3)

        touched = merged["delta"]["edges_touched_prior"].count()
        return {
            "label": label,
            "prior_edges": prior_edges,
            "touched_prior_edges": touched,
            "delta_rows": _count_delta_rows(merged["delta"]),
            "ingest_plus_commit_sec": wall,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from graphiti_spark.session import get_spark
    from graphiti_spark.sources.pages import load_pages

    spark = get_spark(app_name="bench-delta")
    pages = load_pages(spark, sf_dir).persist()
    n = pages.count()
    batch_lo = n - 50  # same 50-page batch for both legs

    small = leg(
        spark, pages,
        (F.col("doc_id") < n // 10), (F.col("doc_id") >= batch_lo),
        "prior_0.1x",
    )
    large = leg(
        spark, pages,
        (F.col("doc_id") < batch_lo), (F.col("doc_id") >= batch_lo),
        "prior_1x",
    )

    ratio_prior = large["prior_edges"] / max(small["prior_edges"], 1)
    ratio_touched = (
        large["touched_prior_edges"] / max(small["touched_prior_edges"], 1)
        if small["touched_prior_edges"]
        else None
    )
    ratio_wall = round(
        large["ingest_plus_commit_sec"] / small["ingest_plus_commit_sec"], 3
    )
    print(json.dumps({
        "metric": "delta_ingest_locality",
        "sf_dir": sf_dir,
        "batch_pages": 50,
        "runs": [small, large],
        "prior_growth": round(ratio_prior, 2),
        "touched_growth": ratio_touched,
        "wall_growth": ratio_wall,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
