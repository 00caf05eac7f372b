"""Standing-span-state locality bench: the SAME document batch updated
into a small vs an ~8x prior corpus. Evidence for the r4 architectural
claim (operators/span_state.py): per-batch cost is O(|batch| +
|touched docs|), not O(|corpus|) — the incremental pair search probes
the PREBUILT gram postings by the batch's gram keys (never prior x
prior), and the commit writes batch-sized per-table deltas.

Wall clock is reported for honesty but is the weaker signal in this
sandbox (documented ~2x steal variance; the count aggregates that
classify flipped grams still SCAN the prior postings once — cheap,
embarrassingly parallel, exactly what a real cluster scales out). The
structural signal is rows: docs/grams delta upserts must be exactly
batch-sized, and spans upserts must track new + touched docs.

Usage: python scripts/bench_span_state.py [sf_dir]   (default sf0.1)
Writes one JSON line to stdout; the driver-readable copy lives at
BENCH/BENCH_span_state.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BATCH_DOCS = 100


def leg(spark, docs, n, prior_frac: int, label: str) -> dict:
    from pyspark.sql import functions as F

    from graphiti_spark.materialize import (
        load_graph,
        save_graph,
        save_graph_delta,
    )
    from graphiti_spark.operators.span_state import (
        SPAN_DELTA_KEYS,
        SPAN_PARTITION_COLS,
        SPAN_TABLES,
        init_span_state,
        update_span_state,
    )

    batch_lo = n - BATCH_DOCS  # same batch for both legs
    tmp = tempfile.mkdtemp(prefix=f"span_state_bench_{label}_")
    try:
        prior_docs = docs.filter(F.col("doc_id") < batch_lo // prior_frac)
        prior_out = init_span_state(prior_docs)
        save_graph(
            prior_out, f"{tmp}/prior", SPAN_TABLES, SPAN_PARTITION_COLS
        )
        spark.catalog.clearCache()
        prior = load_graph(spark, f"{tmp}/prior", SPAN_TABLES)
        prior_n = prior["docs"].count()
        prior_grams = prior["grams"].count()

        batch = docs.filter(F.col("doc_id") >= batch_lo)
        t0 = time.monotonic()
        out = update_span_state(batch, prior)
        save_graph_delta(out["delta"], f"{tmp}/delta", SPAN_DELTA_KEYS)
        wall = round(time.monotonic() - t0, 3)

        delta_rows = {
            t: {kname: df.count() for kname, df in frames.items()}
            for t, frames in out["delta"].items()
        }
        return {
            "label": label,
            "prior_docs": prior_n,
            "prior_grams": prior_grams,
            "delta_rows": delta_rows,
            "update_plus_commit_sec": wall,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from graphiti_spark.session import get_spark

    spark = get_spark(app_name="bench-span-state")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )
    n = docs.count()

    small = leg(spark, docs, n, 8, "prior_0.125x")
    large = leg(spark, docs, n, 1, "prior_1x")

    ratio_prior = large["prior_docs"] / max(small["prior_docs"], 1)
    ratio_wall = round(
        large["update_plus_commit_sec"] / small["update_plus_commit_sec"], 3
    )
    spans_growth = (
        large["delta_rows"]["spans"]["upserts"]
        / max(small["delta_rows"]["spans"]["upserts"], 1)
    )
    print(json.dumps({
        "metric": "span_state_locality",
        "sf_dir": sf_dir,
        "batch_docs": BATCH_DOCS,
        "runs": [small, large],
        "prior_growth": round(ratio_prior, 2),
        "spans_upsert_growth": round(spans_growth, 2),
        "wall_growth": ratio_wall,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
