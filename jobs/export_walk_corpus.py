"""Cluster entry point: spark-submit --py-files graphiti_spark.zip
jobs/export_walk_corpus.py --edges <parquet> --output <dir>.

Exports graph-embedding training data from a graph edge table — the
graph-side analogue of curate_corpus.py's text funnel:

  edge table -> deterministic walk corpus (DeepWalk, or node2vec
  second-order when the p/q weights differ) -> shuffle-free skip-gram
  pairs -> exact unigram negative samples.

Outputs under --output:
  pairs/   (start, widx, pos, center, context, negatives ARRAY) — one
           training example per skip-gram pair, negatives ordered by
           draw index
  vocab/   (node_id, node) — only when the input ids are strings (the
           KG's sha-uuid space): ids are remapped to bigint via
           xxhash64, which is content-derived (stable across runs and
           partitionings, no global ordering pass); the job FAILS on a
           hash collision (distinct-count check) rather than silently
           merging two nodes
  stats.json  corpus counts + wall

Every draw is content-derived (sha-uniform over (graph, seed)), so
rerunning on the same edges produces byte-identical training data —
the same reproducibility contract as the curation job.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", required=True, help="edge parquet path")
    ap.add_argument("--output", required=True, help="output dir (pairs/, vocab/, stats.json)")
    ap.add_argument("--src-col", default="src")
    ap.add_argument("--dst-col", default="dst")
    ap.add_argument("--undirected", action="store_true", help="mirror every edge before walking")
    ap.add_argument("--walk-len", type=int, default=10)
    ap.add_argument("--walks-per-node", type=int, default=5)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--negatives", type=int, default=5, help="negative draws per pair (0 disables)")
    ap.add_argument("--ret-w", type=int, default=1, help="node2vec return weight (integer 1/p)")
    ap.add_argument("--near-w", type=int, default=1, help="node2vec distance-1 weight")
    ap.add_argument("--far-w", type=int, default=1, help="node2vec outward weight (integer 1/q)")
    ap.add_argument("--max-neighbors", type=int, default=None, help="hub cap for biased walks")
    ap.add_argument("--seed", default="walk")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.appName("graphiti-export-walks")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "100000")
    )
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    from graphiti_spark.operators.walks import (
        biased_walks,
        negative_samples,
        node_frequencies,
        random_walks,
        skipgram_pairs,
    )

    t0 = time.monotonic()
    edges = spark.read.parquet(args.edges).select(
        F.col(args.src_col).alias("src"), F.col(args.dst_col).alias("dst")
    )

    # ---- id remap (string uuids -> content-derived bigint) ----
    stats: dict = {}
    wrote_vocab = False
    if dict(edges.dtypes)["src"] not in ("bigint", "int", "smallint", "tinyint"):
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        vocab = nodes.select(F.xxhash64("node").alias("node_id"), "node")
        vocab.write.mode("overwrite").parquet(f"{args.output}/vocab")
        vocab = spark.read.parquet(f"{args.output}/vocab")
        counts = vocab.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("node_id").alias("n_ids"),
        ).first()
        if counts["n"] != counts["n_ids"]:
            raise RuntimeError(
                f"xxhash64 node-id collision: {counts['n']} nodes -> "
                f"{counts['n_ids']} ids; export aborted"
            )
        stats["vocab_size"] = counts["n"]
        wrote_vocab = True
        sm = vocab.select(F.col("node").alias("src"), F.col("node_id").alias("src_id"))
        dm = vocab.select(F.col("node").alias("dst"), F.col("node_id").alias("dst_id"))
        edges = (
            edges.join(sm, "src")
            .join(dm, "dst")
            .select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
        )

    if args.undirected:
        edges = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )

    # ---- walks -> pairs -> negatives ----
    second_order = not (args.ret_w == args.near_w == args.far_w == 1)
    if second_order:
        walks = biased_walks(
            edges,
            walk_len=args.walk_len,
            walks_per_node=args.walks_per_node,
            ret_w=args.ret_w,
            near_w=args.near_w,
            far_w=args.far_w,
            seed=args.seed,
            max_neighbors=args.max_neighbors,
        )
    else:
        walks = random_walks(
            edges,
            walk_len=args.walk_len,
            walks_per_node=args.walks_per_node,
            seed=args.seed,
        )
    # localCheckpoint cuts the per-step join chain out of every
    # downstream reference (pairs AND the frequency/negative joins each
    # re-reference the walk frame — the documented plan-nesting trap)
    walks = walks.localCheckpoint(eager=True)
    pairs = skipgram_pairs(walks, window=args.window)

    if args.negatives > 0:
        pairs = pairs.localCheckpoint(eager=True)
        # draw on DISTINCT pair keys: a window can contain the same
        # context value twice (path a-b-a), and those duplicate pair
        # rows hash to the SAME draws — grouping the exploded draws
        # directly would merge them into one row with 2k negatives.
        # Frequencies still count duplicates (they weight the noise
        # distribution); the join-back gives every original pair row
        # its own exactly-k ordered negatives.
        keys = ["start", "widx", "pos", "center", "context"]
        drawn = negative_samples(
            pairs.distinct(),
            node_frequencies(pairs),
            k=args.negatives,
            seed=f"{args.seed}:neg",
        )
        negs = drawn.groupBy(*keys).agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("neg_idx", "negative"))
                ),
                lambda s: s["negative"],
            ).alias("negatives")
        )
        out = pairs.join(negs, keys)
    else:
        out = pairs.withColumn(
            "negatives", F.array().cast("array<bigint>")
        )
    out.write.mode("overwrite").parquet(f"{args.output}/pairs")
    written = spark.read.parquet(f"{args.output}/pairs")

    stats.update(
        {
            "walks": walks.count(),
            "pairs": written.count(),
            "negatives_per_pair": args.negatives,
            "second_order": second_order,
            "wrote_vocab": wrote_vocab,
            "wall_sec": round(time.monotonic() - t0, 2),
        }
    )
    payload = json.dumps(stats)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(f"{args.output}/stats.json")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray((payload + "\n").encode("utf-8")))
    finally:
        stream.close()
    print(payload)
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
