"""Versioned corpus-dedup state (operators/dedup_state.py): folding
per-batch updates must equal a one-shot rebuild; the streaming surface
commits batch-sized deltas and honors the replay guard."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.dedup_state import (
    DEDUP_TABLES,
    init_dedup_state,
    load_dedup_state,
    make_dedup_batch_fn,
    run_streaming_dedup,
    update_dedup_state,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy dog again and AGAIN "),
        (4, "a completely different document about spark shuffles"),
        (5, "the quick brown fox jumps over the lazy cat again and again"),
        (6, "le chat est dans la maison et le chien est dans le jardin"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _canon_map(df):
    return {r.id: r.canonical_id for r in df.collect()}


def test_fold_equals_rebuild(spark, corpus):
    """Law: init(b1) ∘ update(b2) ∘ update(b3) == init(b1 ∪ b2 ∪ b3),
    on every state table — including when a later batch (doc 5, near-dup
    of 1) joins a component formed by earlier batches."""
    b1 = corpus.filter(F.col("doc_id").isin(1, 4))
    b2 = corpus.filter(F.col("doc_id").isin(2, 6))
    b3 = corpus.filter(F.col("doc_id").isin(3, 5))

    state = init_dedup_state(b1, threshold=0.8)
    state = update_dedup_state(b2, state, threshold=0.8)
    state = update_dedup_state(b3, state, threshold=0.8)
    rebuilt = init_dedup_state(corpus, threshold=0.8)

    assert _canon_map(state["canon"]) == _canon_map(rebuilt["canon"])
    got_idx = {tuple(r) for r in state["index"].collect()}
    want_idx = {tuple(r) for r in rebuilt["index"].collect()}
    assert got_idx == want_idx
    got_pairs = {tuple(r) for r in state["pairs"].collect()}
    want_pairs = {tuple(r) for r in rebuilt["pairs"].collect()}
    assert got_pairs == want_pairs
    assert state["docs"].count() == 6

    # the delta carries only the last batch's rows (canon: recomputed
    # component members only — doc 6's singleton is untouched)
    delta = state["delta"]
    assert {r.id for r in delta["docs"]["upserts"].collect()} == {3, 5}
    canon_up = _canon_map(delta["canon"]["upserts"])
    assert set(canon_up) == {1, 2, 3, 5} and 6 not in canon_up


def test_remove_docs_splits_component(spark):
    """Takedown law: remove ≡ rebuild over the remaining corpus —
    including the hard case where the doomed doc is the CUT VERTEX of a
    near-dup chain (A~B~C, A≁C): the cluster must split, which only the
    retained pairs evidence can decide."""
    from graphiti_spark.operators.dedup_state import remove_docs

    t = [f"t{i}" for i in range(1, 21)]
    a = " ".join(t)
    b = " ".join(["u1", "u2"] + t[2:])  # J(a,b) = 18/22 ≈ 0.818
    c = " ".join(["u1", "u2", "v1", "v2"] + t[4:])  # J(b,c) ≈ 0.818, J(a,c) ≈ 0.667
    d = "unrelated words entirely about a different topic altogether"
    corpus = spark.createDataFrame(
        [(1, a), (2, b), (3, c), (4, d)], "doc_id long, text string"
    )
    state = init_dedup_state(corpus, threshold=0.8)
    assert _canon_map(state["canon"]) == {1: 1, 2: 1, 3: 1, 4: 4}

    doomed = spark.createDataFrame([(2,)], "id long")
    out = remove_docs(doomed, state)
    rebuilt = init_dedup_state(
        corpus.filter(F.col("doc_id") != 2), threshold=0.8
    )
    assert _canon_map(out["canon"]) == _canon_map(rebuilt["canon"]) == {
        1: 1, 3: 3, 4: 4,
    }
    for table in ("docs", "index", "pairs"):
        got = {tuple(r) for r in out[table].collect()}
        want = {tuple(r) for r in rebuilt[table].collect()}
        assert got == want, table
    delta = out["delta"]
    assert {r.id for r in delta["canon"]["deletes"].collect()} == {2}
    assert _canon_map(delta["canon"]["upserts"]) == {1: 1, 3: 3}
    assert {tuple(r) for r in delta["pairs"]["deletes"].collect()} == {
        (1, 2), (2, 3),
    }


def test_streaming_dedup_equals_rebuild(spark, tmp_path):
    feed = str(tmp_path / "feed")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(
        os.path.join(feed, "part=a")
    )
    run_streaming_dedup(spark, feed + "/part=a", state_dir, ckpt + "1")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(
        os.path.join(feed, "part=b")
    )
    run_streaming_dedup(spark, feed + "/part=b", state_dir, ckpt + "2")

    # second commit is a DELTA version: chain of 2, upsert dirs for
    # every state table, index partitioned by band on snapshots
    with open(os.path.join(state_dir, "_LATEST")) as fh:
        ptr = json.load(fh)
    assert len(ptr["chain"]) == 2
    delta_dir = os.path.join(state_dir, ptr["chain"][-1])
    for table in DEDUP_TABLES:
        assert os.path.isdir(os.path.join(delta_dir, table, "upserts"))
    snap_idx = os.path.join(state_dir, ptr["chain"][0], "index")
    assert any(d.startswith("band_idx=") for d in os.listdir(snap_idx))

    got = load_dedup_state(spark, state_dir)
    rebuilt = init_dedup_state(docs)
    assert _canon_map(got["canon"]) == _canon_map(rebuilt["canon"])

    # committed takedown: a delta version with deletes; state equals a
    # rebuild over the remaining corpus
    from graphiti_spark.operators.dedup_state import commit_remove_docs

    doomed = docs.filter(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("id")
    )
    commit_remove_docs(spark, state_dir, doomed)
    with open(os.path.join(state_dir, "_LATEST")) as fh:
        assert len(json.load(fh)["chain"]) == 3
    got2 = load_dedup_state(spark, state_dir)
    rebuilt2 = init_dedup_state(docs.filter(F.col("doc_id") % 10 != 7))
    assert _canon_map(got2["canon"]) == _canon_map(rebuilt2["canon"])
    assert got2["docs"].count() == rebuilt2["docs"].count()


def test_replay_guard_scoped_to_stream(spark, corpus, tmp_path):
    """A crash-replayed batch id from the SAME stream is a no-op; the
    same batch id from a DIFFERENT stream is fresh work."""
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    fn_a = make_dedup_batch_fn(state_dir, stream_id="a", threshold=0.8)
    b1 = corpus.filter(F.col("doc_id").isin(1, 4))
    b2 = corpus.filter(F.col("doc_id").isin(2, 3, 5, 6))

    fn_a(b1, 0)
    seq0 = json.load(open(os.path.join(state_dir, "_LATEST")))["seq"]
    fn_a(b1, 0)  # replay: skipped
    assert json.load(open(os.path.join(state_dir, "_LATEST")))["seq"] == seq0

    fn_b = make_dedup_batch_fn(state_dir, stream_id="b", threshold=0.8)
    fn_b(b2, 0)  # new feed, batch 0 is NOT a replay
    got = load_dedup_state(spark, state_dir)
    rebuilt = init_dedup_state(corpus, threshold=0.8)
    assert _canon_map(got["canon"]) == _canon_map(rebuilt["canon"])


def test_long_id_key_roundtrip_and_order(spark):
    """The CC key encoding must be an order-preserving bijection over
    the FULL long range — the old lpad-12 silently truncated hash-range
    ids (lpad truncates past the target width) and scrambled negatives.
    Covers both boundary values and xxhash64-realistic magnitudes."""
    from graphiti_spark.operators.dedup_docs import long_id_key, long_id_unkey

    vals = [
        -(2**63), -(2**63) + 1, -769024105940936929, -999999999999,
        -2, -1, 0, 1, 999999999999, 685223234348998744,
        8485142954635520965, 2**63 - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "id long")
    rows = df.select(
        "id", long_id_key(F.col("id")).alias("k")
    ).withColumn("back", long_id_unkey(F.col("k"))).collect()

    assert all(r.back == r.id for r in rows)           # bijection
    assert all(len(r.k) == 20 for r in rows)           # fixed width
    by_key = [r.id for r in sorted(rows, key=lambda r: r.k)]
    assert by_key == sorted(vals)                      # order-preserving
