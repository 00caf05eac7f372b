"""Versioned span-dedup state (operators/span_state.py): folding
per-batch updates must equal a one-shot rebuild; takedowns must repair
flip-down spans (including erasing a doc's only span); the streaming
surface commits batch-sized deltas and honors the replay guard."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.span_state import (
    SPAN_TABLES,
    init_span_state,
    load_span_state,
    make_span_batch_fn,
    remove_doc_spans,
    run_streaming_spans,
    update_span_state,
)

SF = "/root/testdata/sf0.001"
K = 3  # compact fixtures; the state functions parametrize k


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "p q r s t a1 a2"),            # shares "p q r s t" with 2
        (2, "z1 p q r s t z2"),
        (3, "m n o w1 w2 w3 w4"),          # shares "m n o" with 4 and 5
        (4, "m n o y1 y2 y3"),
        (5, "m n o x1 x2 x3 x4 x5"),
        (6, "unique words only nothing shared at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df):
    return {tuple(r) for r in df.select(
        "id", "span_start", "span_end", "span_len").collect()}


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_fold_equals_rebuild(spark, corpus):
    """Law: init(b1) ∘ update(b2) ∘ update(b3) == init(b1 ∪ b2 ∪ b3) on
    every table — including when a later batch (doc 2) flips a prior
    doc's grams and creates its first span (doc 1 touched)."""
    b1 = corpus.filter(F.col("doc_id").isin(1, 6))
    b2 = corpus.filter(F.col("doc_id").isin(2, 4))
    b3 = corpus.filter(F.col("doc_id").isin(3, 5))

    state = init_span_state(b1, k=K)
    assert state["spans"].count() == 0  # nothing duplicated yet
    state = update_span_state(b2, state, k=K)
    mid_delta = state["delta"]
    # batch 2 flipped doc 1's run: its recomputed spans are upserted
    assert {r.id for r in mid_delta["spans"]["upserts"].collect()} == {1, 2}
    state = update_span_state(b3, state, k=K)

    rebuilt = init_span_state(corpus, k=K)
    assert _spans(state["spans"]) == _spans(rebuilt["spans"])
    assert _rows(state["grams"]) == _rows(rebuilt["grams"])
    assert state["docs"].count() == 6
    # last delta carries only batch-3 work: docs 3/5 span "m n o"
    # together with the already-present doc 4 (touched)
    d3 = state["delta"]
    assert {r.id for r in d3["docs"]["upserts"].collect()} == {3, 5}
    assert {r.id for r in d3["spans"]["upserts"].collect()} == {3, 4, 5}


def test_remove_flip_down_erases_last_holder_span(spark, corpus):
    """Takedown law: remove ≡ rebuild over the remaining corpus —
    including the hard case where the doomed doc was the only other
    holder of a run (doc 2): the survivor's span must be ERASED, which
    upserts alone cannot express (explicit delete for the touched id).
    Removing doc 5 must NOT touch docs 3/4 (count 3 → 2 stays dup)."""
    state = init_span_state(corpus, k=K)
    assert {r[0] for r in _spans(state["spans"])} == {1, 2, 3, 4, 5}

    doomed = spark.createDataFrame([(2,), (5,)], "id long")
    out = remove_doc_spans(doomed, state, k=K)
    rebuilt = init_span_state(
        corpus.filter(~F.col("doc_id").isin(2, 5)), k=K
    )
    assert _spans(out["spans"]) == _spans(rebuilt["spans"])
    assert _rows(out["grams"]) == _rows(rebuilt["grams"])
    assert {r[0] for r in _spans(out["spans"])} == {3, 4}

    delta = out["delta"]
    # doc 1 is touched (flip-down) and ends span-less: explicit delete
    assert {r.id for r in delta["spans"]["deletes"].collect()} == {1, 2, 5}
    assert delta["spans"]["upserts"].count() == 0
    assert {r.id for r in delta["docs"]["deletes"].collect()} == {2, 5}


def test_streaming_spans_equals_rebuild(spark, tmp_path):
    feed = str(tmp_path / "feed")
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(
        os.path.join(feed, "part=a")
    )
    run_streaming_spans(spark, feed + "/part=a", state_dir, ckpt + "1")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(
        os.path.join(feed, "part=b")
    )
    run_streaming_spans(spark, feed + "/part=b", state_dir, ckpt + "2")

    with open(os.path.join(state_dir, "_LATEST")) as fh:
        ptr = json.load(fh)
    assert len(ptr["chain"]) == 2  # second commit is a delta version
    delta_dir = os.path.join(state_dir, ptr["chain"][-1])
    for table in SPAN_TABLES:
        assert os.path.isdir(os.path.join(delta_dir, table, "upserts"))
    snap_grams = os.path.join(state_dir, ptr["chain"][0], "grams")
    assert any(d.startswith("gram_shard=") for d in os.listdir(snap_grams))

    got = load_span_state(spark, state_dir)
    rebuilt = init_span_state(docs)
    assert _spans(got["spans"]) == _spans(rebuilt["spans"])

    # committed takedown: state equals a rebuild over the remainder
    from graphiti_spark.operators.span_state import commit_remove_doc_spans

    doomed = docs.filter(F.col("doc_id") % 10 == 7).select(
        F.col("doc_id").alias("id")
    )
    commit_remove_doc_spans(spark, state_dir, doomed)
    with open(os.path.join(state_dir, "_LATEST")) as fh:
        assert len(json.load(fh)["chain"]) == 3
    got2 = load_span_state(spark, state_dir)
    rebuilt2 = init_span_state(docs.filter(F.col("doc_id") % 10 != 7))
    assert _spans(got2["spans"]) == _spans(rebuilt2["spans"])
    assert got2["docs"].count() == rebuilt2["docs"].count()


def test_replay_guard_scoped_to_stream(spark, corpus, tmp_path):
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    fn_a = make_span_batch_fn(state_dir, stream_id="a", k=K)
    b1 = corpus.filter(F.col("doc_id").isin(1, 6))
    b2 = corpus.filter(~F.col("doc_id").isin(1, 6))

    fn_a(b1, 0)
    seq0 = json.load(open(os.path.join(state_dir, "_LATEST")))["seq"]
    fn_a(b1, 0)  # replay: skipped
    assert json.load(open(os.path.join(state_dir, "_LATEST")))["seq"] == seq0

    fn_b = make_span_batch_fn(state_dir, stream_id="b", k=K)
    fn_b(b2, 0)  # new feed, batch 0 is NOT a replay
    got = load_span_state(spark, state_dir)
    rebuilt = init_span_state(corpus, k=K)
    assert _spans(got["spans"]) == _spans(rebuilt["spans"])
