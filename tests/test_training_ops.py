"""Training-data pipeline operators: document dedup family, text
analysis, multimodal plumbing."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from graphiti_spark.operators.dedup_docs import (
    canonical_docs,
    embedding_near_dup,
    exact_dedup,
    minhash_near_dup,
    simhash_near_dup,
)
from graphiti_spark.operators.multimodal import (
    decode_image,
    fake_decode_meta,
    frame_sample_offsets,
    media_metadata,
)
from graphiti_spark.operators.textstats import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog again and AGAIN "),  # exact after norm
        (4, "a completely different document about spark shuffles"),
        (5, "the quick brown fox jumps over the lazy cat again and again"),  # near dup of 1
        (6, "le chat est dans la maison et le chien est dans le jardin"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r.id: (r.canonical_id, r.n_copies) for r in exact_dedup(docs).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[4] == (4, 1)


def test_minhash_near_dup_word(docs):
    pairs = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_near_dup(docs, threshold=0.8, mode="word").collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical word sets
    assert (1, 5) in pairs  # fox/cat swap: 10/12 words shared ≥ 0.8
    assert not any(4 in p or 6 in p for p in pairs)


def test_minhash_word3_order_sensitive(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "zeta epsilon delta gamma beta alpha"),  # same words, reversed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    word = minhash_near_dup(df, threshold=0.9, mode="word").collect()
    word3 = minhash_near_dup(df, threshold=0.3, mode="word3").collect()
    assert len(word) == 1  # word-set view: duplicates
    assert len(word3) == 0  # 3-gram view: nothing shared


def test_minhash_incremental_composes_with_batch(docs):
    """The incremental dedup law: pairs(new vs prior-index) ∪
    pairs(prior) == pairs(prior ∪ new), and the incremental side never
    emits a prior x prior pair — the contract that lets a 100 TB corpus
    dedup each crawl increment without re-pairing itself."""
    from graphiti_spark.operators.dedup_docs import (
        build_minhash_index,
        minhash_near_dup_incremental,
    )

    prior = docs.filter(F.col("doc_id") <= 3)
    new = docs.filter(F.col("doc_id") > 3)
    inc = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_near_dup_incremental(
            new, build_minhash_index(prior), prior, threshold=0.8
        ).collect()
    }
    prior_pairs = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_near_dup(prior, threshold=0.8).collect()
    }
    full = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_near_dup(docs, threshold=0.8).collect()
    }
    assert {**prior_pairs, **inc} == full
    assert not set(inc) & set(prior_pairs)
    assert all(a > 3 or b > 3 for a, b in inc)  # every pair touches new
    assert (1, 5) in inc  # new x prior found through the index


def test_minhash_incremental_caps_surfaced(docs):
    """A bound combined bucket (new + prior rows per band key) drops
    pairs but never silently: the dropped-bucket metrics land in the
    sink with the total bucket population."""
    from graphiti_spark.operators.dedup_docs import (
        build_minhash_index,
        minhash_near_dup_incremental,
    )

    prior = docs.filter(F.col("doc_id") <= 3)
    new = docs.filter(F.col("doc_id") > 3)
    sink = []
    out = minhash_near_dup_incremental(
        new, build_minhash_index(prior), prior,
        threshold=0.8, max_bucket=1, dropped_sink=sink,
    )
    assert out.count() == 0  # every pairing bucket (size >= 2) capped
    dropped = sink[0].collect()
    assert dropped and all(r.bucket_n >= 2 for r in dropped)


def test_canonical_incremental_bridges_components(spark):
    """Incremental canonical maintenance: a new doc whose pairs touch TWO
    prior components must merge them (the hard case — the update can't
    treat prior canonicals as immutable), singleton batch docs map to
    themselves, and untouched components pass through byte-identical.
    Result must equal the full CC rebuild over the union."""
    from graphiti_spark.operators.dedup_docs import canonical_docs_incremental

    prior_canon = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 6)],
        "id long, canonical_id long",
    )
    new_docs = spark.createDataFrame([(7,), (8,)], "doc_id long")
    new_pairs = spark.createDataFrame([(2, 7), (3, 7)], "a_id long, b_id long")
    out = {
        r.id: r.canonical_id
        for r in canonical_docs_incremental(
            prior_canon, new_docs, new_pairs
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 7: 1, 5: 5, 6: 6, 8: 8}

    all_docs = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    all_pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (2, 7), (3, 7)], "a_id long, b_id long"
    )
    full = {
        r.id: r.canonical_id
        for r in canonical_docs(all_docs, all_pairs).collect()
    }
    assert out == full


def test_simhash_near_dup(docs):
    pairs = {(r.a_id, r.b_id): r.hamming for r in simhash_near_dup(docs).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
    assert (1, 4) not in pairs


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.999, 0.04]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.a_id, r.b_id): r.cos for r in embedding_near_dup(df, threshold=0.9).collect()}
    assert (1, 2) in pairs and len(pairs) == 1


def test_canonical_docs(docs):
    pairs = minhash_near_dup(docs, threshold=0.8, mode="word")
    out = {r.id: r.canonical_id for r in canonical_docs(docs, pairs).collect()}
    assert out[1] == out[2] == out[3] == out[5] == 1
    assert out[4] == 4 and out[6] == 6


def test_language_id(docs, spark):
    out = {r.id: r.pred_lang for r in language_id(docs).collect()}
    assert out[1] == "en" and out[6] == "fr"
    und = spark.createDataFrame([(9, "xyzzy plugh")], "doc_id long, text string")
    assert language_id(und).collect()[0].pred_lang == "und"


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "Hello, world! x2")], "doc_id long, text string")
    r = token_stats(df).collect()[0]
    assert r.n_ws_tokens == 3
    # BPE-ish: Hello , world ! x 2 → 6
    assert r.n_bpe_tokens == 6
    assert r.n_chars == 16


def test_quality_score(docs):
    rows = {r.id: r for r in quality_score(docs).collect()}
    assert rows[1].score == 1.0  # prose-like English
    assert rows[1].n_tokens == 12
    assert rows[1].distinct_ratio == round(10 / 12, 4)


def test_doc_fingerprint_shift_invariant(spark):
    # min-gram fingerprint survives a prefix insertion (content hash doesn't)
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "zz a b c d e f g h i j"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in doc_fingerprint(df).collect()}
    assert out[1].content_sha != out[2].content_sha
    shared = "c d e f g h".split()  # both contain gram "c d e f g"
    assert out[1].min_gram_sha is not None
    # the min over a superset of grams can only be ≤; equality holds when
    # the shared gram region contains the minimum
    assert out[2].min_gram_sha <= out[1].min_gram_sha


def test_fake_decode_and_stub():
    meta = fake_decode_meta(b"x" * 1300)
    assert (meta["width"], meta["height"], meta["channels"]) == (1300 % 640 + 1, 3, 3)[0:1] + (
        (1300 // 640) % 480 + 1,
        3,
    )
    assert meta["sha256"] == hashlib.sha256(b"x" * 1300).hexdigest()
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "png")


def test_media_metadata_plumbing(spark):
    df = spark.createDataFrame(
        [("u1", bytearray(b"abc")), ("u2", bytearray(b"d" * 700))],
        "url string, html binary",
    )
    out = {r.id: r for r in media_metadata(df).collect()}
    assert out["u1"].n_bytes == 3 and out["u1"].width == 4
    assert out["u2"].height == 2  # 700 // 640 = 1 → +1
    assert out["u2"].sha256 == hashlib.sha256(b"d" * 700).hexdigest()


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([("u1", bytearray(b"x" * 100))], "url string, html binary")
    offs = [(r.frame_idx, r.byte_offset) for r in frame_sample_offsets(df).collect()]
    assert offs == [(0, 0), (1, 25), (2, 50), (3, 75)]


# ---- exact-substring span dedup (dup_spans / drop_dup_spans) ----


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa unique one"),
        (2, "prefix words here alpha beta gamma delta epsilon zeta eta theta iota kappa suffix"),
        (3, "totally different content nothing shared with others at all in this document"),
        (4, "rep rep rep rep rep rep rep rep rep rep tail"),
        (5, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_spans_maximal_merge(span_docs):
    from graphiti_spark.operators.dedup_docs import dup_spans

    got = {
        (r.id, r.span_start, r.span_end, r.span_len)
        for r in dup_spans(span_docs, k=8).collect()
    }
    # docs 1/2 share the 10-token run; the three overlapping 8-grams
    # merge into ONE maximal span on each side
    assert got == {(1, 0, 9, 10), (2, 3, 12, 10), (4, 0, 9, 10)}


def test_dup_spans_cross_doc_only_drops_self_repeat(span_docs):
    from graphiti_spark.operators.dedup_docs import dup_spans

    got = {
        (r.id, r.span_start, r.span_end)
        for r in dup_spans(span_docs, k=8, cross_doc_only=True).collect()
    }
    # doc 4's within-doc repetition has no second document → excluded
    assert got == {(1, 0, 9), (2, 3, 12)}


def test_drop_dup_spans_rewrite(span_docs):
    from graphiti_spark.operators.dedup_docs import drop_dup_spans

    got = {r.id: r for r in drop_dup_spans(span_docs, k=8).collect()}
    assert got[1].text_dedup == "unique one"
    assert got[2].text_dedup == "prefix words here suffix"
    assert (got[3].n_dropped, got[4].text_dedup) == (0, "tail")
    assert got[5].text_dedup == "short doc"  # < k tokens: untouched
    for r in got.values():
        # n_kept must equal the surviving token count exactly
        assert r.n_kept == len([t for t in r.text_dedup.split(" ") if t])


def test_dup_spans_short_and_empty_docs(spark):
    from graphiti_spark.operators.dedup_docs import drop_dup_spans, dup_spans

    docs = spark.createDataFrame(
        [(1, "tiny"), (2, ""), (3, "   "), (4, "seven words is less than k here")],
        "doc_id long, text string",
    )
    assert dup_spans(docs, k=8).count() == 0
    out = {r.id: r for r in drop_dup_spans(docs, k=8).collect()}
    assert out[1].n_dropped == 0 and out[4].n_dropped == 0


def test_semantic_dedup_groups_within_cells(spark):
    """Two orthogonal directions => two cells; near-parallel vectors in
    the same direction dedup together, cross-direction never pairs.
    The hash-picked centroids for ids 1..5 at n_cells=2 are ids 4 and 3
    (sha256 order) — the fixture anchors one direction on each so the
    near-dup groups land inside single cells (pairs straddling a cell
    boundary are invisible by SemDeDup's own design)."""
    from graphiti_spark.operators.dedup_docs import semantic_dedup

    rows = [
        (1, [0.999, 0.01, 0.0, 0.0]),   # near 3
        (2, [0.998, 0.02, 0.0, 0.0]),   # near 3
        (3, [1.0, 0.0, 0.0, 0.0]),      # centroid A
        (4, [0.0, 1.0, 0.0, 0.0]),      # centroid B
        (5, [0.01, 0.999, 0.0, 0.0]),   # near 4
    ]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.id: r for r in
           semantic_dedup(embs, n_cells=2, threshold=0.99).collect()}
    assert len(out) == 5
    assert out[1].cell == out[2].cell == out[3].cell == 3
    assert out[4].cell == out[5].cell == 4
    got = {i: r.canonical_id for i, r in out.items()}
    assert got[1] == got[2] == got[3] == 1   # direction-A group
    assert got[4] == got[5] == 4             # direction-B group


def test_ivf_cell_cap_binds_and_is_surfaced(spark):
    """r5 (VERDICT r4 wrong #2): a degenerate centroid set that funnels
    every vector into ONE cell no longer goes silently quadratic —
    with max_cell the mega-cell is dropped from the pair stage and
    SURFACED as a (cell, cell_n) metrics frame (the
    dropped_lsh_buckets contract); its members survive as singleton
    canonicals / edge-less nodes, never as wrong rows."""
    from pyspark.sql import functions as F

    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.operators.dedup_docs import semantic_dedup
    from graphiti_spark.search.similarity import knn_graph

    # one centroid -> all 6 vectors land in cell 100
    rows = [(i, [1.0, float(i) * 0.001]) for i in range(1, 7)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = literal_df(
        spark, [(100, [1.0, 0.0])], [("cid", "bigint"), ("cvec", "array<double>")]
    )

    sink: list = []
    knn = knn_graph(embs, k=2, centroids=cents, max_cell=5, dropped_sink=sink)
    assert knn.count() == 0                       # capped cell emits no edges
    drops = sink[0].collect()
    assert [(r["cell"], r["cell_n"]) for r in drops] == [(100, 6)]

    # uncapped (default) is unchanged; a cap ABOVE the cell is inert
    assert knn_graph(embs, k=2, centroids=cents).count() > 0
    sink2: list = []
    knn_ok = knn_graph(
        embs, k=2, centroids=cents, max_cell=100, dropped_sink=sink2
    )
    assert knn_ok.count() > 0 and sink2[0].isEmpty()

    # semantic_dedup: capped mega-cell -> all singletons + surfaced drop
    sink3: list = []
    out = semantic_dedup(
        embs, n_cells=1, threshold=0.5, max_cell=5, dropped_sink=sink3
    )
    got = {r.id: r.canonical_id for r in out.collect()}
    assert got == {i: i for i in range(1, 7)}     # members kept, singleton
    assert [(r["cell"], r["cell_n"]) for r in sink3[0].collect()] == [
        (sink3[0].collect()[0]["cell"], 6)
    ]


def test_dup_spans_incremental_law(spark):
    """Incremental span law: spans(new vs prior-index) covers exactly
    the new docs plus the prior docs whose grams flipped to duplicated,
    and union with the untouched prior spans equals the full rebuild."""
    from graphiti_spark.operators.dedup_docs import (
        build_gram_index,
        dup_spans,
        dup_spans_incremental,
    )

    rows = [
        # prior: doc 10 holds run G once (unique in prior)
        (10, "gee one two three four five six seven tail here"),
        # prior: docs 11/12 already share a duplicated run
        (11, "aa bb cc dd ee ff gg hh end marker"),
        (12, "lead in aa bb cc dd ee ff gg hh"),
        (13, "completely unrelated prior content with nothing repeated anywhere at all"),
        # new: doc 20 re-uses run G -> flips it, touching doc 10
        (20, "intro gee one two three four five six seven outro"),
        # new: doc 21 adds nothing duplicated
        (21, "fresh novel words that appear nowhere else in this corpus"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    prior = docs.filter(F.col("doc_id") < 20)
    new = docs.filter(F.col("doc_id") >= 20)

    inc = dup_spans_incremental(new, build_gram_index(prior))
    inc_rows = {tuple(r) for r in inc.collect()}
    inc_ids = {r[0] for r in inc_rows}
    assert inc_ids == {10, 20}  # touched prior + spanning new; 11/12/13/21 absent

    prior_rows = {tuple(r) for r in dup_spans(prior).collect()}
    untouched = {r for r in prior_rows if r[0] not in inc_ids}
    full_rows = {tuple(r) for r in dup_spans(docs).collect()}
    assert inc_rows | untouched == full_rows


def test_dup_spans_matches_bruteforce_on_random_corpora(spark):
    """Randomized hardening (fixed seeds): dup_spans must equal a
    driver-side brute-force reference — k-gram occurrence counting over
    a tiny alphabet (forcing heavy collisions, overlaps, and within-doc
    repeats) followed by interval merging."""
    import random

    from graphiti_spark.operators.dedup_docs import dup_spans

    k = 3
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        corpus = {
            did: [rng.choice("abcd") for _ in range(rng.randint(0, 12))]
            for did in range(1, 9)
        }
        # brute force: count every k-gram, mark dup starts, merge islands
        from collections import Counter

        cnt = Counter()
        for toks in corpus.values():
            for i in range(len(toks) - k + 1):
                cnt[tuple(toks[i : i + k])] += 1
        expected = set()
        for did, toks in corpus.items():
            marks = [
                i
                for i in range(len(toks) - k + 1)
                if cnt[tuple(toks[i : i + k])] > 1
            ]
            spans = []
            for p in marks:
                if spans and p <= spans[-1][1] + 1:
                    spans[-1][1] = max(spans[-1][1], p + k - 1)
                else:
                    spans.append([p, p + k - 1])
            for s, e in spans:
                expected.add((did, s, e, e - s + 1))

        docs = spark.createDataFrame(
            [(did, " ".join(toks)) for did, toks in corpus.items()],
            "doc_id long, text string",
        )
        got = {tuple(r) for r in dup_spans(docs, k=k).collect()}
        assert got == expected, f"seed {seed}: {got ^ expected}"


def test_drop_dup_spans_keep_case(spark):
    """keep_case=True cuts the same span positions but from the RAW
    token stream — case and punctuation survive in the remainder."""
    from graphiti_spark.operators.dedup_docs import drop_dup_spans

    rows = [
        (1, "Alpha Beta gamma delta epsilon zeta eta theta UNIQUE One!"),
        (2, "alpha beta GAMMA delta epsilon zeta eta theta other tail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in drop_dup_spans(docs, k=8, keep_case=True).collect()}
    assert got[1].text_dedup == "UNIQUE One!"
    assert got[2].text_dedup == "other tail"
    assert got[1].n_dropped == got[2].n_dropped == 8


def test_contrastive_pairs_shape_and_determinism(spark):
    """Each near-dup pair yields BOTH directions, every example gets
    exactly k negatives drawn from the corpus id space, and draws are
    a pure function of (seed, anchor, pos, neg_idx)."""
    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.operators.dedup_docs import contrastive_pairs

    docs = literal_df(
        spark, [(i,) for i in range(50)], [("doc_id", "bigint")]
    )
    pairs = literal_df(
        spark, [(3, 7), (10, 4)], [("a_id", "bigint"), ("b_id", "bigint")]
    )
    out = contrastive_pairs(docs, pairs, k_neg=2).collect()
    assert len(out) == 2 * 2 * 2  # 2 pairs x 2 directions x k=2
    examples = {(r["anchor"], r["pos"]) for r in out}
    assert examples == {(3, 7), (7, 3), (10, 4), (4, 10)}
    assert all(0 <= r["negative"] < 50 for r in out)
    by_ex = {}
    for r in out:
        by_ex.setdefault((r["anchor"], r["pos"]), []).append(r["neg_idx"])
    assert all(sorted(v) == [0, 1] for v in by_ex.values())
    again = contrastive_pairs(docs, pairs, k_neg=2).collect()
    assert {tuple(r) for r in out} == {tuple(r) for r in again}
    # direction matters for the draw key: (3,7) and (7,3) draw
    # independently (they MAY coincide, but not by construction)
    assert ("anchor", "pos", "neg_idx", "negative") == tuple(out[0].__fields__)


def test_representative_docs_winner_rule(spark):
    """Best score wins; score ties break to MIN id; singleton clusters
    represent themselves; n_members counts every member."""
    from graphiti_spark.operators.dedup_docs import representative_docs

    canon = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
        "id long, canonical_id long",
    )
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.75), (3, 0.75), (7, 0.0), (9, 0.25), (10, 0.25)],
        "id long, score double",
    )
    got = {
        r["canonical_id"]: (r["rep_id"], r["rep_score"], r["n_members"])
        for r in representative_docs(canon, scores).collect()
    }
    assert got == {
        1: (2, 0.75, 3),   # max score; tie 2-vs-3 -> min id 2
        7: (7, 0.0, 1),    # singleton, zero score stays 0.0 (no -0.0)
        9: (9, 0.25, 2),   # tie -> min id
    }
    assert all(str(v[1]) != "-0.0" for v in got.values())


def test_representative_docs_null_scores_lose(spark):
    """A member with NO quality score must never beat a scored member;
    an all-null cluster reports rep_score null with min-id winner."""
    from graphiti_spark.operators.dedup_docs import representative_docs

    canon = spark.createDataFrame(
        [(1, 1), (2, 1), (8, 8), (9, 8)], "id long, canonical_id long"
    )
    scores = spark.createDataFrame(
        [(1, 0.9), (2, None), (8, None), (9, None)],
        "id long, score double",
    )
    got = {
        r["canonical_id"]: (r["rep_id"], r["rep_score"])
        for r in representative_docs(canon, scores).collect()
    }
    assert got == {1: (1, 0.9), 8: (8, None)}


def test_edit_distance_pairs_catches_every_single_edit_shape(spark):
    """Substitution/insertion/deletion in either half, boundary edits,
    tiny strings — all caught; ed=2 pairs excluded."""
    from graphiti_spark.operators.dedup_docs import edit_distance_pairs

    rows = [
        (1, "abcdef"),
        (2, "abcdeX"),   # substitution, 2nd half -> (1,2) d1
        (3, "Xbcdef"),   # substitution, 1st half -> (1,3) d1
        (4, "abcdefg"),  # insertion at end -> (1,4) d1
        (5, "bcdef"),    # deletion at front -> (1,5) d1
        (6, "abcXdef"),  # insertion at the half boundary -> (1,6) d1
        (7, "XbcdeX"),   # ed 2 from 1 -> no pair with 1
        (8, "a"),
        (9, "ab"),       # tiny: (8,9) d1
        (10, "zzzzzz"),  # unrelated
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in edit_distance_pairs(df).collect()
    }
    expected_with_1 = {(1, 2), (1, 3), (1, 4), (1, 5), (1, 6)}
    assert expected_with_1 <= set(got)
    assert all(got[p] == 1 for p in expected_with_1)
    assert (1, 7) not in got and (8, 9) in got
    assert not any(10 in p for p in got)
    # exhaustive: no pair beyond brute-force truth
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    truth = {
        (i, j)
        for (i, si), (j, sj) in itertools.combinations(rows, 2)
        if lev(si, sj) <= 1
    }
    assert set(got) == truth
