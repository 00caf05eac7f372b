"""BPE tokenizer merge training over a distributed corpus.

A tokenizer is trained on the same curated web corpus this engine
produces (the reference — peabodyAdmin/graphiti — consumes tokenizers,
it does not train them; this extends the engine for the 100 TB
training-data case, SURVEY §2 "beyond the reference"). The algorithm is
classic byte-pair encoding (Sennrich et al. 2016, public): start from
character symbols, repeatedly merge the globally most frequent adjacent
symbol pair.

Spark-first decomposition — what is corpus-scale and what is bounded:

  1. **Word counting is the 100 TB part.** One explode + one
     map-side-combinable ``groupBy(word)`` over the whole corpus — the
     only stage that touches every byte. The result is capped to the
     top ``vocab_cap`` words (deterministic order: count DESC, word
     ASC), exactly the word-frequency-table reduction every public BPE
     trainer (subword-nmt, SentencePiece, HF tokenizers) performs: the
     merge loop never re-reads the corpus.
  2. **The merge loop runs over the CAPPED word table** (``vocab_cap``
     rows, invariant of corpus size). Each round is one pair-explode +
     combinable weighted count + global argmax (a 1-row collect — the
     argmax is inherently global, same pattern as k_core's convergence
     probe), then a pure-codegen ``F.aggregate`` left-fold applies the
     merge to every word's symbol array. The per-round frame is
     localCheckpoint'd — the iterative-plan-growth trap documented in
     CLAUDE.md / centrality.k_core.

Determinism contract (what the DuckDB oracle reproduces bit-for-bit):
  - words = engine-wide token contract (lower, trim, split ``\\s+``),
    restricted to ``^[a-z0-9]+$`` (keeps char indexing and the fold's
    unit-separator trick engine-portable; real trainers normalize
    similarly before counting).
  - merge application is a greedy LEFT-TO-RIGHT fold: scanning the
    symbol list once, a pair is merged when the accumulator's last
    symbol is ``left`` and the current symbol is ``right`` ("aaa" +
    (a,a) -> [aa, a]). Both engines implement this exact fold (Spark:
    array-accumulator ``F.aggregate``; DuckDB: ``list_reduce`` over a
    unit-separator-delimited string).
  - argmax tie-break: pair_count DESC, left ASC, right ASC.

Encoding (``bpe_token_counts``) is again corpus-scale-friendly: the
trained segmentation table is ``vocab_cap`` rows — always
broadcastable — so scoring a crawl is one explode + one broadcast join
+ one combinable per-doc sum; out-of-vocab words fall back to
character-count (documented OOV semantic, deterministic on both
engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens

WORD_RE = "^[a-z0-9]+$"


def bpe_word_counts(
    docs: DataFrame,
    text_col: str = "text",
    vocab_cap: int = 512,
) -> DataFrame:
    """Corpus word-frequency table, capped to the top ``vocab_cap``
    words (count DESC, word ASC — deterministic at the boundary).
    This is the single corpus-scale stage of BPE training: one
    map-side-combinable shuffle; the cap bounds everything downstream.
    Output (word, cnt)."""
    return (
        docs.select(
            F.explode(_tokens(F.col(text_col))).alias("word")
        )
        .where(F.col("word").rlike(WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(vocab_cap)
    )


def _fold_merge(left: str, right: str):
    """Factory for the greedy left-to-right merge fold (factory, not a
    loop-side lambda — the CLAUDE.md closure-shadowing trap)."""

    def fold(acc: Column, x: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return fold


_EMPTY_SYMS = "cast(array() as array<string>)"


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Apply ONE merge rule to a symbol array: greedy left-to-right
    single pass (pure codegen — no UDF, no shuffle)."""
    return F.aggregate(syms, F.expr(_EMPTY_SYMS), _fold_merge(left, right))


def _apply_merge_local(syms: list[str], left: str, right: str) -> list[str]:
    """Python twin of ``apply_merge``'s greedy left-to-right fold —
    same accumulator semantics ("aaa" + (a,a) -> [aa, a])."""
    acc: list[str] = []
    for x in syms:
        if acc and acc[-1] == left and x == right:
            acc[-1] = left + right
        else:
            acc.append(x)
    return acc


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 12,
    vocab_cap: int = 512,
    return_segmentation: bool = False,
    loop: str = "driver",
):
    """Learn ``num_merges`` BPE merges from the corpus.

    Returns the merge table (merge_rank, left_sym, right_sym,
    pair_count) as a DataFrame — or, with ``return_segmentation``,
    a (merges, segmentation) pair where segmentation is the final
    (word, cnt, syms) table (the vocab_cap-row broadcast side of
    encoding).

    ``loop`` picks where the merge rounds run (VERDICT r4 wrong #3):

      - ``"driver"`` (default): ONE collect of the capped word table —
        broadcast-sized by construction (``vocab_cap`` rows, invariant
        of corpus size) — then the whole merge loop in-driver. A real
        32k-merge vocabulary pays 1 cluster round-trip instead of
        ~32k (the per-round job + 1-row collect of the cluster loop).
      - ``"cluster"``: the original per-round Spark loop (one
        pair-explode + weighted count + argmax collect per merge) —
        kept as the equivalence witness
        (tests/test_bpe.py::test_driver_loop_equals_cluster_loop
        proves bit-identical merges AND segmentation at 64 merges).

    Both run the identical greedy fold and argmax tie-break
    (pair_count DESC, left ASC, right ASC), so the choice is invisible
    to every consumer — the ``bpe_merges`` DuckDB oracle is unchanged.

    Raises if the corpus exhausts before ``num_merges`` (every word
    collapsed to a single symbol) — a silent short merge table would
    desync any consumer that baked in the requested size.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    if loop not in ("driver", "cluster"):
        raise ValueError(f"unknown loop mode {loop!r}")
    spark = docs.sparkSession
    w = (
        bpe_word_counts(docs, text_col=text_col, vocab_cap=vocab_cap)
        .select("word", "cnt", F.split("word", "").alias("syms"))
        .localCheckpoint()
    )
    if loop == "driver":
        return _bpe_train_driver(
            spark, w, num_merges, return_segmentation
        )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        pairs = (
            w.select(
                "cnt",
                F.explode(
                    F.zip_with(
                        F.expr("slice(syms, 1, size(syms) - 1)"),
                        F.expr("slice(syms, 2, size(syms) - 1)"),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(F.desc("c"), "l", "r").limit(1).collect()
        if not best:
            raise ValueError(
                f"corpus exhausted after {rank - 1} merges "
                f"(requested {num_merges})"
            )
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((rank, left, right, cnt))
        # localCheckpoint: the per-round frame is vocab_cap rows; without
        # it the fold-in-fold lineage grows geometrically (CLAUDE.md).
        w = w.select(
            "word", "cnt", apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()

    from ..functions.smalldf import literal_df

    mdf = literal_df(
        spark,
        merges,
        [
            ("merge_rank", "int"),
            ("left_sym", "string"),
            ("right_sym", "string"),
            ("pair_count", "bigint"),
        ],
    )
    if return_segmentation:
        return mdf, w
    return mdf


def _bpe_train_driver(spark, w: DataFrame, num_merges: int,
                      return_segmentation: bool):
    """In-driver merge loop over the COLLECTED capped word table (the
    frame is vocab_cap rows by construction — bpe_word_counts caps it —
    so the collect is bounded and corpus-size-invariant). Semantics are
    the cluster loop's, verbatim: adjacent-pair weighted counts, argmax
    (count DESC, left ASC, right ASC), greedy left-to-right fold."""
    from ..functions.smalldf import literal_df

    words: list[list] = [
        [r["word"], int(r["cnt"]), list(r["word"])] for r in w.collect()
    ]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for _, cnt, syms in words:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + cnt
        if not counts:
            raise ValueError(
                f"corpus exhausted after {rank - 1} merges "
                f"(requested {num_merges})"
            )
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, int(cnt)))
        for row in words:
            row[2] = _apply_merge_local(row[2], left, right)

    mdf = literal_df(
        spark,
        merges,
        [
            ("merge_rank", "int"),
            ("left_sym", "string"),
            ("right_sym", "string"),
            ("pair_count", "bigint"),
        ],
    )
    if return_segmentation:
        seg = literal_df(
            spark,
            [(wd, cnt, syms) for wd, cnt, syms in words],
            [("word", "string"), ("cnt", "bigint"), ("syms", "array<string>")],
        )
        return mdf, seg
    return mdf


def bpe_token_counts(
    docs: DataFrame,
    segmentation: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count under a trained BPE segmentation.

    The segmentation table is vocab_cap rows — broadcast — so this is
    explode + broadcast join + combinable per-doc sum: no corpus-keyed
    shuffle beyond the final (id) aggregation. Out-of-vocab words cost
    ``length(word)`` (character fallback). Output
    (id, n_words, n_bpe_tokens)."""
    seg = F.broadcast(
        segmentation.select(
            "word", F.size("syms").cast("long").alias("n_syms")
        )
    )
    words = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(_tokens(F.col(text_col))).alias("word"),
        )
        .where(F.col("word") != "")
    )
    return (
        words.join(seg, "word", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(
                F.coalesce(
                    F.col("n_syms"), F.length("word").cast("long")
                )
            ).alias("n_bpe_tokens"),
        )
    )


def bpe_fertility(
    token_counts: DataFrame,
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer fertility per group (the standard tokenizer-evaluation
    metric: BPE tokens emitted per whitespace word — higher means the
    vocabulary serves that slice worse, the number tokenizer ablations
    report per language). One combinable groupBy over |groups| keys on
    top of ``bpe_token_counts``. Output (group_col, n_words,
    n_bpe_tokens, fertility)."""
    g = docs.select(
        F.col(id_col).alias("id"), F.col(group_col).alias("grp")
    )
    agg = (
        token_counts.join(g, "id")
        .groupBy("grp")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        )
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        (
            F.round(
                F.col("n_bpe_tokens").cast("double")
                / F.col("n_words").cast("double"),
                4,
            )
            + F.lit(0.0)
        ).alias("fertility"),
    )
