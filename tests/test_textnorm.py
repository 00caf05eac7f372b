"""Text normalization: clean_input, truncate_at_sentence (vectors mirror
the reference's tests/test_text_utils.py semantics), html round-trip
byte-identity (the per-row invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark import textnorm


def test_clean_input():
    assert textnorm.clean_input("hello​world") == "helloworld"
    assert textnorm.clean_input("tab\there\nline") == "tab\there\nline"
    assert textnorm.clean_input("bell\x07char") == "bellchar"
    assert textnorm.clean_input("ok") == "ok"


def test_truncate_at_sentence():
    t = textnorm.truncate_at_sentence
    assert t("", 10) == ""
    assert t("short", 10) == "short"
    assert t("One. Two. Three.", 9) == "One. Two."
    assert t("One. Two. Three.", 8) == "One."
    assert t("no boundary here at all", 10) == "no boundar"
    assert t("Ends with period.", 200) == "Ends with period."
    assert t("A! B? C.", 4) == "A!"
    assert t("A! B? C. D", 9) == "A! B? C."
    # boundary exactly at the cut
    assert t("abcd. efgh", 5) == "abcd."


def test_truncate_col_matches_python(spark):
    texts = [
        "One. Two. Three.",
        "no boundary here at all and it keeps going",
        "Ends with period.",
        "A! B? C. D",
        "abcd. efgh",
        "x" * 600,
        "A sentence that is long. " * 30,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    for max_chars in (5, 9, 100, 500):
        rows = df.select(
            "t",
            textnorm.truncate_at_sentence_col(F.col("t"), max_chars).alias("cut"),
        ).collect()
        for r in rows:
            assert r.cut == textnorm.truncate_at_sentence(r.t, max_chars), (
                max_chars,
                r.t[:50],
            )


def test_html_roundtrip_byte_identity():
    texts = [
        "plain words here",
        "with <angle> & ampersand",
        "line one\nline two",
        "trailing space ",
    ]
    for i, t in enumerate(texts):
        html = textnorm.wrap_html(i, t).encode("utf-8")
        assert textnorm.extract_text(html) == t, repr(t)


def test_pages_invariant_on_corpus(spark):
    """extract_text(html) byte-identical to documents.text per url."""
    from graphiti_spark.sources.pages import load_documents, load_pages

    sf = "/root/testdata/sf0.001"
    docs = load_documents(spark, sf).select("doc_id", F.col("text").alias("orig"))
    pages = load_pages(spark, sf).select("doc_id", "text")
    diff = pages.join(docs, "doc_id").filter(F.col("text") != F.col("orig"))
    assert diff.count() == 0


def test_wrap_html_udf_matches_scalar(spark):
    """The vectorized html wrapper must equal the scalar wrap_html
    byte-for-byte (incl. entity escaping)."""
    import pandas as pd
    from graphiti_spark.sources.pages import _wrap_html_udf
    from graphiti_spark.textnorm import wrap_html

    texts = ["plain words", "a & b < c > d \"q\" 'x'", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    got = {r.doc_id: bytes(r.h) for r in
           df.select("doc_id", _wrap_html_udf("doc_id", "text").alias("h")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == wrap_html(i, t).encode("utf-8")


def test_clean_input_regex_semantics():
    from graphiti_spark.textnorm import clean_input

    assert clean_input("a\x00b\x1fc") == "abc"         # C0 stripped
    assert clean_input("a\tb\nc\rd") == "a\tb\nc\rd"   # kept whitespace
    assert clean_input("a​b⁠c") == "abc"     # zero-width stripped
    assert clean_input("déjà vu") == "déjà vu"         # unicode untouched


def test_fix_mojibake_repairs_cp1252_damage(spark):
    """Every table entry is the real cp1252 misreading of its value's
    UTF-8 bytes; the chain repairs them, is idempotent, and leaves
    clean text (incl. legitimately accented text) untouched."""
    from pyspark.sql import functions as F

    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.textnorm import (
        MOJIBAKE_SAMPLE,
        MOJIBAKE_TABLE,
        fix_mojibake_col,
    )

    for bad, good in MOJIBAKE_TABLE:
        if good != " ":  # nbsp is deliberately normalized to plain space
            assert bad == good.encode("utf-8").decode("cp1252")

    expected = MOJIBAKE_SAMPLE
    for bad, good in MOJIBAKE_TABLE:
        expected = expected.replace(bad, good)
    clean = "déjà vu — naïve café"
    rows = [(1, MOJIBAKE_SAMPLE), (2, expected), (3, clean)]
    df = literal_df(spark, rows, [("id", "bigint"), ("t", "string")])
    out = {
        r["id"]: r["f"]
        for r in df.select(
            "id", fix_mojibake_col(F.col("t")).alias("f")
        ).collect()
    }
    assert out[1] == expected          # repaired
    assert out[2] == expected          # idempotent on repaired text
    assert out[3] == clean             # clean accents untouched


def test_fix_mojibake_is_shuffle_free(spark):
    from pyspark.sql import functions as F

    from graphiti_spark.functions.smalldf import literal_df
    from graphiti_spark.textnorm import fix_mojibake_col

    df = literal_df(spark, [(1, "x")], [("id", "bigint"), ("t", "string")])
    plan = (
        df.select(fix_mojibake_col(F.col("t")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_fold_homoglyphs(spark):
    """Cyrillic/Greek/fullwidth confusables fold to ASCII, zero-widths
    delete, clean ASCII is untouched, and the fold is idempotent."""
    from pyspark.sql import functions as F

    from graphiti_spark.textnorm import HOMOGLYPH_SAMPLE, fold_homoglyphs_col

    df = spark.createDataFrame(
        [(1, HOMOGLYPH_SAMPLE), (2, "plain ascii text!")], "id long, t string"
    )
    out = {
        r["id"]: (r["f"], r["ff"])
        for r in df.select(
            "id",
            fold_homoglyphs_col(F.col("t")).alias("f"),
            fold_homoglyphs_col(fold_homoglyphs_col(F.col("t"))).alias("ff"),
        ).collect()
    }
    assert out[1][0] == "free viagra now vip FREE123 deal zerowidthend"
    assert out[2][0] == "plain ascii text!"
    assert all(f == ff for f, ff in out.values())  # idempotent
