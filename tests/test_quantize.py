"""int8 embedding quantization (functions/quantize.py): reconstruction
bound, constant-vector edge, and ANN recall over dequantized codes."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphiti_spark.functions.quantize import dequantize_col, quantize_embeddings

SF = "/root/testdata/sf0.001"


def test_reconstruction_error_bounded_by_half_step(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.5, -3.25]), (2, [10.0, 10.1, 9.9, 10.05])],
        "vec_id long, embedding array<float>",
    )
    out = quantize_embeddings(df)
    rows = {r.id: r for r in out.collect()}
    for r in rows.values():
        deq = [r.vmin + qi * r.scale for qi in r.q]
        # re-derive the original doubles from the float column
        assert r.rmse <= r.scale / 2 + 1e-9
        assert all(0 <= qi <= 255 for qi in r.q)
        assert len(deq) == len(r.q)


def test_constant_vector_quantizes_to_exact_zero(spark):
    df = spark.createDataFrame(
        [(1, [4.5, 4.5, 4.5])], "vec_id long, embedding array<float>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r.q == [0, 0, 0]
    assert r.scale == 0.0
    assert r.vmin == 4.5
    assert r.rmse == 0.0


def test_dequantized_topk_recall(spark):
    """int8 codes over 64-dim fixture embeddings must preserve the
    exact cosine top-10 almost perfectly (>= 9 of 10)."""
    from graphiti_spark.search.similarity import cosine_topk

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [
        float(x)
        for x in embs.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    exact = {r.id for r in cosine_topk(embs, qvec, limit=10).collect()}

    codes = quantize_embeddings(embs)
    deq = codes.select(
        F.col("id").alias("vec_id"),
        dequantize_col(F.col("q"), F.col("vmin"), F.col("scale"))
        .cast("array<float>")
        .alias("embedding"),
    )
    approx = {r.id for r in cosine_topk(deq, qvec, limit=10).collect()}
    assert len(exact & approx) >= 9


def test_ivf_quantized_recall_vs_full_float(spark):
    """The end-to-end quantized IVF path (probe cells chosen on full
    precision, candidate scan over dequantized int8 codes) must agree
    with the full-float IVF top-10 on >= 9 of 10 ids — quantization is
    the ONLY difference between the two paths, so the bound isolates
    the reconstruction error's ranking impact."""
    from graphiti_spark.search.similarity import (
        cosine_topk_ivf,
        cosine_topk_ivf_quantized,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qvec = [
        float(x)
        for x in embs.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    full = cosine_topk_ivf(
        embs, qvec, limit=10, n_cells=16, n_probe=4
    ).collect()
    quant = cosine_topk_ivf_quantized(
        embs, qvec, limit=10, n_cells=16, n_probe=4
    ).collect()
    assert len({r.id for r in full} & {r.id for r in quant}) >= 9
    # int8 over 64 dims: the reconstructed scores stay within a loose
    # absolute band of the float scores for the shared ids
    fs = {r.id: r.score for r in full}
    for r in quant:
        if r.id in fs:
            assert abs(r.score - fs[r.id]) < 0.05
