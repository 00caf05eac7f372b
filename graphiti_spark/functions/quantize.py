"""Per-vector affine int8 quantization for embedding columns — the
storage/bandwidth lever for ANN at corpus scale (a 100 TB embedding
table in float32 becomes ~25 TB in int8 + two doubles per vector; the
IVF/LSH candidate scan then reads a quarter of the bytes and exact
re-scoring on the float column touches only the top candidates).

    q_i   = round((x_i − vmin) / scale),  scale = (vmax − vmin) / (2^bits − 1)
    x̂_i  = vmin + q_i · scale

Everything is native column expressions (whole-stage codegen, no UDF,
no shuffle) and engine-portable: vmin/vmax/scale are exact IEEE
doubles, the rounding argument is always ≥ 0 (so Spark's HALF_UP and
DuckDB's round-half-away-from-zero agree), and the reconstruction
error fold uses the same left-to-right double aggregation the cosine
oracles already prove bit-identical to DuckDB's list_inner_product.

Constant vectors (vmax == vmin) quantize to all-zero codes with
scale 0 and reconstruct exactly to vmin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """array<float> → (id, q array<int>, vmin, scale, rmse): the int
    codes, the two per-vector reconstruction scalars, and the exact
    root-mean-square reconstruction error (rounded to 4 dp; the
    quantization-quality metric a pipeline monitors)."""
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    levels = float(2**bits - 1)
    vd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    vmin = F.array_min(vd)
    scale = (F.array_max(vd) - vmin) / F.lit(levels)
    q = F.when(
        scale == 0, F.transform(vd, lambda x: F.lit(0))
    ).otherwise(
        F.transform(vd, lambda x: F.round((x - vmin) / scale, 0).cast("int"))
    )
    base = df.select(
        F.col(id_col).alias("id"),
        vd.alias("_v"),
        q.alias("q"),
        (vmin + F.lit(0.0)).alias("vmin"),
        (scale + F.lit(0.0)).alias("scale"),
    )
    deq = F.transform(
        F.col("q"), lambda qi: F.col("vmin") + qi.cast("double") * F.col("scale")
    )
    err = F.zip_with(F.col("_v"), deq, lambda a, b: a - b)
    sq = F.aggregate(
        F.zip_with(err, err, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return base.select(
        "id",
        "q",
        "vmin",
        "scale",
        # empty-vector guard (ADVICE r03): 0.0/0 is NaN and would poison
        # any downstream avg/max monitoring aggregate; an empty embedding
        # reconstructs exactly (to nothing), so rmse 0.0 with null
        # vmin/scale is the honest row, matching the zero-norm guards in
        # the cosine paths
        F.when(
            F.size(F.col("q")) > 0,
            F.round(F.sqrt(sq / F.size(F.col("q"))), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("rmse"),
    )


def dequantize_col(q, vmin, scale):
    """(q array<int>, vmin, scale) columns → array<double> reconstruction."""
    return F.transform(q, lambda qi: vmin + qi.cast("double") * scale)
