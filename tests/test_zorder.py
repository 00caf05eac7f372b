"""Morton/Z-order key: hand-verified interleave, locality property,
and the out-of-range guard."""

import pytest
from pyspark.sql import functions as F

from graphiti_spark.functions.zorder import zorder_key


def _z(py_x, py_y):
    out = 0
    for i in range(31):
        out |= ((py_x >> i) & 1) << (2 * i)
        out |= ((py_y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_hand_values(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 3), (0x7FFFFFFF, 0x7FFFFFFF),
            (12345, 67890)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _z(x, y), (x, y)
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2 and got[(5, 3)] == 0b011011


def test_zorder_rejects_out_of_range(spark):
    df = spark.createDataFrame([(-1, 0)], "x long, y long")
    with pytest.raises(Exception, match="zorder_key input"):
        df.select(zorder_key(F.col("x"), F.col("y"))).collect()


def test_zorder_locality_beats_single_sort(spark):
    """The point of the key: sorting by zkey keeps BOTH dimensions
    locally clustered — in a 16x16 grid, consecutive z-ordered cells
    stay within a bounded x AND y distance on average, which a plain
    (x, y) lexicographic sort cannot do for y."""
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    ordered = (
        df.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
        .orderBy("z")
        .collect()
    )
    # consecutive pairs in z order: mean Chebyshev distance stays small
    dists = [
        max(abs(a["x"] - b["x"]), abs(a["y"] - b["y"]))
        for a, b in zip(ordered, ordered[1:])
    ]
    assert sum(dists) / len(dists) < 2.0
    # lexicographic (x, y) sort: each x-block boundary jumps the full
    # y range, mean Chebyshev distance is ~1 but y-range per 16-row
    # window spans everything; z-order bounds the 16-row window spread
    window_spread = max(
        max(r["y"] for r in ordered[i : i + 16])
        - min(r["y"] for r in ordered[i : i + 16])
        for i in range(0, 256, 16)
    )
    assert window_spread <= 7  # a 16-cell z window covers a <=8x8 tile
