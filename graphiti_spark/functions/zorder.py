"""Z-order (Morton) interleave keys for co-clustered file layout.

At 100 TB the dominant read cost is how files are laid out: a table
sorted on one column prunes min/max skips on that column only, while a
Z-ORDER key interleaves the bits of two rank dimensions so files stay
simultaneously clustered on BOTH (the Iceberg `Z-ORDER BY` strategy —
SURVEY §2.1 S8 maps index DDL onto exactly this). This module computes
the key natively so `sortWithinPartitions(zorder_key(...))` (or a
repartitionByRange on it) gives two-dimensional data skipping without
engine support:

  - inputs are two NON-NEGATIVE 32-bit ranks (hash buckets, epoch
    minutes, quantile ranks — the caller picks the dimension encoding);
  - the interleave spreads each rank's bits to even/odd positions with
    the classic 5-step magic-mask sequence (pure integer codegen, no
    shuffle, no Python);
  - the result is < 2^63 (two 32-bit inputs → 64 interleaved bits with
    the top bit always from the masked-to-32-bit y shift — inputs are
    validated ≤ 2^31-1 so the key stays a positive BIGINT in both
    engines; DuckDB's UBIGINT<<63 overflow trap never arises).

The DuckDB oracle reconstructs the key bit-by-bit (32 explicit bit
positions — a DIFFERENT formulation than the magic masks, so a hash
match checks the arithmetic, not a copy of it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# magic-mask bit-spreading constants (classic Morton encoding)
_MASKS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread(c: Column) -> Column:
    """Spread a 32-bit value's bits to the even bit positions of a
    64-bit value: b31..b0 → 0b31 0b30 … 0b0."""
    out = c.cast("long")
    for shift, mask in _MASKS:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(
            F.lit(mask)
        )
    return out


def zorder_key(x: Column, y: Column) -> Column:
    """Morton key of two non-negative 32-bit ranks: x's bits on the
    even positions, y's on the odd. Raises at runtime (ANSI cast) on
    negative or > 2^31-1 inputs rather than silently wrapping."""
    xi = x.cast("long")
    yi = y.cast("long")
    guard = (
        (xi >= 0) & (xi <= 0x7FFFFFFF) & (yi >= 0) & (yi <= 0x7FFFFFFF)
    )
    key = _spread(xi).bitwiseOR(F.shiftleft(_spread(yi), 1))
    return F.when(guard, key).otherwise(
        F.raise_error(F.lit("zorder_key input outside [0, 2^31-1]"))
    )
