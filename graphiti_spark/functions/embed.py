"""Deterministic hash embeddings (SURVEY.md E9).

The reference calls a network embedder (graphiti_core/embedder/client.py:30-38)
and its tests replace it with a mock that returns a fixed vector per string
(tests/helpers_test.py:129-174). This engine's equivalent is a frozen
feature-hash embedding: char-3-gram shingles of the fuzzy-normalized text
hashed into EMBEDDING_DIM buckets with ±1 signs, L2-normalized — stable
across runs and machines, computed as an Arrow-vectorized pandas UDF.
Newline→space and falsy-skip semantics follow reference nodes.py:797-806.
"""

from __future__ import annotations

import math
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from graphiti_spark.config import EMBEDDING_DIM
from graphiti_spark.functions.dedup_text import normalize_name_for_fuzzy, shingles


def embed_text(text: str | None, dim: int = EMBEDDING_DIM) -> list[float] | None:
    """Frozen deterministic embedding of a short text."""
    if not text:  # reference skips falsy texts (nodes.py:800)
        return None
    cleaned = text.replace("\n", " ")
    grams = shingles(normalize_name_for_fuzzy(cleaned))
    vec = np.zeros(dim, dtype=np.float64)
    for g in sorted(grams):
        h = blake2b(g.encode(), digest_size=8).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if (h[4] & 1) == 0 else -1.0
        vec[idx] += sign
    norm = math.sqrt(float(np.dot(vec, vec)))
    if norm == 0.0:
        return [0.0] * dim
    return [float(x) for x in np.float32(vec / norm)]


def make_embed_udf(dim: int = EMBEDDING_DIM):
    """Arrow-vectorized embedding UDF with a per-batch memo over repeated
    strings (entity names repeat heavily across a corpus)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[float] | None] = {}

        def one(t):
            if t is None:
                return None
            hit = memo.get(t)
            if hit is None and t not in memo:
                hit = embed_text(t, dim)
                memo[t] = hit
            return hit

        return texts.map(one)

    return embed_udf


def cosine(a, b) -> float:
    """Driver/test-side cosine (reference search_utils.py:70-81)."""
    va, vb = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(va), np.linalg.norm(vb)
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(va, vb) / (na * nb))


def cosine_col(a, b):
    """Native-Spark cosine over two array<float> columns (no UDF):
    zip_with dot product + aggregate norms. Used by similarity search and
    the embedding-dedup fallback — stays in whole-stage codegen.

    Arrays are cast element-wise to double FIRST so every product/sum is
    IEEE-double — bit-identical to the DuckDB oracle's DOUBLE[] math
    (mixed float*float products would differ in the last ulp)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((norm_a == 0) | (norm_b == 0), F.lit(0.0)).otherwise(
        dot / (norm_a * norm_b)
    )
