"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video columns as
opaque `binary` with typed metadata structs, processed by Arrow-batched
``mapInPandas`` kernels (one Python process per partition, zero
per-row overhead). The image/audio codec libraries are NOT in this
container (per round-1 constraints), so the decode step is STUBBED:

  - ``decode_image`` / ``decode_audio`` raise NotImplementedError for
    real formats — the clearly-marked integration point;
  - ``fake_decode_meta`` is the deterministic stand-in used by tests
    and the oracle gate: metadata derived arithmetically from the
    payload bytes (size → fake dimensions), so the Spark-side plumbing
    (binary Arrow batches, schema, partitioning, batch shape) is real
    and verified even though no pixels are decoded.

``media_metadata`` is the production-shaped operator: binary column in,
metadata DataFrame out, one mapInPandas pass.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_FORMAT = "fake"

META_SCHEMA = (
    "id string, n_bytes long, sha256 string, format string, "
    "width int, height int, channels int"
)


def decode_image(payload: bytes, fmt: str):
    """Real-codec integration point — STUB (no image libs in this
    container)."""
    if fmt == FAKE_FORMAT:
        return fake_decode_meta(payload)
    raise NotImplementedError(
        f"image codec for format {fmt!r} not available in this environment; "
        "wire Pillow/libvips here"
    )


def decode_audio(payload: bytes, fmt: str):
    """Real-codec integration point — STUB."""
    raise NotImplementedError(
        f"audio codec for format {fmt!r} not available in this environment"
    )


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic fake decode: dimensions derived from the byte
    length (arithmetic only → oracle-reproducible)."""
    n = len(payload)
    return {
        "n_bytes": n,
        "sha256": hashlib.sha256(payload).hexdigest(),
        "format": FAKE_FORMAT,
        "width": n % 640 + 1,
        "height": (n // 640) % 480 + 1,
        "channels": 3,
    }


def media_metadata(
    df: DataFrame, id_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """binary payload column → typed metadata via ONE mapInPandas pass
    (Arrow batches of bytes; the production shape for decode /
    feature-extract / resize kernels)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                fake_decode_meta(bytes(p)) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype(str),
                    "n_bytes": [m["n_bytes"] if m else None for m in metas],
                    "sha256": [m["sha256"] if m else None for m in metas],
                    "format": [m["format"] if m else None for m in metas],
                    "width": [m["width"] if m else None for m in metas],
                    "height": [m["height"] if m else None for m in metas],
                    "channels": [m["channels"] if m else None for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, META_SCHEMA)


def frame_sample_offsets(
    df: DataFrame,
    id_col: str = "url",
    payload_col: str = "html",
    n_frames: int = 4,
) -> DataFrame:
    """Video-style frame sampling stub: pick ``n_frames`` evenly-spaced
    byte offsets per payload (stand-in for keyframe extraction; the
    plumbing — explode of per-row sample positions — is the real shape).
    Native columns, no UDF. Output (id, frame_idx, byte_offset)."""
    n = F.length(F.col(payload_col)).cast("long")
    offs = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (i * n / F.lit(n_frames)).cast("long"),
    )
    return (
        df.select(F.col(id_col).cast("string").alias("id"), offs.alias("offs"))
        .select("id", F.posexplode("offs").alias("frame_idx", "byte_offset"))
    )
