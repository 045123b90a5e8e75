"""Multimodal-column operators (SURVEY.md §2 x5).

Media (image/audio/video) are opaque `binary` columns plus a typed metadata
struct; decode / feature-extract run as Arrow-batched pandas stages via
``mapInPandas``. The image/audio codec libraries are NOT in this container,
so the decode step is a clearly-marked deterministic stub — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested, and a
real decoder drops in by replacing ``_decode_stub`` only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, "
    "meta struct<width:int, height:int, n_bytes:int>"
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from text bytes (deterministic stand-in for real
    image/audio payloads): binary column + typed metadata struct."""
    media = F.encode(F.substring(F.col(text_col), 1, 64), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.struct(
            (F.length(media) % 64).cast("int").alias("width"),
            (F.length(media) % 48).cast("int").alias("height"),
            F.length(media).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decoder — deterministic fake 'pixel features' from the first 4
    bytes. A real implementation would `PIL.Image.open(io.BytesIO(payload))`
    etc.; those libs are not in this image."""
    head = payload[:4].ljust(4, b"\0")
    return [float(b) / 255.0 for b in head]


def extract_features(media_df: DataFrame) -> DataFrame:
    """x5 — per-row media 'decode' + feature extraction via mapInPandas:
    Arrow batches in, vectorized python per partition (one interpreter setup
    per batch, not per row — the scalable UDF shape)."""
    out_schema = "doc_id bigint, n_bytes int, features array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(m) for m in pdf["media"]],
                    "features": [_decode_stub(m) for m in pdf["media"]],
                }
            )

    return media_df.mapInPandas(run, schema=out_schema)


def resize_media(media_df: DataFrame, max_bytes: int = 32) -> DataFrame:
    """x5 — media 'resize' via mapInPandas: payload truncated to a byte
    budget, metadata struct rewritten to match (STUB for a real
    interpolating resize — swap the body, keep the schema/batch contract).
    The shape is the important part at scale: binary in → binary out in
    Arrow batches, no JVM<->Python per-row crossings, output schema typed so
    downstream stages stay columnar."""
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            clipped = [bytes(m)[:max_bytes] for m in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": clipped,
                    "media_type": pdf["media_type"],
                    "meta": [
                        {
                            "width": len(m) % 64,
                            "height": len(m) % 48,
                            "n_bytes": len(m),
                        }
                        for m in clipped
                    ],
                }
            )

    return media_df.mapInPandas(run, schema=out_schema)


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """x5 — frame sampling (video → rows): each media payload explodes into
    up to `n_frames` evenly-spaced 'frames' (deterministic byte slices — a
    real codec would seek keyframes; same one-to-many contract). Pure
    column expressions: sequence + transform + posexplode, so the expansion
    is codegen'd and the blowup factor is explicit and bounded."""
    # floor-then-cast: Spark's CAST(double AS INT) truncates but DuckDB's
    # rounds — explicit floor() keeps frame offsets engine-portable.
    frames = F.expr(
        f"transform(sequence(0, least({n_frames}, length(media)) - 1), "
        f"i -> substring(media, "
        f"CAST(floor(i * (length(media) / {n_frames})) AS INT) + 1, 8))"
    )
    return media_df.filter(F.length("media") > 0).select(
        "doc_id",
        F.posexplode(frames).alias("frame_no", "frame"),
    )
