"""Multimodal column plumbing — opaque binary media + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub; everything Spark-side is real and tested: binary
column handling, schema, Arrow batch shape through mapInPandas, and the
partitioning story (media rows are heavy -> repartition by doc_id before
Python so batches are balanced).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len long, header_hex string, checksum string"
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary 'media' column from text (stand-in
    for real image/audio bytes) plus a typed metadata column."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def decode_image(data: bytes) -> object:
    """STUB: real decoder needs PIL/libvips — not in this container."""
    raise NotImplementedError("image decode requires an image library; container has none")


def extract_media_features(media: DataFrame, batch_target_rows: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary media via mapInPandas.

    The pandas function is where a real pipeline would decode + embed
    (resize, frame-sample, mel-spectrogram...); here it computes
    deterministic byte-level features so the plumbing is end-to-end
    testable.  Batches arrive as Arrow buffers — no per-row pickling.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["media"].map(len).astype("int64"),
                    "header_hex": pdf["media"].map(lambda b: bytes(b[:8]).hex().upper()),
                    "checksum": pdf["media"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return media.repartition("doc_id").mapInPandas(_features, MEDIA_FEATURE_SCHEMA)


def media_metadata_expr(media: DataFrame) -> DataFrame:
    """The same features as pure column expressions (JVM fast path) —
    used as the oracle-checked twin of the mapInPandas route."""
    return media.select(
        "doc_id",
        "media_type",
        F.octet_length("media").cast("long").alias("byte_len"),
        F.upper(F.hex(F.substring(F.col("media"), 1, 8))).alias("header_hex"),
        F.md5("media").alias("checksum"),
    )
