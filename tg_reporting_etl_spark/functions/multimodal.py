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


RESIZE_SCHEMA = "doc_id long, media_type string, width int, height int, thumb binary"


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched image resize via mapInPandas.

    A real pipeline decodes (:func:`decode_image`), resizes with
    PIL/libvips and re-encodes; with no codecs in the container the
    transform is a deterministic byte-level downsample (stride-sampled
    payload truncated to width*height bytes) so batch shape, output
    schema and the binary round-trip are end-to-end testable.  Only
    image rows are shipped to Python — the filter prunes other
    modalities before the Arrow exchange.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height

        def thumb(b: bytes) -> bytes:
            data = bytes(b)
            if not data:
                return b""
            stride = max(1, len(data) // n_out)
            return data[::stride][:n_out]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": width,
                    "height": height,
                    "thumb": pdf["media"].map(thumb),
                }
            )

    imgs = media.filter(F.col("media_type").startswith("image/"))
    return imgs.repartition("doc_id").mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id long, frame_no int, frame_offset long, frame binary"


def sample_video_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 256) -> DataFrame:
    """Uniform frame sampling over video payloads via mapInPandas.

    Emits ``n_frames`` evenly-spaced byte windows per video (one output
    row per frame — the fan-out happens inside the Arrow batch, so a
    1-row-in/N-rows-out pandas function demonstrates the non-1:1 batch
    shape).  A real build seeks container keyframes with pyav/ffmpeg at
    exactly this spot.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame_offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                data = bytes(payload)
                if not data:
                    continue
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    off = min(i * step, max(0, len(data) - 1))
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame_offset"].append(off)
                    out["frame"].append(data[off : off + frame_bytes])
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_no": "int32", "frame_offset": "int64"}
            )

    vids = media.filter(F.col("media_type").startswith("video/"))
    return vids.repartition("doc_id").mapInPandas(_frames, FRAME_SAMPLE_SCHEMA)


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
