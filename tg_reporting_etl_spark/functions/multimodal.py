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


# ------------------------------------------------------------------ decoders
#
# Image decode is environment-dependent (this container ships no image
# libs), so the decoder is REGISTRY-DISPATCHED exactly like the MERGE
# backend registry (sources/writers.py:_MERGE_BACKENDS): the
# highest-priority decoder whose availability probe passes wins.  A
# richer environment with Pillow installed gets true decode/resize with
# zero code change; this container falls through to the stub, whose
# honest NotImplementedError keeps the decode step clearly marked.
#
# Decoder contract: ``decode_fn(data: bytes) -> dict`` with keys
# ``width height mode pixels`` (pixels = raw RGB bytes), raising
# ValueError on undecodable payloads.


def _pillow_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_pillow(data: bytes) -> dict:
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(data)).convert("RGB")
    return {
        "width": img.width,
        "height": img.height,
        "mode": "RGB",
        "pixels": img.tobytes(),
    }


def _decode_stub(data: bytes) -> dict:
    """STUB: real decoder needs PIL/libvips — not in this container."""
    raise NotImplementedError("image decode requires an image library; container has none")


_IMAGE_DECODERS: list[tuple[str, object, object]] = [
    ("pillow", _pillow_available, _decode_pillow),
    ("stub", lambda: True, _decode_stub),
]


def register_image_decoder(name: str, available, decode_fn, *, front: bool = True) -> None:
    """Plug in an image decoder (e.g. libvips, turbojpeg).
    ``available() -> bool`` probes the environment; ``decode_fn`` has
    the decoder contract above.  ``front=True`` gives it priority over
    the built-ins."""
    entry = (name, available, decode_fn)
    if front:
        _IMAGE_DECODERS.insert(0, entry)
    else:
        _IMAGE_DECODERS.insert(len(_IMAGE_DECODERS) - 1, entry)  # above stub


def selected_image_decoder_name() -> str:
    """Which decoder decode_image dispatches to in this environment."""
    for name, available, _ in _IMAGE_DECODERS:
        if available():
            return name
    return "stub"


def decode_image(data: bytes) -> dict:
    """Decode image bytes via the registry (Pillow when importable,
    honest stub otherwise — register_image_decoder to extend)."""
    for _, available, decode_fn in _IMAGE_DECODERS:
        if available():
            return decode_fn(data)
    return _decode_stub(data)


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


def _decoder_by_name(name: str):
    for n, _, decode_fn in _IMAGE_DECODERS:
        if n == name:
            return decode_fn
    return _decode_stub


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Arrow-batched image resize via mapInPandas.

    The decode step dispatches through the decoder registry, selected
    ONCE on the driver (so the plan is deterministic even if executors
    have a different lib set): with a real decoder (Pillow importable,
    or anything registered via :func:`register_image_decoder`) each
    payload is decoded and nearest-neighbor-resampled to an RGB
    ``width x height`` thumb; in this container the selected decoder is
    the stub, and the transform is a deterministic byte-level
    downsample (stride-sampled payload truncated to width*height
    bytes) so batch shape, output schema and the binary round-trip
    stay end-to-end testable.  Only image rows are shipped to Python —
    the filter prunes other modalities before the Arrow exchange.
    """
    decoder_name = selected_image_decoder_name()
    # capture the FUNCTION, not just the name: the closure ships to
    # python workers by (cloud)pickle, so a decoder registered only in
    # the driver process still reaches executors without them having to
    # re-run the registration
    decode_fn = _decoder_by_name(decoder_name)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height

        def stub_thumb(b: bytes) -> bytes:
            data = bytes(b)
            if not data:
                return b""
            stride = max(1, len(data) // n_out)
            return data[::stride][:n_out]

        def decoded_thumb(b: bytes) -> bytes:
            img = decode_fn(bytes(b))
            # nearest-neighbor resample of the raw RGB plane — codec-free
            w0, h0, px = img["width"], img["height"], img["pixels"]
            out = bytearray()
            for y in range(height):
                sy = min(h0 - 1, y * h0 // height)
                for x in range(width):
                    sx = min(w0 - 1, x * w0 // width)
                    off = (sy * w0 + sx) * 3
                    out += px[off : off + 3]
            return bytes(out)

        thumb = stub_thumb if decoder_name == "stub" else decoded_thumb
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
