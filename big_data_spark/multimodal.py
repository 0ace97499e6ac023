"""Multimodal (image/audio/video) column plumbing.

Design: media content is an opaque ``binary`` column plus a typed
metadata struct (``MEDIA_META``) — the layout a 100 TB training-data
lake uses (parquet binary + stats columns; large blobs partition by
size, never by content). All per-item work runs as Arrow-batched
``mapInPandas`` kernels: the binary payload crosses the JVM->Python
boundary once per batch, not per row, and each output batch is a
plain pandas DataFrame matching the declared schema.

Real codecs (pillow / soundfile / av) are NOT in this container, so
the decode step is split:

- ``decode_image`` / ``decode_audio`` — the real entry points; they
  raise ``NotImplementedError`` with the dependency name until the
  codec library is installed (import-gated, never stubbed silently).
- ``fake_decode_image`` — a deterministic byte-arithmetic "decoder"
  that exercises the *identical* Spark plumbing (schema, batch shape,
  partitioning) and is what the tests and oracle queries run.

The reference has no media handling at all; this module is part of
the training-data-pipeline extension surface (BASELINE.json
north_star: "multimodal columns").
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("content", BinaryType()),
        StructField("media", MEDIA_META),
    ]
)


def attach_media(docs: DataFrame, media_type: str = "application/octet-stream") -> DataFrame:
    """Promote a text table to the media layout: opaque binary content
    + typed metadata struct. In production the binary column comes
    straight from parquet; here it is derived (UTF-8 encode) so the
    whole media path is testable against the text tables."""
    return docs.select(
        "doc_id",
        "source",
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
        ).alias("media"),
    )


_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def media_stats(media_df: DataFrame) -> DataFrame:
    """Per-item byte stats via mapInPandas: length + md5 checksum.
    One Arrow batch in, one batch out — no per-row Python round trip."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "n_bytes": content.map(len).astype("int64"),
                    "checksum": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media_df.mapInPandas(kernel, _STATS_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(
    media_df: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame sampling for video-like payloads: split the byte stream
    into fixed ``frame_bytes`` frames, keep every ``stride``-th full
    frame, fingerprint each. The kernel EXPLODES rows (one item ->
    many frames) — mapInPandas output cardinality is free, which is
    why it, not a scalar pandas UDF, is the frame-sampling shape."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, stride):
                    ids.append(did)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(
                            b[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return media_df.mapInPandas(kernel, _FRAME_SCHEMA)


def decode_image(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image decode/resize — requires pillow, which this
    container does not ship. Import-gated so the API surface exists
    and fails loudly, not silently."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no pillow here
        raise NotImplementedError(
            "decode_image needs pillow (PIL) which is not installed; "
            "use fake_decode_image for plumbing tests"
        ) from exc
    raise NotImplementedError(
        "real decode path not implemented in this environment"
    )  # pragma: no cover


def decode_audio(media_df: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """Real audio decode — requires soundfile/librosa (absent)."""
    try:
        import soundfile  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no soundfile here
        raise NotImplementedError(
            "decode_audio needs soundfile which is not installed"
        ) from exc
    raise NotImplementedError(
        "real decode path not implemented in this environment"
    )  # pragma: no cover


_FAKE_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
    ]
)


def fake_decode_image(media_df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic stand-in decoder: pixel (r, c) = content byte at
    ``(r * width + c) mod n_bytes``. Exercises the exact decode
    plumbing — binary in, fixed-shape numeric array out, Arrow both
    ways — with zero codec dependencies."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_px = width * height
        for pdf in batches:
            pixels = []
            for content in pdf["content"]:
                b = bytes(content)
                if not b:
                    pixels.append([0] * n_px)
                else:
                    pixels.append([b[i % len(b)] for i in range(n_px)])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "pixels": pd.Series(pixels, dtype="object"),
                }
            )

    return media_df.mapInPandas(kernel, _FAKE_IMAGE_SCHEMA)
