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


def resize_pixels(
    decoded_df: DataFrame,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
) -> DataFrame:
    """Nearest-neighbor resize over a row-major ``pixels`` array —
    REAL resize arithmetic (the same math a codec-backed pipeline
    runs), independent of whether the pixels came from a real or fake
    decoder.

    Deliberately JVM-side (one higher-order ``transform`` over an
    index sequence, no Python): per-pixel index math is exactly the
    kind of work that must not pay an Arrow round trip per row at
    100 TB. Output replaces ``pixels``/``width``/``height``.
    """
    idx = F.sequence(F.lit(0), F.lit(dst_w * dst_h - 1))
    mapped = F.transform(
        idx,
        lambda i: F.element_at(
            F.col("pixels"),
            (
                ((i / dst_w).cast("int") * src_h / dst_h).cast("int")
                * F.lit(src_w)
                + ((i % dst_w) * src_w / dst_w).cast("int")
                + F.lit(1)  # element_at is 1-based
            ).cast("int"),
        ),
    )
    return decoded_df.withColumn("pixels", mapped).withColumn(
        "width", F.lit(dst_w)
    ).withColumn("height", F.lit(dst_h))


_IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("maxval", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
        StructField("decode_error", StringType()),
    ]
)


def _parse_pnm(b: bytes) -> tuple[int, int, int, int, bytes]:
    """Header + raster of a binary netpbm image — P6 (RGB) or P5
    (grayscale). Returns (channels, width, height, maxval, raster).
    Raises ValueError on anything malformed. Comments (#...) and
    arbitrary whitespace between header tokens are part of the
    netpbm spec.

    Header ints are validated as pure ASCII digits BEFORE int(): the
    Python parser would happily accept '-2' or '1_0', and a '-2 -2
    255' header yields a positive 3*w*h raster size — a bogus payload
    would "decode" with negative dimensions instead of erroring."""
    if b[:2] == b"P6":
        channels = 3
    elif b[:2] == b"P5":
        channels = 1
    else:
        raise ValueError("not a binary netpbm image (P5/P6 magic expected)")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated header")
        tok = b[start:pos]
        if not tok.isdigit():
            raise ValueError(f"non-numeric header token {tok[:20]!r}")
        fields.append(int(tok))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError(f"non-positive dimensions {w}x{h}")
    if not (0 < maxval < 256):
        raise ValueError(f"only 8-bit maxval supported, got {maxval}")
    need = channels * w * h
    raster = b[pos : pos + need]
    if len(raster) != need:
        raise ValueError(
            f"truncated raster: need {need} bytes, got {len(raster)}"
        )
    return channels, w, h, maxval, raster


def _parse_bmp(b: bytes) -> tuple[int, int, int, int, bytes]:
    """Header + raster of an uncompressed 24-bit BMP (BITMAPINFOHEADER
    or larger, BI_RGB). Returns the SAME contract as _parse_pnm —
    (channels=3, width, height, maxval=255, top-down row-major RGB
    bytes) — so the decode kernel is shared across formats.

    BMP quirks handled explicitly: little-endian signed dimensions
    (negative height = top-down row order), 4-byte row padding, and
    BGR byte order. Everything else (palettes, 1/4/8/16/32 bpp, RLE)
    raises — this is the no-codec-library subset, like P5/P6 for
    netpbm."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP (BM magic expected)")
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    off = int.from_bytes(b[10:14], "little")
    hdr_size = int.from_bytes(b[14:18], "little")
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    planes = int.from_bytes(b[26:28], "little")
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only uncompressed 24-bit BI_RGB supported, got bpp={bpp} "
            f"compression={comp}"
        )
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    bottom_up = h > 0
    height = abs(h)
    row_stride = (w * 3 + 3) // 4 * 4
    need = row_stride * height
    data = b[off : off + need]
    if len(data) != need:
        raise ValueError(f"truncated raster: need {need} bytes, got {len(data)}")
    import numpy as np

    rows = np.frombuffer(data, dtype=np.uint8).reshape(height, row_stride)[
        :, : w * 3
    ]
    if bottom_up:
        rows = rows[::-1]
    rgb = rows.reshape(height, w, 3)[:, :, ::-1]  # BGR -> RGB
    return 3, w, height, 255, np.ascontiguousarray(rgb).tobytes()


_IMAGE_PARSERS = {"ppm": _parse_pnm, "bmp": _parse_bmp}


def decode_image(
    media_df: DataFrame,
    fmt: str = "ppm",
    on_error: str = "raise",
    to_gray: bool = True,
) -> DataFrame:
    """REAL image decode for codec-library-free payloads — binary
    netpbm (``fmt="ppm"``: P6 RGB and P5 grayscale) and uncompressed
    24-bit BMP (``fmt="bmp"``: padding stripped, bottom-up rows
    flipped, BGR reordered) — pure header+raster parsing. Emits
    width, height, maxval and the pixel array: grayscale ints by
    default (``(r+g+b)//3``; P5 rasters are already single-channel),
    row-major and directly consumable by ``resize_pixels``;
    ``to_gray=False`` keeps interleaved RGB.

    Any other format needs pillow, which this container does not ship
    — import-gated so the API fails loudly naming the dependency.
    ``on_error`` follows decode_audio's contract: ``"raise"`` for
    curated inputs, ``"quarantine"`` to emit NULL metadata plus the
    error message instead (one rotten file must not kill a corpus
    job). Arrow-batched mapInPandas like every media kernel here.
    """
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error={on_error!r}: use 'raise' or 'quarantine'")
    if fmt not in _IMAGE_PARSERS:
        try:
            import PIL  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no pillow here
            raise NotImplementedError(
                f"decode_image({fmt!r}) needs pillow (PIL) which is not "
                "installed; binary PPM (P5/P6) and 24-bit BMP decode "
                "natively and fake_decode_image exercises the plumbing"
            ) from exc
        raise NotImplementedError(
            "non-PPM/BMP decode path not implemented in this environment"
        )  # pragma: no cover
    parse = _IMAGE_PARSERS[fmt]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in _IMAGE_SCHEMA.names}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    channels, w, h, maxval, raster = parse(bytes(content))
                except Exception as exc:
                    if on_error == "raise":
                        raise ValueError(
                            f"doc_id={did}: undecodable {fmt.upper()} "
                            f"payload: {exc}"
                        ) from exc
                    out["doc_id"].append(did)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["maxval"].append(None)
                    out["pixels"].append(None)
                    out["decode_error"].append(str(exc)[:500])
                    continue
                # Vectorized raster math (a 4k frame is ~25M bytes).
                rgb = np.frombuffer(raster, dtype=np.uint8)
                if channels == 3 and to_gray:
                    px = (
                        rgb.reshape(-1, 3).astype(np.int32).sum(axis=1) // 3
                    ).tolist()
                else:
                    # P6 interleaved RGB, or P5 already-gray raster.
                    px = rgb.astype(np.int32).tolist()
                out["doc_id"].append(did)
                out["width"].append(w)
                out["height"].append(h)
                out["maxval"].append(maxval)
                out["pixels"].append(px)
                out["decode_error"].append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "maxval": pd.Series(out["maxval"], dtype="Int32"),
                    "pixels": pd.Series(out["pixels"], dtype="object"),
                    "decode_error": pd.Series(out["decode_error"], dtype="object"),
                }
            )

    return media_df.mapInPandas(kernel, _IMAGE_SCHEMA)


_AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", LongType()),
        StructField("decode_error", StringType()),
    ]
)


def _parse_wav(b: bytes):
    """16-bit PCM WAV via stdlib ``wave``: (rate, channels, frames,
    samples). WAV PCM is little-endian by spec; the dtype pins it
    (array('h') would assume native order)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(b)) as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"only 16-bit PCM supported, got {8 * w.getsampwidth()}-bit"
            )
        rate = w.getframerate()
        channels = w.getnchannels()
        frames = w.getnframes()
        raw = w.readframes(frames)
        samples = np.frombuffer(raw, dtype="<i2")
        if len(samples) != frames * channels:
            raise ValueError(
                f"truncated data chunk: header declares "
                f"{frames * channels} samples, got {len(samples)}"
            )
    return rate, channels, frames, samples


def _parse_au(b: bytes):
    """16-bit linear-PCM Sun/NeXT AU (.snd): 24-byte BIG-endian
    header, big-endian samples — the explicit opposite of WAV's
    little-endian, which is exactly why the dtype is pinned per
    format. Same return contract as _parse_wav."""
    import numpy as np

    if b[:4] != b".snd":
        raise ValueError("not an AU payload (.snd magic expected)")
    if len(b) < 24:
        raise ValueError("truncated AU header")
    off = int.from_bytes(b[4:8], "big")
    size = int.from_bytes(b[8:12], "big")
    enc = int.from_bytes(b[12:16], "big")
    rate = int.from_bytes(b[16:20], "big")
    channels = int.from_bytes(b[20:24], "big")
    if off < 24:
        raise ValueError(f"bad data offset {off}")
    if enc != 3:
        raise ValueError(
            f"only 16-bit linear PCM (encoding 3) supported, got encoding {enc}"
        )
    if rate <= 0 or channels <= 0:
        raise ValueError(f"bad rate/channels {rate}/{channels}")
    unknown = 0xFFFFFFFF
    data = b[off:] if size == unknown else b[off : off + size]
    if size != unknown and len(data) != size:
        raise ValueError(
            f"truncated data: header declares {size} bytes, got {len(data)}"
        )
    if len(data) % (2 * channels):
        raise ValueError("data length is not a whole number of frames")
    samples = np.frombuffer(data, dtype=">i2")
    return rate, channels, len(samples) // channels, samples


_AUDIO_PARSERS = {"wav": _parse_wav, "au": _parse_au}


def decode_audio(
    media_df: DataFrame, fmt: str = "wav", on_error: str = "raise"
) -> DataFrame:
    """REAL audio decode for codec-library-free payloads — 16-bit PCM
    WAV (``fmt="wav"``, stdlib ``wave``, little-endian) and 16-bit
    linear-PCM Sun/NeXT AU (``fmt="au"``, big-endian header and
    samples): parses the container, reads the PCM frames, and emits
    per-item sample rate, channel count, sample count, duration and
    integer RMS amplitude — the metadata+feature pass an audio
    training pipeline runs first.

    Any other format raises NotImplementedError naming the codec
    dependency (soundfile), never silently.

    ``on_error`` decides what a malformed payload does:

    - ``"raise"`` (default): ValueError naming the failing doc_id —
      right for curated inputs where corruption means a pipeline bug.
    - ``"quarantine"``: the row is emitted with NULL metadata and the
      error message in ``decode_error``; clean rows carry NULL there.
      This is the 100 TB mode — one rotten file in a trillion must
      not kill the job, and ``filter(decode_error IS NOT NULL)`` is
      the explicit quarantine stream (the same contract as
      read_logs_json's corrupt-record column).

    Same execution shape as every media kernel here: Arrow-batched
    mapInPandas, binary crosses the boundary once per batch.
    """
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error={on_error!r}: use 'raise' or 'quarantine'")
    if fmt not in _AUDIO_PARSERS:
        try:
            import soundfile  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no soundfile here
            raise NotImplementedError(
                f"decode_audio({fmt!r}) needs soundfile which is not "
                "installed; 16-bit PCM WAV and AU decode natively"
            ) from exc
        raise NotImplementedError(
            "non-WAV/AU decode path not implemented in this environment"
        )  # pragma: no cover
    parse = _AUDIO_PARSERS[fmt]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in _AUDIO_SCHEMA.names}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    rate, channels, frames, samples = parse(bytes(content))
                except Exception as exc:
                    if on_error == "raise":
                        raise ValueError(
                            f"doc_id={did}: undecodable {fmt.upper()} "
                            f"payload: {exc}"
                        ) from exc
                    out["doc_id"].append(did)
                    out["sample_rate"].append(None)
                    out["n_channels"].append(None)
                    out["n_samples"].append(None)
                    out["duration_ms"].append(None)
                    out["rms"].append(None)
                    out["decode_error"].append(str(exc)[:500])
                    continue
                n = len(samples)
                # Vectorized sum of squares with exact int64
                # accumulation — a per-sample Python loop here would
                # be the row-at-a-time cost this kernel exists to
                # avoid (10 s of 44.1 kHz stereo is ~880k samples).
                sq = samples.astype(np.int64)
                rms = int(math.sqrt(int((sq * sq).sum()) / n)) if n else 0
                out["doc_id"].append(did)
                out["sample_rate"].append(rate)
                out["n_channels"].append(channels)
                out["n_samples"].append(n)
                out["duration_ms"].append(frames * 1000 // rate if rate else 0)
                out["rms"].append(rms)
                out["decode_error"].append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "n_channels": pd.Series(out["n_channels"], dtype="Int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="Int64"),
                    "duration_ms": pd.Series(out["duration_ms"], dtype="Int64"),
                    "rms": pd.Series(out["rms"], dtype="Int64"),
                    "decode_error": pd.Series(out["decode_error"], dtype="object"),
                }
            )

    return media_df.mapInPandas(kernel, _AUDIO_SCHEMA)


def _parse_avi(b: bytes):
    """Uncompressed-DIB AVI (RIFF 'AVI '): chunk walk for the main
    header (avih: timing, declared frame count, dimensions), the
    stream format (strf: a BITMAPINFOHEADER — the same DIB header BMP
    uses, validated 24-bit BI_RGB), and every '00db'/'00dc' frame
    chunk under the movi list. Returns (width, height, us_per_frame,
    frames) with each frame a raw bottom-up padded BGR raster.

    This is the codec-free corner of video: no inter-frame
    compression, every frame a full DIB — the video analogue of
    P6/BMP for images and PCM for audio. Anything else raises naming
    the dependency."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' magic expected)")

    def u32(buf: bytes, pos: int) -> int:
        return int.from_bytes(buf[pos : pos + 4], "little")

    avih: bytes | None = None
    strf: bytes | None = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal avih, strf
        pos = start
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            size = u32(b, pos + 4)
            data0 = pos + 8
            if data0 + size > len(b):
                raise ValueError(
                    f"chunk {cid!r} overruns the payload "
                    f"({data0 + size} > {len(b)})"
                )
            if cid == b"LIST":
                walk(data0 + 4, data0 + size)
            elif cid == b"avih":
                avih = b[data0 : data0 + size]
            elif cid == b"strf":
                strf = b[data0 : data0 + size]
            elif cid in (b"00db", b"00dc"):
                frames.append(b[data0 : data0 + size])
            pos = data0 + size + (size & 1)  # chunks are word-aligned

    walk(12, len(b))
    if avih is None or len(avih) < 40:
        raise ValueError("missing or short avih main header")
    if strf is None or len(strf) < 40:
        raise ValueError("missing or short strf stream format")
    us_per_frame = int.from_bytes(avih[0:4], "little")
    n_declared = int.from_bytes(avih[16:20], "little")
    w = int.from_bytes(avih[32:36], "little")
    h = int.from_bytes(avih[36:40], "little")
    bpp = int.from_bytes(strf[14:16], "little")
    comp = int.from_bytes(strf[16:20], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only uncompressed 24-bit DIB frames supported, got bpp={bpp} "
            f"compression={comp}"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    if n_declared != len(frames):
        raise ValueError(
            f"header declares {n_declared} frames, container holds "
            f"{len(frames)}"
        )
    stride = (w * 3 + 3) // 4 * 4
    for i, fr in enumerate(frames):
        if len(fr) != stride * h:
            raise ValueError(
                f"frame {i}: truncated raster (need {stride * h} bytes, "
                f"got {len(fr)})"
            )
    return w, h, us_per_frame, frames


_VIDEO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("us_per_frame", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("pixels", ArrayType(IntegerType())),
        StructField("decode_error", StringType()),
    ]
)


def decode_video(
    media_df: DataFrame,
    fmt: str = "avi",
    frame_stride: int = 1,
    on_error: str = "raise",
) -> DataFrame:
    """REAL video decode for uncompressed-DIB AVI payloads — RIFF
    walk + per-frame DIB raster math, no codec library. EXPLODES one
    row per SAMPLED frame (every ``frame_stride``-th), each carrying
    container metadata and the frame's grayscale pixels top-down
    row-major (same contract as decode_image, so frames compose with
    ``resize_pixels``). Grayscale is (r+g+b)//3 — channel order drops
    out of the mean, so the BGR raster needs no reorder.

    Compressed video (H.264/VP9/MJPEG...) needs pyav, absent here —
    import-gated, loud. ``on_error="quarantine"`` emits one NULL row
    per undecodable payload with the message in ``decode_error``.
    Arrow-batched mapInPandas; at 100 TB the binary crosses the
    boundary once per batch, and frame_stride is the cost dial (a
    1 fps sample of 30 fps footage decodes 1/30th of the rasters —
    only sampled frames pay the numpy conversion)."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error={on_error!r}: use 'raise' or 'quarantine'")
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    if fmt != "avi":
        try:
            import av  # noqa: F401
        except ImportError as exc:  # pragma: no cover - no pyav here
            raise NotImplementedError(
                f"decode_video({fmt!r}) needs pyav which is not installed; "
                "uncompressed-DIB AVI decodes natively"
            ) from exc
        raise NotImplementedError(
            "non-AVI decode path not implemented in this environment"
        )  # pragma: no cover

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in _VIDEO_SCHEMA.names}

            def emit(did, w=None, h=None, n=None, us=None, idx=None,
                     px=None, err=None):
                out["doc_id"].append(did)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(n)
                out["us_per_frame"].append(us)
                out["frame_idx"].append(idx)
                out["pixels"].append(px)
                out["decode_error"].append(err)

            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, us, frames = _parse_avi(bytes(content))
                except Exception as exc:
                    if on_error == "raise":
                        raise ValueError(
                            f"doc_id={did}: undecodable AVI payload: {exc}"
                        ) from exc
                    emit(did, err=str(exc)[:500])
                    continue
                stride = (w * 3 + 3) // 4 * 4
                for i in range(0, len(frames), frame_stride):
                    rows = np.frombuffer(frames[i], dtype=np.uint8).reshape(
                        h, stride
                    )[:, : w * 3]
                    gray = (
                        rows[::-1]  # DIB rasters are bottom-up
                        .reshape(h, w, 3)
                        .astype(np.int32)
                        .sum(axis=2)
                        // 3
                    )
                    emit(did, w, h, len(frames), us, i, gray.ravel().tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "width": pd.Series(out["width"], dtype="Int32"),
                    "height": pd.Series(out["height"], dtype="Int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="Int32"),
                    "us_per_frame": pd.Series(out["us_per_frame"], dtype="Int32"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="Int32"),
                    "pixels": pd.Series(out["pixels"], dtype="object"),
                    "decode_error": pd.Series(out["decode_error"], dtype="object"),
                }
            )

    return media_df.mapInPandas(kernel, _VIDEO_SCHEMA)


_ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", LongType()),
        StructField("decode_error", StringType()),
    ]
)


def audio_frame_energy(
    media_df: DataFrame,
    fmt: str = "wav",
    frame_ms: int = 100,
    on_error: str = "raise",
) -> DataFrame:
    """Per-frame energy (integer RMS over ``frame_ms`` windows) for
    decodable audio — the feature-extraction pass after decode:
    silence detection, segmentation, loudness normalization all start
    from exactly this table. One exploded row per full frame
    (trailing partial frames are dropped, like sample_frames);
    channels stay interleaved inside a frame, so a frame's RMS is
    over ``channels * rate * frame_ms / 1000`` samples.

    Same kernel contract as the decoders: Arrow-batched mapInPandas,
    vectorized numpy per frame (reshape + one int64 reduction — never
    a per-sample Python loop), raise/quarantine error handling."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error={on_error!r}: use 'raise' or 'quarantine'")
    if frame_ms < 1:
        raise ValueError(f"frame_ms must be >= 1, got {frame_ms}")
    if fmt not in _AUDIO_PARSERS:
        raise NotImplementedError(
            f"audio_frame_energy({fmt!r}): only the native decoders "
            f"{sorted(_AUDIO_PARSERS)} are supported here"
        )
    parse = _AUDIO_PARSERS[fmt]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in _ENERGY_SCHEMA.names}
            for did, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    rate, channels, frames, samples = parse(bytes(content))
                    spf = channels * max(1, rate * frame_ms // 1000)
                    n_full = len(samples) // spf
                except Exception as exc:
                    if on_error == "raise":
                        raise ValueError(
                            f"doc_id={did}: undecodable {fmt.upper()} "
                            f"payload: {exc}"
                        ) from exc
                    out["doc_id"].append(did)
                    out["frame_idx"].append(None)
                    out["n_samples"].append(None)
                    out["rms"].append(None)
                    out["decode_error"].append(str(exc)[:500])
                    continue
                if n_full:
                    m = (
                        samples[: n_full * spf]
                        .astype(np.int64)
                        .reshape(n_full, spf)
                    )
                    rms = np.sqrt((m * m).sum(axis=1) / spf).astype(np.int64)
                    for i in range(n_full):
                        out["doc_id"].append(did)
                        out["frame_idx"].append(i)
                        out["n_samples"].append(spf)
                        out["rms"].append(int(rms[i]))
                        out["decode_error"].append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="Int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
                    "rms": pd.Series(out["rms"], dtype="Int64"),
                    "decode_error": pd.Series(out["decode_error"], dtype="object"),
                }
            )

    return media_df.mapInPandas(kernel, _ENERGY_SCHEMA)


def dhash64(pixels_col: str = "pixels", grid_w: int = 9, grid_h: int = 8) -> "F.Column":
    """64-bit difference hash (dHash) over a ``grid_w x grid_h``
    row-major grayscale pixel array — the standard perceptual image
    fingerprint: bit (r, c) is set iff pixel (r, c) > pixel (r, c+1),
    so the hash captures gradient structure and survives brightness
    shifts, re-encoding and small noise. Feed it the output of
    ``decode_image(...) |> resize_pixels(..., 9, 8)``.

    Built as ONE SQL expression (64 comparison-shift terms, pure JVM
    integer ops, whole-stage codegen) — per-pixel Python here would
    be the row-at-a-time tax this module exists to avoid. Near-dup
    images then reduce to ``hamming64(a, b) <= k`` — integer
    operations on one BIGINT per image instead of pixel arrays."""
    if grid_w < 2 or grid_h < 1 or (grid_w - 1) * grid_h > 64:
        raise ValueError(
            f"dhash grid {grid_w}x{grid_h} must fit 64 bits of (w-1)*h"
        )
    terms = []
    for r in range(grid_h):
        for c in range(grid_w - 1):
            left = r * grid_w + c + 1  # element_at is 1-based
            bit = r * (grid_w - 1) + c
            terms.append(
                f"shiftleft(CAST(element_at({pixels_col}, {left}) > "
                f"element_at({pixels_col}, {left + 1}) AS BIGINT), {bit})"
            )
    return F.expr(" + ".join(terms))


def hamming64(a, b) -> "F.Column":
    """Bit distance between two 64-bit fingerprints (dhash64): the
    image-similarity metric — JVM xor + popcount."""
    return F.bit_count(
        (F.col(a) if isinstance(a, str) else a).bitwiseXOR(
            F.col(b) if isinstance(b, str) else b
        )
    )


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
