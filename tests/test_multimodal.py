"""Multimodal plumbing: binary columns, Arrow batch kernels, stubs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from big_data_spark.io.readers import read_table
from big_data_spark.multimodal import (
    MEDIA_SCHEMA,
    attach_media,
    decode_audio,
    decode_image,
    fake_decode_image,
    media_stats,
    sample_frames,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return attach_media(read_table(spark, SF_SMOKE, "documents"))


def test_media_schema(media):
    # Names + types must match the declared layout (nullability differs
    # where literals make fields non-nullable).
    assert [(f.name, f.dataType.simpleString()) for f in media.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in MEDIA_SCHEMA.fields
    ]
    row = media.filter(F.col("doc_id") == 0).first()
    assert isinstance(row.content, (bytes, bytearray))
    assert row.media.n_bytes == len(row.content)


def test_media_stats_checksum(media, spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    expected = {
        r.doc_id: hashlib.md5(r.text.encode()).hexdigest()
        for r in docs.limit(5).collect()
    }
    got = {
        r.doc_id: r.checksum
        for r in media_stats(media).filter(
            F.col("doc_id").isin(*expected)
        ).collect()
    }
    assert got == expected


def test_sample_frames_manual(media, spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    doc = docs.filter(F.length("text") >= 64 * 5).first()
    b = doc.text.encode()
    n_frames = len(b) // 64
    expected = [
        (i, hashlib.md5(b[i * 64 : (i + 1) * 64]).hexdigest())
        for i in range(0, n_frames, 4)
    ]
    got = [
        (r.frame_idx, r.frame_md5)
        for r in sample_frames(media)
        .filter(F.col("doc_id") == doc.doc_id)
        .orderBy("frame_idx")
        .collect()
    ]
    assert got == expected


def test_sample_frames_short_payload_yields_none(spark):
    tiny = spark.createDataFrame(
        [(99, "s", b"short", ("t", 5))], schema=MEDIA_SCHEMA
    )
    assert sample_frames(tiny, frame_bytes=64).count() == 0


def test_fake_decode_image_shape_and_determinism(media):
    out = fake_decode_image(media.limit(10), width=4, height=3)
    rows = out.collect()
    assert len(rows) == 10
    for r in rows:
        assert (r.width, r.height) == (4, 3)
        assert len(r.pixels) == 12
        assert all(0 <= p <= 255 for p in r.pixels)
    again = {r.doc_id: r.pixels for r in fake_decode_image(media.limit(10), 4, 3).collect()}
    assert {r.doc_id: r.pixels for r in rows} == again


def test_fake_decode_pixel_values(media):
    item = media.filter(F.col("doc_id") == 0).first()
    b = bytes(item.content)
    row = fake_decode_image(media.filter(F.col("doc_id") == 0), 8, 8).first()
    assert row.pixels == [b[i % len(b)] for i in range(64)]


def test_real_decoders_fail_loudly(media):
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_image(media, fmt="png")
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio(media, fmt="flac")


def _ppm_bytes(w: int, h: int, rgb: list[tuple[int, int, int]]) -> bytes:
    header = f"P6\n# test fixture\n{w} {h}\n255\n".encode()
    return header + b"".join(bytes(t) for t in rgb)


def test_decode_image_real_ppm(spark):
    """The REAL image path: binary PPM parses exactly — header,
    comments, grayscale math — and composes with resize_pixels."""
    from big_data_spark.multimodal import resize_pixels

    rgb = [(r * 10, r * 10 + 1, r * 10 + 2) for r in range(16)]  # 4x4
    media = spark.createDataFrame(
        [(1, "ppm", _ppm_bytes(4, 4, rgb), {"media_type": "image/x-portable-pixmap"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    row = decode_image(media).first()
    assert (row.width, row.height, row.maxval) == (4, 4, 255)
    assert row.pixels == [sum(t) // 3 for t in rgb]
    assert row.decode_error is None
    # RGB mode keeps the interleaved raster.
    raw = decode_image(media, to_gray=False).first()
    assert raw.pixels == [c for t in rgb for c in t]
    # Compose with the JVM resize: 4x4 -> 2x2 nearest-neighbor.
    small = resize_pixels(decode_image(media), 4, 4, 2, 2).first()
    gray = [sum(t) // 3 for t in rgb]
    assert small.pixels == [gray[0], gray[2], gray[8], gray[10]]


def _pgm_bytes(w: int, h: int, gray: list[int]) -> bytes:
    header = f"P5\n# gray fixture\n{w} {h}\n255\n".encode()
    return header + bytes(gray)


def test_decode_image_p5_grayscale(spark):
    """P5 (grayscale netpbm): the raster is already single-channel —
    decode passes it through in both gray and raw modes, and the
    result composes with the JVM resize exactly like P6."""
    from big_data_spark.multimodal import resize_pixels

    gray = list(range(0, 160, 10))  # 4x4
    media = spark.createDataFrame(
        [(7, "pgm", _pgm_bytes(4, 4, gray), {"media_type": "image/x-portable-graymap"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    row = decode_image(media).first()
    assert (row.width, row.height, row.maxval) == (4, 4, 255)
    assert row.pixels == gray
    assert row.decode_error is None
    assert decode_image(media, to_gray=False).first().pixels == gray
    small = resize_pixels(decode_image(media), 4, 4, 2, 2).first()
    assert small.pixels == [gray[0], gray[2], gray[8], gray[10]]


def test_decode_image_rejects_bogus_headers(spark):
    """Signed/underscored header ints are NOT tolerated: '-2 -2 255'
    yields a positive 3*w*h raster size, so without validation a bogus
    payload would 'decode' with negative dimensions and quarantine
    mode would mark it clean."""
    evil = b"P6\n-2 -2\n255\n" + bytes(12)
    sneaky = b"P6\n1_0 1\n255\n" + bytes(30)
    media = spark.createDataFrame(
        [(1, "evil", evil, None), (2, "sneaky", sneaky, None)],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    rows = {r.doc_id: r for r in decode_image(media, on_error="quarantine").collect()}
    assert rows[1].pixels is None and "non-numeric" in rows[1].decode_error
    assert rows[2].pixels is None and "non-numeric" in rows[2].decode_error


def test_decode_image_quarantine_and_raise(spark):
    media = spark.createDataFrame(
        [
            (1, "ok", _ppm_bytes(2, 1, [(10, 20, 30), (40, 50, 60)]), None),
            (2, "bad", b"P6 not really", None),
        ],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    rows = {r.doc_id: r for r in decode_image(media, on_error="quarantine").collect()}
    assert rows[1].decode_error is None and rows[1].pixels == [20, 50]
    assert rows[2].pixels is None and rows[2].decode_error
    with pytest.raises(Exception, match="undecodable PPM|Python worker"):
        decode_image(media).collect()


def test_resize_pixels_nearest_neighbor(media, spark):
    """JVM-side resize matches the reference nearest-neighbor math,
    and the plan contains no Python eval node."""
    from big_data_spark.multimodal import fake_decode_image, resize_pixels

    decoded = fake_decode_image(media.filter(F.col("doc_id") < 3), 8, 8)
    resized = resize_pixels(decoded, 8, 8, 4, 4)
    plan = resized._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    src = {r.doc_id: r.pixels for r in decoded.collect()}
    got = {r.doc_id: r for r in resized.collect()}
    for did, px in src.items():
        want = [
            px[(r * 8 // 4) * 8 + (c * 8 // 4)]
            for r in range(4)
            for c in range(4)
        ]
        assert got[did].pixels == want
        assert (got[did].width, got[did].height) == (4, 4)
    # Upscale round-trips every source pixel into a 2x2 block.
    up = {r.doc_id: r.pixels for r in resize_pixels(decoded, 8, 8, 16, 16).collect()}
    for did, px in src.items():
        assert up[did][:4] == [px[0], px[0], px[1], px[1]]


def _wav_bytes(rate: int, channels: int, samples: list[int]) -> bytes:
    import io
    import wave
    from array import array

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(array("h", samples).tobytes())
    return buf.getvalue()


def test_decode_audio_real_wav(spark):
    """The REAL decoder path: stdlib-wave PCM16 payloads round-trip
    through the Spark kernel with exact container metadata and RMS."""
    import math

    fixtures = {
        # doc_id: (rate, channels, samples)
        1: (16_000, 1, [0, 1000, -1000, 2000] * 100),
        2: (8_000, 2, [300, -300] * 50),  # stereo: 50 frames
        3: (44_100, 1, []),  # empty payload: zero samples, rms 0
    }
    rows = [
        (did, "wav", _wav_bytes(*spec), {"media_type": "audio/wav"})
        for did, spec in fixtures.items()
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, source string, content binary, media map<string,string>"
    )
    got = {r.doc_id: r for r in decode_audio(media).collect()}
    assert set(got) == set(fixtures)
    for did, (rate, channels, samples) in fixtures.items():
        r = got[did]
        assert r.sample_rate == rate
        assert r.n_channels == channels
        assert r.n_samples == len(samples)
        n_frames = len(samples) // channels
        assert r.duration_ms == (n_frames * 1000 // rate)
        want_rms = (
            int(math.sqrt(sum(s * s for s in samples) / len(samples)))
            if samples
            else 0
        )
        assert r.rms == want_rms


def test_decode_audio_rejects_truncated_payload(spark):
    """A header/data mismatch (declared frames > decoded) raises
    rather than emitting inconsistent metadata."""
    whole = _wav_bytes(16_000, 1, [100, -100] * 50)
    truncated = whole[:-40]  # chop 20 samples off the data chunk
    media = spark.createDataFrame(
        [(7, "trunc", truncated, {"media_type": "audio/wav"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    with pytest.raises(Exception, match="truncated|undecodable"):
        decode_audio(media).collect()


def test_hll_ignores_null_items(spark):
    """NULL items must not register as a phantom distinct value."""
    from big_data_spark.operators.hll import hll_estimate, hll_registers

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", None), ("b", None)],
        "k string, item string",
    )
    regs = hll_registers(df, ["k"], "item")
    est = {r.k: r.approx_distinct for r in hll_estimate(regs, ["k"]).collect()}
    assert est.get("a") == 2
    assert "b" not in est  # all-NULL key: no registers at all


def test_decode_audio_quarantine_mode(spark):
    """on_error='quarantine': bad payloads become NULL-metadata rows
    with the error message; clean rows decode normally — no exception,
    no dropped rows (the 100 TB contract)."""
    good = _wav_bytes(16_000, 1, [100, -100] * 10)
    media = spark.createDataFrame(
        [
            (1, "ok", good, {"media_type": "audio/wav"}),
            (2, "bad", b"garbage bytes", {"media_type": "audio/wav"}),
        ],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    rows = {r.doc_id: r for r in decode_audio(media, on_error="quarantine").collect()}
    assert set(rows) == {1, 2}
    assert rows[1].decode_error is None and rows[1].sample_rate == 16_000
    assert rows[2].sample_rate is None and rows[2].decode_error
    # The quarantine stream is an explicit filter.
    bad = decode_audio(media, on_error="quarantine").filter(
        F.col("decode_error").isNotNull()
    )
    assert [r.doc_id for r in bad.collect()] == [2]


def test_decode_audio_rejects_garbage(spark):
    media = spark.createDataFrame(
        [(9, "junk", b"not a wav at all", {"media_type": "audio/wav"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    with pytest.raises(Exception, match="undecodable WAV|PySparkRuntimeError|Python worker"):
        decode_audio(media).collect()


def _bmp_bytes(w: int, h: int, rgb_rows: list[list[tuple[int, int, int]]],
               top_down: bool = False) -> bytes:
    """Minimal uncompressed 24-bit BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER, rows padded to 4 bytes, stored bottom-up unless
    top_down (negative height)."""
    stride = (w * 3 + 3) // 4 * 4
    raster = b""
    rows = rgb_rows if top_down else rgb_rows[::-1]
    for row in rows:
        line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    off = 14 + 40
    height = -h if top_down else h
    header = (
        b"BM"
        + (off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + raster


def test_decode_image_real_bmp(spark):
    """The REAL BMP path: padding stripped, bottom-up rows flipped,
    BGR reordered — same output contract as PPM, composes with
    resize_pixels."""
    from big_data_spark.multimodal import resize_pixels

    # 3x2, distinct rows so the vertical flip is observable; w=3
    # forces a 9->12 byte stride (3 padding bytes per row).
    top = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
    bot = [(110, 120, 130), (140, 150, 160), (170, 180, 190)]
    media = spark.createDataFrame(
        [(1, "bmp", _bmp_bytes(3, 2, [top, bot]), {"media_type": "image/bmp"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    row = decode_image(media, fmt="bmp").first()
    assert (row.width, row.height, row.maxval) == (3, 2, 255)
    gray = [sum(t) // 3 for t in top + bot]  # top-down row-major
    assert row.pixels == gray
    raw = decode_image(media, fmt="bmp", to_gray=False).first()
    assert raw.pixels == [c for t in top + bot for c in t]
    # A top-down (negative height) BMP decodes identically.
    media_td = spark.createDataFrame(
        [(1, "bmp", _bmp_bytes(3, 2, [top, bot], top_down=True),
          {"media_type": "image/bmp"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    assert decode_image(media_td, fmt="bmp").first().pixels == gray
    # Compose with the JVM resize: 3x2 -> 1x1 picks the top-left.
    small = resize_pixels(decode_image(media, fmt="bmp"), 3, 2, 1, 1).first()
    assert small.pixels == [gray[0]]


def test_decode_image_bmp_rejects_and_quarantines(spark):
    """Unsupported bpp and truncated rasters raise by default and
    quarantine on request — same contract as the PPM/WAV decoders."""
    import pytest as _pytest

    good = _bmp_bytes(3, 2, [[(1, 2, 3)] * 3, [(4, 5, 6)] * 3])
    bad_bpp = bytearray(good)
    bad_bpp[28:30] = (8).to_bytes(2, "little")  # 8-bit palette BMP
    truncated = good[:-4]
    media = spark.createDataFrame(
        [
            (1, "bmp", bytes(bad_bpp), {}),
            (2, "bmp", truncated, {}),
            (3, "bmp", good, {}),
        ],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    with _pytest.raises(Exception, match="BMP|24-bit|truncated"):
        decode_image(media, fmt="bmp").collect()
    rows = {r.doc_id: r for r in decode_image(media, fmt="bmp", on_error="quarantine").collect()}
    assert rows[1].decode_error and "24-bit" in rows[1].decode_error
    assert rows[2].decode_error and "truncated" in rows[2].decode_error
    assert rows[3].decode_error is None and rows[3].width == 3


def _au_bytes(rate: int, channels: int, samples: list[int]) -> bytes:
    import struct

    data = b"".join(struct.pack(">h", s) for s in samples)
    return (
        b".snd"
        + (24).to_bytes(4, "big")
        + len(data).to_bytes(4, "big")
        + (3).to_bytes(4, "big")
        + rate.to_bytes(4, "big")
        + channels.to_bytes(4, "big")
        + data
    )


def test_decode_audio_real_au(spark):
    """The AU path: big-endian header AND samples (the opposite of
    WAV), same output contract — identical samples give identical
    RMS through either container."""
    import math

    samples = [0, 1000, -1000, 20000, -20000, 258, 0, 500]
    media = spark.createDataFrame(
        [(1, "au", _au_bytes(8000, 2, samples), {"media_type": "audio/basic"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    row = decode_audio(media, fmt="au").first()
    assert (row.sample_rate, row.n_channels, row.n_samples) == (8000, 2, 8)
    assert row.duration_ms == 4 * 1000 // 8000
    assert row.rms == int(math.sqrt(sum(s * s for s in samples) / len(samples)))
    assert row.decode_error is None
    # Endianness pinned: 0x0102 stored big-endian must read as 258,
    # not 513.
    one = decode_audio(
        spark.createDataFrame(
            [(2, "au", _au_bytes(8000, 1, [258]), {})],
            "doc_id long, source string, content binary, media map<string,string>",
        ),
        fmt="au",
    ).first()
    assert one.rms == 258


def test_decode_audio_au_rejects_and_quarantines(spark):
    import pytest as _pytest

    good = _au_bytes(8000, 1, [1, 2, 3, 4])
    mulaw = bytearray(good)
    mulaw[12:16] = (1).to_bytes(4, "big")  # 8-bit mu-law
    truncated = good[:-3]
    media = spark.createDataFrame(
        [(1, "au", bytes(mulaw), {}), (2, "au", truncated, {}), (3, "au", good, {})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    with _pytest.raises(Exception, match="AU|encoding|truncated"):
        decode_audio(media, fmt="au").collect()
    rows = {
        r.doc_id: r
        for r in decode_audio(media, fmt="au", on_error="quarantine").collect()
    }
    assert rows[1].decode_error and "encoding 1" in rows[1].decode_error
    assert rows[2].decode_error and "truncated" in rows[2].decode_error
    assert rows[3].decode_error is None and rows[3].n_samples == 4


def _riff_chunk(cid: bytes, data: bytes) -> bytes:
    return cid + len(data).to_bytes(4, "little") + data + (b"\x00" if len(data) & 1 else b"")


def _avi_bytes(w: int, h: int, us_per_frame: int,
               frames: list[list[list[tuple[int, int, int]]]],
               n_frames_override: int | None = None,
               compression: int = 0) -> bytes:
    """Minimal uncompressed-DIB AVI: RIFF('AVI ' LIST(hdrl avih
    LIST(strl strh strf)) LIST(movi 00db*))."""
    stride = (w * 3 + 3) // 4 * 4
    rasters = []
    for fr in frames:
        raster = b""
        for row in fr[::-1]:  # DIB stores bottom-up
            line = b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
            raster += line + b"\x00" * (stride - len(line))
        rasters.append(raster)
    n = len(frames) if n_frames_override is None else n_frames_override
    avih = (
        us_per_frame.to_bytes(4, "little") + b"\x00" * 12
        + n.to_bytes(4, "little") + b"\x00" * 12
        + w.to_bytes(4, "little") + h.to_bytes(4, "little") + b"\x00" * 16
    )
    strh = b"vids" + b"DIB " + b"\x00" * 48
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + compression.to_bytes(4, "little") + b"\x00" * 20
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih)
                       + _riff_chunk(b"LIST", b"strl" + _riff_chunk(b"strh", strh)
                                     + _riff_chunk(b"strf", strf)))
    movi = _riff_chunk(b"LIST", b"movi" + b"".join(_riff_chunk(b"00db", r) for r in rasters))
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + len(payload).to_bytes(4, "little") + payload


def _vid_media(spark, payload, doc_id=1):
    return spark.createDataFrame(
        [(doc_id, "avi", payload, {"media_type": "video/x-msvideo"})],
        "doc_id long, source string, content binary, media map<string,string>",
    )


def test_decode_video_real_avi(spark):
    """The REAL video path: RIFF walk, per-frame DIB flip, frame
    sampling — and frames compose with resize_pixels."""
    from big_data_spark.multimodal import decode_video, resize_pixels

    def frame(base):
        # 3x2 with distinct rows so the bottom-up flip is observable
        return [[(base + c, base + c, base + c) for c in range(3)],
                [(base + 10 + c,) * 3 for c in range(3)]]

    frames = [frame(0), frame(40), frame(80)]
    media = _vid_media(spark, _avi_bytes(3, 2, 33333, frames))
    rows = decode_video(media).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for r, base in zip(rows, (0, 40, 80)):
        assert (r.width, r.height, r.n_frames, r.us_per_frame) == (3, 2, 3, 33333)
        assert r.pixels == [base, base + 1, base + 2,
                            base + 10, base + 11, base + 12]
        assert r.decode_error is None
    # Stride sampling: every 2nd frame only.
    sampled = decode_video(media, frame_stride=2).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in sampled] == [0, 2]
    # Compose a frame with the JVM resize: 3x2 -> 1x2 keeps column 0.
    small = decode_video(media, frame_stride=3)
    out = resize_pixels(small, 3, 2, 1, 2).first()
    assert out.pixels == [0, 10]


def test_decode_video_rejects_and_quarantines(spark):
    from big_data_spark.multimodal import decode_video

    frames = [[[(1, 2, 3)] * 3, [(4, 5, 6)] * 3]]
    good = _avi_bytes(3, 2, 1000, frames)
    wrong_count = _avi_bytes(3, 2, 1000, frames, n_frames_override=5)
    compressed = _avi_bytes(3, 2, 1000, frames, compression=1)
    for bad, msg in ((wrong_count, "declares 5 frames"),
                     (compressed, "24-bit DIB"),
                     (b"RIFF\x04\x00\x00\x00AVI ", "avih")):
        import pytest as _pytest
        with _pytest.raises(Exception, match="AVI"):
            decode_video(_vid_media(spark, bad)).collect()
        row = decode_video(
            _vid_media(spark, bad), on_error="quarantine"
        ).first()
        assert row.decode_error and msg in row.decode_error, (msg, row.decode_error)
        assert row.pixels is None and row.width is None
    assert decode_video(_vid_media(spark, good)).first().decode_error is None


def test_audio_frame_energy_exact_values(spark):
    """Constant-amplitude halves give exactly-known per-frame RMS,
    and trailing partial frames drop."""
    from big_data_spark.multimodal import audio_frame_energy

    rate = 1000  # 100 ms frame = 100 samples
    samples = [1000] * 250 + [-2000] * 100  # 3 full frames + 50 left
    media = spark.createDataFrame(
        [(1, "wav", _wav_bytes(rate, 1, samples), {})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    rows = {r.frame_idx: r for r in audio_frame_energy(media, frame_ms=100).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[0].rms == 1000 and rows[1].rms == 1000
    # frame 2: 50 samples at 1000, 50 at 2000 -> sqrt((50*1e6+50*4e6)/100)
    import math

    assert rows[2].rms == int(math.sqrt((50 * 1000**2 + 50 * 2000**2) / 100))
    assert all(r.n_samples == 100 for r in rows.values())


def test_audio_frame_energy_au_and_quarantine(spark):
    from big_data_spark.multimodal import audio_frame_energy

    good = _au_bytes(1000, 1, [500] * 200)
    media = spark.createDataFrame(
        [(1, "au", good, {}), (2, "au", b".snd junk", {})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    rows = audio_frame_energy(media, fmt="au", frame_ms=100, on_error="quarantine").collect()
    ok = [r for r in rows if r.decode_error is None]
    bad = [r for r in rows if r.decode_error is not None]
    assert len(ok) == 2 and all(r.rms == 500 for r in ok)
    assert len(bad) == 1 and bad[0].doc_id == 2


def test_dhash_stability_and_discrimination(spark):
    """dHash: identical images match, a brightness shift matches
    (gradients unchanged), a different image is far in Hamming
    distance — computed via decode -> resize -> one JVM expression."""
    from big_data_spark.multimodal import decode_image, dhash64, hamming64, resize_pixels

    def img(fn):
        rgb = [fn(r, c) for r in range(8) for c in range(9)]
        return _ppm_bytes(9, 8, [(v, v, v) for v in rgb])

    base = img(lambda r, c: (r * 9 + c) * 2)           # smooth gradient
    brighter = img(lambda r, c: (r * 9 + c) * 2 + 40)  # same gradients
    other = img(lambda r, c: 255 if (r + c) % 2 else 0)  # checkerboard
    media = spark.createDataFrame(
        [(1, "ppm", base, {}), (2, "ppm", brighter, {}), (3, "ppm", other, {})],
        "doc_id long, source string, content binary, media map<string,string>",
    )
    decoded = resize_pixels(decode_image(media), 9, 8, 9, 8)
    hashed = decoded.select("doc_id", dhash64().alias("h"))
    a = hashed.alias("a")
    b = hashed.alias("b")
    import pyspark.sql.functions as F

    dists = {
        (r["a_id"], r["b_id"]): r.d
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            hamming64(F.col("a.h"), F.col("b.h")).alias("d"),
        )
        .collect()
    }
    assert dists[(1, 2)] == 0          # brightness shift: identical hash
    assert dists[(1, 3)] > 16          # different structure: far away
