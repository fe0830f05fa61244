"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic fakes,
NotImplementedError gates for real codecs."""

import pytest
from pyspark.sql import functions as F

from debezium_server_batch_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_images,
    make_feature_extract_udf,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30).cache()


def test_synth_media_schema_and_determinism(spark, media):
    again = synth_media(spark, n=30)
    assert sorted(map(tuple, media.collect())) == sorted(map(tuple, again.collect()))
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds <= {"image", "audio", "video"} and len(kinds) == 3


def test_decode_images_shapes(media):
    out = decode_images(media)
    rows = out.collect()
    assert len(rows) == 30
    for r in rows:
        assert 0.0 <= r["mean_intensity"] <= 255.0
        assert r["width"] >= 4 and r["height"] >= 4
    # deterministic
    assert sorted(map(tuple, rows)) == sorted(map(tuple, decode_images(media).collect()))


def test_real_decode_is_gated(media):
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        decode_images(media, real_decode=True).collect()


def test_feature_extract_udf(media):
    extract = make_feature_extract_udf(dim=8)
    rows = media.select("media_id", extract(F.col("payload")).alias("feat")).collect()
    assert all(len(r["feat"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feat"])


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=1000)
    per_vid = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()}
    durations = {r["media_id"]: r["meta"]["duration_ms"] for r in media.filter(F.col("kind") == "video").collect()}
    assert per_vid and set(per_vid) == set(durations)
    for mid, n in per_vid.items():
        assert n == durations[mid] // 1000


def _bmp_24(width, height, bgr_rows):
    """Minimal uncompressed 24-bit BMP (bottom-up) from a row-major list
    of (b, g, r) pixel tuples."""
    import struct

    row_bytes = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (row_bytes - width * 3)
    body = b"".join(
        b"".join(bytes(px) for px in bgr_rows[y]) + pad for y in range(height - 1, -1, -1)
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + body


def test_decode_images_real_bmp_and_ppm(spark):
    """BMP/PPM payloads are REALLY decoded (header parsing + numpy, no
    codec library): dimensions come from the file, means are exact."""
    bmp = _bmp_24(2, 2, [[(0, 0, 0), (255, 255, 255)], [(10, 20, 30), (40, 50, 60)]])
    ppm = b"P6\n# comment\n3 1\n255\n" + bytes([0, 0, 0, 90, 90, 90, 255, 255, 255])
    df = spark.createDataFrame(
        [(1, "image", bmp, (99, 99, None, "bmp")), (2, "image", ppm, (99, 99, None, "ppm"))],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in decode_images(df, real_decode=True).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (2, 2)  # from the file, not meta
    assert rows[1]["mean_intensity"] == pytest.approx((0 + 255 * 3 + 10 + 20 + 30 + 40 + 50 + 60) / 12)
    assert (rows[2]["width"], rows[2]["height"]) == (3, 1)
    assert rows[2]["mean_intensity"] == pytest.approx((0 * 3 + 90 * 3 + 255 * 3) / 9)


def test_audio_features_real_wav(spark):
    """RIFF/WAV payloads are REALLY decoded via the stdlib wave module:
    rate/channels/duration/RMS are exact; non-WAV falls back to the
    deterministic fake (or raises under real_decode)."""
    import io
    import math
    import struct
    import wave

    from debezium_server_batch_spark.operators.multimodal import audio_features

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(struct.pack("<4h", 1000, -1000, 1000, -1000))
    wav = buf.getvalue()
    df = spark.createDataFrame(
        [(1, "audio", wav, (None, None, None, "wav")), (2, "audio", b"not-audio", (None, None, None, "?"))],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in audio_features(df).collect()}
    assert rows[1]["sample_rate"] == 8000 and rows[1]["n_channels"] == 1
    assert rows[1]["n_samples"] == 4 and rows[1]["duration_ms"] == pytest.approx(0.5)
    assert rows[1]["rms"] == pytest.approx(1000.0)
    assert rows[2]["sample_rate"] == 16000  # deterministic fake path
    assert math.isfinite(rows[2]["rms"])
    with pytest.raises(Exception, match="NotImplementedError|not installed"):
        audio_features(df, real_decode=True).collect()


def test_non_strict_decode_never_fails_on_malformed_payloads(spark):
    """Regression (r3 review): payloads that merely SNIFF like BMP/PPM/
    WAV (or are truncated/unsupported variants) must fall back to the
    deterministic fake in non-strict mode — one bad row must not kill
    the Spark task."""
    from debezium_server_batch_spark.operators.multimodal import audio_features

    bad = [
        (1, "image", b"P6 garbage-not-a-header", (4, 4, None, "?")),
        (2, "image", b"BM" + b"\x00" * 60, (4, 4, None, "?")),  # bogus BMP header
        (3, "image", b"P6\n2 0\n255\n", (4, 4, None, "?")),  # zero-area PPM
        (4, "audio", b"RIFF1234WAVEtruncated", (None, None, None, "?")),
    ]
    df = spark.createDataFrame(bad, MEDIA_SCHEMA)
    imgs = {r["media_id"]: r for r in decode_images(df).collect()}
    assert set(imgs) == {1, 2, 3, 4}
    assert all(0.0 <= imgs[i]["mean_intensity"] <= 255.0 for i in imgs)  # fake fallback
    auds = {r["media_id"]: r for r in audio_features(df).collect()}
    assert all(auds[i]["sample_rate"] == 16000 for i in auds)  # fake PCM path
    # strict mode surfaces the malformed payloads instead
    with pytest.raises(Exception):
        decode_images(df, real_decode=True).collect()


def _make_png(px, filters, color_type):
    """Independent PNG ENCODER (test-side): filter each scanline per the
    spec, deflate with zlib, emit IHDR/IDAT/IEND with CRCs — so the
    engine's decoder is round-trip-checked against a second
    implementation, not against itself."""
    import struct
    import zlib

    import numpy as np

    h, w, nch = px.shape

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    flat = px.reshape(h, w * nch).astype(int)
    prev = [0] * (w * nch)
    for y in range(h):
        ft = filters[y % len(filters)]
        raw.append(ft)
        cur = flat[y].tolist()
        for x in range(w * nch):
            left = cur[x - nch] if x >= nch else 0
            up = prev[x]
            ul = prev[x - nch] if x >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            raw.append((cur[x] - pred) & 0xFF)
        prev = cur
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_real_decode_all_filters():
    """_decode_png reconstructs exact pixels through every scanline
    filter (None/Sub/Up/Average/Paeth), strips RGBA alpha, handles
    grayscale, and rejects non-PNG payloads."""
    import numpy as np

    from debezium_server_batch_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    w, h, flat = _decode_png(_make_png(px, [0, 1, 2, 3, 4], 2))
    assert (w, h) == (4, 5)
    assert np.array_equal(flat, px.reshape(-1))
    px4 = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    w, h, flat = _decode_png(_make_png(px4, [4, 3, 1], 6))
    assert (w, h) == (3, 3)
    assert np.array_equal(flat, px4[:, :, :3].reshape(-1))  # alpha stripped
    g = rng.integers(0, 256, size=(2, 6, 1), dtype=np.uint8)
    w, h, flat = _decode_png(_make_png(g, [2, 4], 0))
    assert (w, h) == (6, 2)
    assert np.array_equal(flat, g.reshape(-1))
    assert _decode_png(b"not a png") is None
    with pytest.raises(NotImplementedError):  # interlaced → honest gate
        import struct as _s
        import zlib as _z

        ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + _s.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        _decode_png(bad)


def test_decode_images_png_real_through_spark(spark):
    """End-to-end: a hand-encoded PNG through decode_images under
    real_decode=True yields exact dimensions and mean intensity."""
    import numpy as np

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    png = _make_png(px, [1, 4, 2, 3], 2)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png), (None, None, None, "png"))], MEDIA_SCHEMA
    )
    r = decode_images(df, real_decode=True).collect()[0]
    assert (r["width"], r["height"]) == (6, 4)
    assert r["mean_intensity"] == pytest.approx(px.astype(float).mean())
