"""Real multimodal decode kernels (PPM/BMP images, PCM WAV audio) and
the Spark mapInPandas operators over them. No external media libs —
everything here is NumPy/stdlib, so the kernels run identically on a
bare executor."""

import struct

import numpy as np
import pytest

from tlgs_spark.ops.multimodal import (
    audio_stats,
    decode_audio,
    decode_image,
    encode_ppm,
    encode_wav,
    image_stats,
    resize_images,
    resize_nearest,
    synth_media_real,
)


def test_ppm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_ppm_header_comments():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    payload = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(payload), img)


def _tiny_bmp() -> bytes:
    """2x2 24bpp BI_RGB BMP: top row red,green; bottom row blue,white.
    Rows are 4-byte-aligned BGR, stored bottom-up."""
    rows = (
        bytes([255, 0, 0, 255, 255, 255, 0, 0])  # disk row 0 = bottom: blue, white
        + bytes([0, 0, 255, 0, 255, 0, 0, 0])    # disk row 1 = top: red, green
    )
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(rows), 0, 0, 54)
    return hdr + info + rows


def test_bmp_decode_golden():
    img = decode_image(_tiny_bmp())
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]      # red
    assert img[0, 1].tolist() == [0, 255, 0]      # green
    assert img[1, 0].tolist() == [0, 0, 255]      # blue
    assert img[1, 1].tolist() == [255, 255, 255]  # white


def test_unknown_image_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n not actually decodable here")


def test_resize_nearest_exact():
    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(up[:2, :2], np.broadcast_to(img[0, 0], (2, 2, 3)))
    assert np.array_equal(up[2:, 2:], np.broadcast_to(img[1, 1], (2, 2, 3)))


def test_wav_roundtrip_sine():
    sr, freq, dur = 8000, 440.0, 0.25
    t = np.arange(int(sr * dur)) / sr
    sine = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    samples, rate = decode_audio(encode_wav(sine, sr))
    assert rate == sr and samples.shape == (len(sine), 1)
    # 16-bit quantization: within 1 LSB
    assert float(np.abs(samples[:, 0] - sine).max()) < 1.5 / 32768
    rms = float(np.sqrt(np.mean(samples[:, 0].astype(np.float64) ** 2)))
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3


def test_non_wav_audio_raises():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04\x00 this is not pcm")


def test_image_pipeline_spark(spark):
    media = synth_media_real(spark, n=24, kind="image")
    stats = {r.media_id: r for r in image_stats(media).collect()}
    meta = {r.media_id: r for r in media.select("media_id", "width", "height").collect()}
    assert len(stats) == 24
    for mid, r in stats.items():
        assert (r.width, r.height) == (meta[mid].width, meta[mid].height)
        # x-gradient red channel, y-gradient green channel → means near 127.5
        assert 80 < r.mean_r < 175 and 80 < r.mean_g < 175

    resized = resize_images(media, 16, 12)
    rs = image_stats(resized).collect()
    assert all(r.width == 16 and r.height == 12 for r in rs)
    # nearest-neighbor preserves the channel-mean neighborhood
    for r in rs:
        assert abs(r.mean_r - stats[r.media_id].mean_r) < 40

    # determinism: same seed → same stats
    again = image_stats(synth_media_real(spark, n=24, kind="image")).collect()
    assert {(r.media_id, r.mean_r, r.mean_g, r.mean_b) for r in again} == {
        (r.media_id, r.mean_r, r.mean_g, r.mean_b) for r in stats.values()
    }


def test_audio_pipeline_spark(spark):
    media = synth_media_real(spark, n=16, kind="audio")
    rows = {r.media_id: r for r in audio_stats(media).collect()}
    meta = {r.media_id: r.duration_ms for r in media.select("media_id", "duration_ms").collect()}
    assert len(rows) == 16
    for mid, r in rows.items():
        assert r.sample_rate == 8000 and r.n_channels == 1
        assert r.n_frames == int(8000 * meta[mid] / 1000)
        # 0.5-amplitude sine → rms ≈ 0.3536 (short bursts wander a bit)
        assert 0.30 < r.rms < 0.40
        assert r.zero_crossings > 0


def test_audio_stats_zero_frame_wav(spark):
    """A valid header-only WAV (0 frames) must yield rms=0.0, not NaN
    (np.mean of an empty array is NaN and would poison downstream
    aggregates)."""
    import math

    from tlgs_spark.ops.multimodal import MEDIA_SCHEMA

    empty = encode_wav(np.zeros((0,), dtype=np.float32), 8000)
    samples, _ = decode_audio(empty)
    assert samples.shape[0] == 0
    media = spark.createDataFrame(
        [(1, "audio", bytearray(empty), "audio/wav", None, None, 0)],
        schema=MEDIA_SCHEMA,
    )
    (row,) = audio_stats(media).collect()
    assert row.n_frames == 0
    assert row.rms == 0.0 and not math.isnan(row.rms)
    assert row.zero_crossings == 0
