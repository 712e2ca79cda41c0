"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode is REAL for the formats a bare NumPy/stdlib container can
parse — PPM (P6) and uncompressed 24-bit BMP images, PCM WAV audio —
with decode → stats → resize → re-encode kernels tested end to end
over the Spark mapInPandas plumbing (tests/test_multimodal.py).
Compressed codecs (JPEG/PNG/MP3/H.264 …) sit behind a library probe
and raise NotImplementedError when absent, as does video frame decode
(the sampling *plan* is real; see frame_sample_plan). Also real and
tested: the schemas, the Arrow batch plumbing (capped batch sizes —
binary payloads blow up Arrow batches if you leave maxRecordsPerBatch
at default), the partitioning guidance, and the UDF signatures.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, sha256 string, feature array<float>"

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def synth_media(spark, n: int = 100, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (seeded bytes) for plumbing tests."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rng = np.random.default_rng(1000 + int(i))
                payload = rng.integers(0, 256, size=int(rng.integers(512, 4096)), dtype=np.uint8).tobytes()
                rows.append((int(i), kind, payload, f"application/x-fake-{kind}",
                             int(rng.integers(16, 512)), int(rng.integers(16, 512)),
                             int(rng.integers(100, 60000))))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "mime",
                                              "width", "height", "duration_ms"])

    # a handful of fat partitions, not one per core — each partition
    # spins up a Python worker, and payload rows are the heavy part
    return spark.range(0, n, 1, numPartitions=max(1, min(8, n // 32))).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def encode_ppm(img: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    if c != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm wants (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _decode_ppm(b: bytes) -> "np.ndarray":
    """Binary PPM (P6): 'P6' + 3 whitespace-separated header ints
    (width height maxval, '#' comments allowed) + one whitespace +
    raw RGB rows."""
    pos, vals = 2, []
    while len(vals) < 3:
        while b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while b[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    return np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


def _decode_bmp(b: bytes) -> "np.ndarray":
    """Uncompressed 24-bit BI_RGB BMP → (h, w, 3) uint8 RGB (rows are
    4-byte aligned bottom-up BGR on disk)."""
    import struct

    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img[..., ::-1])  # BGR → RGB


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to a (h, w, 3) uint8 RGB array.

    PPM (P6) and uncompressed 24-bit BMP decode with pure NumPy;
    compressed formats need PIL (absent in this container → probe +
    NotImplementedError)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if HAVE_PIL:  # pragma: no cover - not present in this container
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    raise NotImplementedError(
        f"format {payload[:4]!r}: compressed codecs need PIL; container has none"
    )


def resize_nearest(img: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor resize by integer index gather (no libs)."""
    h, w = img.shape[:2]
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return img[yi][:, xi]


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """float32 (n,) or (n, ch) in [-1, 1] → 16-bit PCM WAV bytes."""
    import io
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """PCM WAV → ((n_frames, n_channels) float32 in [-1, 1], rate).

    8/16-bit PCM decodes with stdlib wave + NumPy; compressed audio
    (MP3/AAC/OGG …) would need an external decoder → NotImplementedError."""
    import io
    import wave

    try:
        w = wave.open(io.BytesIO(payload))
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(f"not PCM WAV ({e}); compressed audio needs a codec lib")
    with w:
        ch, sw, sr = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{sw * 8}-bit PCM")
    return arr.reshape(-1, ch), sr


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    The 'feature' is a deterministic fake (sha256-seeded vector) —
    the real kernel (image embed / audio fingerprint) slots into
    `_fake_feature` with an identical signature. Batching: keep
    `spark.sql.execution.arrow.maxRecordsPerBatch` small (≤1k) when
    payloads are MBs; repartition upstream so a batch ≈ 64–256 MB.
    """

    def _fake_feature(payload: bytes) -> np.ndarray:
        h = hashlib.sha256(payload).digest()
        seed = int.from_bytes(h[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(dim).astype(np.float32)

    def run(batches):
        for pdf in batches:
            feats = [_fake_feature(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "sha256": [hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synth_media_real(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic media table with REAL payloads: gradient+noise
    PPM images or sine-burst PCM WAVs — every row decodes with the
    pure-NumPy/stdlib kernels above (plumbing + kernel tests)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                rng = np.random.default_rng(2000 + int(i))
                if kind == "image":
                    w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [
                            (xx * 255 // max(w - 1, 1)),
                            (yy * 255 // max(h - 1, 1)),
                            rng.integers(0, 256, size=(h, w)),
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    rows.append((int(i), kind, encode_ppm(img), "image/x-portable-pixmap",
                                 w, h, None))
                else:
                    sr = 8000
                    dur_ms = int(rng.integers(50, 500))
                    freq = float(rng.integers(100, 1000))
                    t = np.arange(int(sr * dur_ms / 1000), dtype=np.float64) / sr
                    samples = (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
                    rows.append((int(i), kind, encode_wav(samples, sr), "audio/wav",
                                 None, None, dur_ms))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "mime",
                                              "width", "height", "duration_ms"])

    return spark.range(0, n, 1, numPartitions=max(1, min(8, n // 16))).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def hashchain_bytes(seed: str, n_bytes: int) -> bytes:
    """Deterministic payload bytes from an md5 chain: block ``j``'s 16
    bytes are ``md5(f"{seed}:{j}")``, truncated to ``n_bytes``. The
    point of this generator (vs ``np.random``) is that a SQL oracle can
    reproduce the bytes exactly — DuckDB renders block j as
    ``md5(seed || ':' || j)`` hex and string_aggs the chain — so
    multimodal payload entries get a hard value-hash check instead of
    a rows-only one."""
    out = b"".join(
        hashlib.md5(f"{seed}:{j}".encode()).digest() for j in range(-(-n_bytes // 16))
    )
    return out[:n_bytes]


# oracle-checkable media table geometry (shared with the DuckDB SQL in
# entry_queries — the constants below appear verbatim there)
CHAIN_IMAGE_N = 32
CHAIN_VIDEO_N = 100
CHAIN_VIDEO_ID0 = 1000


def _chain_image(mid: int) -> tuple:
    w = 8 + (mid * 7) % 24
    h = 8 + (mid * 11) % 24
    header = f"P6\n{w} {h}\n255\n".encode()
    payload = header + hashchain_bytes(f"image:{mid}", w * h * 3)
    return (mid, "image", payload, "image/x-portable-pixmap", w, h, None)


def _chain_video(mid: int) -> tuple:
    n_bytes = 512 + (mid * 37) % 3584
    duration_ms = 100 + (mid * 997) % 59900
    payload = hashchain_bytes(f"video:{mid}", n_bytes)
    return (mid, "video", payload, "video/x-fake", None, None, duration_ms)


def synth_media_chain(spark) -> DataFrame:
    """Deterministic media table whose bytes are md5-chain-derived
    (SQL-reproducible, see hashchain_bytes): CHAIN_IMAGE_N real PPM
    images whose PIXELS are the chain (decode_image parses them — the
    real kernel stays in the loop) + CHAIN_VIDEO_N opaque video
    payloads with chain-derived sizes/durations."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i < CHAIN_IMAGE_N:
                    rows.append(_chain_image(i))
                else:
                    rows.append(_chain_video(CHAIN_VIDEO_ID0 + (i - CHAIN_IMAGE_N)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "mime",
                                              "width", "height", "duration_ms"])

    total = CHAIN_IMAGE_N + CHAIN_VIDEO_N
    return spark.range(0, total, 1, numPartitions=4).mapInPandas(gen, schema=MEDIA_SCHEMA)


DIGEST_SCHEMA = "media_id long, kind string, n_bytes long, sha256 string"


def payload_digests(media: DataFrame) -> DataFrame:
    """Per-payload content digest. The digest is sha256 over the
    payload's LOWERCASE HEX rendering (not the raw bytes): DuckDB's
    sha256() accepts VARCHAR only, so hashing the hex string is the
    contract both sides can compute — equally collision-resistant,
    equally content-addressing."""

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "sha256": [
                        hashlib.sha256(bytes(p).hex().encode()).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=DIGEST_SCHEMA)


CHAIN_STATS_SCHEMA = "media_id long, sum_r long, sum_g long, sum_b long"


def image_chain_stats(media: DataFrame) -> DataFrame:
    """Decode every image payload (REAL decode_image kernel) and emit
    exact per-channel byte sums — integer outputs so the DuckDB twin
    (per-hex-pair byte parse + filtered sums) matches with no float
    rounding contract at all."""

    def run(batches):
        for pdf in batches:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(p)).reshape(-1, 3).astype(np.int64)
                s = img.sum(axis=0)
                out.append((int(mid), int(s[0]), int(s[1]), int(s[2])))
            yield pd.DataFrame(out, columns=["media_id", "sum_r", "sum_g", "sum_b"])

    return media.mapInPandas(run, schema=CHAIN_STATS_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "media_id long, width int, height int, mean_r double, mean_g double, mean_b double"
)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode every image payload and emit per-channel means — the
    canonical decode-in-the-data-plane shape (mapInPandas, one real
    decode per row, nothing leaves the executor but the stats)."""

    def run(batches):
        for pdf in batches:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode_image(bytes(p))
                m = img.reshape(-1, 3).mean(axis=0)
                out.append((int(mid), img.shape[1], img.shape[0],
                            float(m[0]), float(m[1]), float(m[2])))
            yield pd.DataFrame(out, columns=["media_id", "width", "height",
                                             "mean_r", "mean_g", "mean_b"])

    return media.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (PPM). A binary →
    binary transform: the resized payload replaces the original and the
    typed metadata is updated in the same pass."""

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                encode_ppm(resize_nearest(decode_image(bytes(p)), out_w, out_h))
                for p in pdf["payload"]
            ]
            pdf["width"] = np.int32(out_w)
            pdf["height"] = np.int32(out_h)
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_frames long, n_channels int, "
    "rms double, zero_crossings long"
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode every WAV payload → rate / frames / RMS / zero-crossings."""

    def run(batches):
        for pdf in batches:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                samples, sr = decode_audio(bytes(p))
                mono = samples.mean(axis=1)
                zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                # header-only WAV (0 frames): rms of nothing is 0, not NaN
                # (np.mean of an empty array would yield NaN + a warning
                # and poison downstream aggregates)
                rms = (
                    float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
                    if samples.shape[0]
                    else 0.0
                )
                out.append((int(mid), sr, samples.shape[0], samples.shape[1],
                            rms, zc))
            yield pd.DataFrame(out, columns=["media_id", "sample_rate", "n_frames",
                                             "n_channels", "rms", "zero_crossings"])

    return media.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    — the decode itself is the stub above. Pure JVM sequence/explode."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
