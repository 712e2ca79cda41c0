"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container — each raises NotImplementedError unless the library
import succeeds, or uses the deterministic fake). What IS real and
tested: the schemas, the Arrow batch plumbing (mapInPandas with
capped batch sizes — binary payloads blow up Arrow batches if you
leave maxRecordsPerBatch at default), the partitioning guidance, and
the UDF signatures a real kernel would drop into.
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


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real impl: PIL.Image.open(io.BytesIO(payload)) → RGB array."""
    if not HAVE_PIL:
        raise NotImplementedError("image decode requires PIL; container has none")
    raise NotImplementedError("wire PIL decode here")


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


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    — the decode itself is the stub above. Pure JVM sequence/explode."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
