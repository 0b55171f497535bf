"""Multimodal (image/audio/video) column handling (SURVEY §7.6):
opaque ``binary`` payload + typed metadata, processed via Arrow-batched
``mapInPandas`` so the heavy per-item work runs vectorized in Python
workers without ever collecting to the driver.

The decode kernels themselves are STUBBED (no PIL/ffmpeg in this
container): ``decode=fake`` produces deterministic features from the
bytes so the Spark-side plumbing — schema, batch shape, partitioning —
is real and tested; ``decode=real`` raises NotImplementedError at the
point where the codec library would be called.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The lake schema for a multimodal asset table: payload is opaque
# binary; metadata is typed and filterable (partition by modality /
# format so scans prune).
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("format", StringType(), True),  # png|wav|mp4|...
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content_digest", StringType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: derives pseudo
    width/height from a stable digest of the bytes."""
    digest = hashlib.sha256(payload or b"").hexdigest()
    width = 64 + int(digest[:4], 16) % 1920
    height = 64 + int(digest[4:8], 16) % 1080
    return width, height, digest


def extract_image_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary image payloads.

    mapInPandas streams each partition through Python in Arrow record
    batches — memory-bounded, no driver involvement, parallel per
    partition. Swap ``_fake_decode`` for PIL/libvips in ``real`` mode."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def batches(iterator: Iterator) -> Iterator:
        import pandas as pd

        for pdf in iterator:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/libvips (not in this "
                    "container); use decode='fake' for plumbing tests"
                )
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "content_digest": [d[2] for d in decoded],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("duration_sec", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("loudness_proxy", IntegerType(), True),
        StructField("content_digest", StringType(), True),
    ]
)


def extract_audio_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched audio feature extraction (duration / sample-rate /
    loudness) over binary payloads — same mapInPandas shape as the
    image path, so the three modalities share one processing pattern.
    Fake mode derives deterministic features from a stable digest;
    real mode is the seam where soundfile/librosa would decode."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def batches(iterator: Iterator) -> Iterator:
        import pandas as pd

        for pdf in iterator:
            if decode == "real":
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa (not in "
                    "this container); use decode='fake' for plumbing tests"
                )
            digests = [
                hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "duration_sec": [1 + int(d[:4], 16) % 600 for d in digests],
                    "sample_rate": [
                        (8000, 16000, 22050, 44100, 48000)[int(d[4], 16) % 5]
                        for d in digests
                    ],
                    "loudness_proxy": [int(d[5:7], 16) for d in digests],
                    "content_digest": digests,
                }
            )

    return assets.filter(F.col("modality") == "audio").mapInPandas(
        batches, AUDIO_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("target_width", IntegerType(), False),
        StructField("target_height", IntegerType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224, decode: str = "fake"
) -> DataFrame:
    """Image resize plumbing (the preprocessing step every vision
    training pipeline runs): binary in → binary out with target dims
    as typed metadata, Arrow-batched via mapInPandas. Fake mode emits
    a deterministic payload (digest-seeded bytes sized proportionally
    to the target area) so downstream writers/readers exercise real
    byte traffic; real mode is the PIL/libvips seam."""
    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def batches(iterator: Iterator) -> Iterator:
        import pandas as pd

        for pdf in iterator:
            if decode == "real":
                raise NotImplementedError(
                    "real image resize requires PIL/libvips (not in this "
                    "container); use decode='fake' for plumbing tests"
                )
            out = []
            for p in pdf["payload"]:
                seed = hashlib.sha256((p or b"") + b"|resize").digest()
                # deterministic fake bitmap: repeat the digest to ~1 byte
                # per 64 target pixels (keeps test payloads small)
                size = max(32, (width * height) // 64)
                out.append((seed * (size // len(seed) + 1))[:size])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "target_width": width,
                    "target_height": height,
                    "payload": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return assets.filter(F.col("modality") == "image").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def sample_video_frames(
    assets: DataFrame, every_n_seconds: int = 5, decode: str = "fake"
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame
    (explode shape). Fake mode derives a deterministic frame count
    from payload size; real mode would call ffmpeg."""
    if decode == "real":
        raise NotImplementedError("real frame sampling requires ffmpeg")
    n_frames = (F.coalesce(F.length("payload"), F.lit(0)) % 8 + 1).cast("int")
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn(
            "frame_no",
            F.explode(F.sequence(F.lit(0), n_frames - 1)),
        )
        .withColumn("frame_ts_sec", F.col("frame_no") * every_n_seconds)
        .select("asset_id", "frame_no", "frame_ts_sec", "n_bytes")
    )
