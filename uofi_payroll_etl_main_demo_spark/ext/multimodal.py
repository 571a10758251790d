"""Multimodal column plumbing: binary payloads + typed metadata.

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (modality, mime, width/height or
duration, sample_rate). All Spark-side plumbing — schema, partitioning,
Arrow batch shape through ``mapInPandas`` — is real and tested; the
actual media DECODE is stubbed because codec libraries (PIL/ffmpeg/
torchaudio) are not in this container:

- ``decode_stub=True`` (default): a deterministic fake decoder — byte
  statistics standing in for pixels/samples — so the distributed
  plumbing can be exercised end-to-end.
- ``decode_stub=False``: raises NotImplementedError at the decode site,
  marking exactly where a real codec plugs in.

The batch contract is the part that matters at 100 TB: payloads never
pass through the driver, flow executor-side through Arrow record
batches, and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
batch memory (media rows are large — size it small for real media).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (for tests)."""
    rows = []
    for i in range(n):
        payload = bytes(((i * 31 + j * 7) % 251) for j in range(payload_bytes))
        rows.append(
            (
                i,
                payload,
                {
                    "modality": ["image", "audio", "video"][i % 3],
                    "mime": ["image/png", "audio/wav", "video/mp4"][i % 3],
                    "width": 64 if i % 3 == 0 else None,
                    "height": 64 if i % 3 == 0 else None,
                    "duration_ms": 1000 * (i % 10) if i % 3 else None,
                    "sample_rate": 16000 if i % 3 == 1 else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame, feature_dim: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Real plumbing, stubbed decode: with ``decode_stub`` the "feature"
    is a deterministic byte-histogram projection; without it the decode
    site raises NotImplementedError (plug a real codec there).
    """

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires codec libraries (PIL/ffmpeg); "
                    "install them and replace this branch"
                )
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    out.append((mid, 0, None, None, None))
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.histogram(arr, bins=feature_dim, range=(0, 256))[0]
                denom = max(arr.size, 1)
                out.append(
                    (
                        mid,
                        int(arr.size),
                        float(arr.mean()),
                        float(arr.std()),
                        (hist / denom).astype("float32").tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_bytes", "byte_mean", "byte_std", "feature"],
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per planned frame.

    Pure relational expansion (sequence + explode on duration metadata)
    — the decode of each planned frame would run in ``extract_features``.
    Demonstrates the explode-side shape: partition count scales with
    frames, not videos, so one long video cannot hot-spot a task.
    """
    return (
        media.filter(F.col("meta.modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ms"),
        )
    )
