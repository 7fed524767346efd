"""Multimodal column plumbing (BASELINE.json north star).

Images / audio / video ride as opaque ``binary`` columns with a typed
metadata struct.  The Spark-side machinery — schema, partition-aware
batch iteration, Arrow transfer shape, UDF signatures — is real and
tested; the actual codec calls are stubbed behind
``NotImplementedError`` (image/audio libraries are not in this
container) or a deterministic fake, clearly marked.

Design rules for 100 TB:
- decode/transform runs in ``mapInPandas`` (Arrow batches, one Python
  worker per partition — never a row-at-a-time UDF),
- binary payloads never pass through a shuffle: decode -> feature
  -> project narrow columns first, shuffle the small features,
- batch size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  so a partition of large blobs can't OOM the Python worker.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata for an opaque media payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image|audio|video
        T.StructField("format", T.StringType(), True),        # png|jpeg|wav|mp4...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_meta(df: DataFrame, payload_col: str = "payload", media_type: str = "image", fmt: str | None = None) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct
    (n_bytes computed engine-side; codec-derived fields left null until
    decode)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.coalesce(F.length(F.col(payload_col)).cast("long"), F.lit(0).cast("long")).alias("n_bytes"),
        ),
    )


def decode_image(payload: bytes) -> "object":
    """STUB: real implementation would be e.g. PIL.Image.open(BytesIO).
    The image codec is not available in this container."""
    raise NotImplementedError("image decode requires a codec library not present in this environment")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature extractor used by tests: 8 floats
    derived from the sha256 digest — stands in for a real embedding
    model, keeping the full Arrow/mapInPandas path honest."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, use_fake_extractor: bool = True) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA rows.

    The payload column is dropped immediately after featurization, so
    only (id, hash, n_bytes, feature) ever reaches a shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": [hashlib.sha256(p).hexdigest() if p is not None else None for p in payloads],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "feature": [
                        _fake_feature(p)
                        if (use_fake_extractor and p is not None)
                        else None
                        for p in payloads
                    ],
                }
            )
            yield out

    if not use_fake_extractor:
        raise NotImplementedError("real feature extraction requires model/codec libraries not in this environment")
    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB for video frame sampling: the Spark plan (mapInPandas with
    an exploding output schema — one row per sampled frame) is the real
    design; the codec call raises."""

    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError("video decode requires a codec library not present in this environment")
        yield  # pragma: no cover

    return df.mapInPandas(batches, frame_schema)
