"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns plus a typed metadata struct; the
compute pattern is Arrow-batched ``mapInPandas`` so decode/resize/
feature-extract amortize per-batch (the only sane shape for Python
media libs on Spark). The media libraries themselves (PIL, torchaudio,
ffmpeg) are NOT in this container, so the decode kernels are
deterministic fakes behind ``_HAS_PIL``-style gates — the Spark-side
contract (schemas, batch iteration, partitioning) is real and tested,
and swapping in a real decoder touches only the kernel body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder if available (not in the test container)
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", media_type: str = "image/fake") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct.

    In production the binary comes off the lake (parquet/avro binary
    column or per-object files listed into a DataFrame); here it is
    derived deterministically from text so tests are reproducible.
    """
    payload = F.encode(F.col(text_col), "UTF-8").cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("bigint").alias("size_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple:
    """Deterministic stand-in for image decode: dimensions + an 8-dim
    feature vector derived from the content digest."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [round(b / 255.0, 6) for b in digest[2:10]]
    return width, height, feature


def decode_media(df: DataFrame, id_col: str = "doc_id", batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched
    ``mapInPandas``.

    The kernel sees pandas batches (zero-copy Arrow transfer), so a
    real PIL/torch decoder drops in with per-batch amortization; at
    100 TB this is an embarrassingly-parallel map stage whose
    parallelism is the input partitioning (repartition upstream if
    media objects are few-but-huge).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if _HAS_PIL and False:  # pragma: no cover - real decoder path
                raise NotImplementedError("real image decode not wired in this container")
            decoded = [_fake_decode(p) for p in batch["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "media_type": [m["media_type"] for m in batch["media_meta"]],
                    "size_bytes": [int(m["size_bytes"]) for m in batch["media_meta"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, "payload", "media_meta").mapInPandas(kernel, DECODED_SCHEMA)


def resize_stub(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize plumbing: computes target dims JVM-side; the pixel work
    would live in the decode kernel. Keeps aspect ratio, shorter side
    → ``target``."""
    scale = F.lit(float(target)) / F.least(F.col("width"), F.col("height")).cast("double")
    return df.withColumns(
        {
            "resized_width": F.round(F.col("width") * scale).cast("int"),
            "resized_height": F.round(F.col("height") * scale).cast("int"),
        }
    )


def frame_sample_plan(df: DataFrame, fps: float = 1.0, duration_col: str = "size_bytes") -> DataFrame:
    """Frame-sampling plan for video payloads: emits (doc_id, frame_idx)
    rows — the explode that a real ffmpeg kernel would consume.
    Duration is faked from payload size (1s per 100 bytes)."""
    n_frames = F.greatest(
        (F.col(duration_col) / 100.0 * fps).cast("int"), F.lit(1)
    )
    return df.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    )
