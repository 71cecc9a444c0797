"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked), but everything Spark-side
is real and tested: the binary column schema, the metadata struct, the
``mapInPandas`` batch plumbing (Arrow batches in/out, schema declared
up front), and the partitioning story (decode is a narrow per-partition
map — no shuffle; at 100 TB you size ``spark.sql.files.maxPartitionBytes``
so one batch of payloads fits executor memory).

Swap ``_decode_stub`` for a real PIL/ffmpeg call and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("checksum", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def with_binary_payload(df: DataFrame, id_col: str, data_col: str) -> DataFrame:
    """Treat a column's UTF-8 bytes as an opaque media payload with typed
    metadata — the ingestion shape for real image/audio bytes."""
    payload = F.encode(F.col(data_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.octet_length(F.col(data_col)).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, dim: int) -> list[float]:
    """STUB — the real decoder (PIL / torchaudio / ffmpeg) is not
    installed in this container.  Produces a deterministic fake feature
    from the payload bytes so the pipeline shape is fully exercised."""
    h = hashlib.sha256(payload).digest()
    return [h[i % 32] / 255.0 for i in range(dim)]


def decode_features(media: DataFrame, dim: int = 8, fail_real: bool = False) -> DataFrame:
    """Batch 'decode' via mapInPandas: Arrow batches of (payload, meta) in,
    feature rows out.  ``fail_real=True`` raises the honest
    NotImplementedError instead of faking (for callers that must not
    silently get stub features)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fail_real:
                raise NotImplementedError(
                    "media decode requires an image/audio codec which is not "
                    "installed; wire a real decoder into decode_features()"
                )
            feats = [
                _decode_stub(bytes(p) if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "checksum": [m["checksum"] for m in pdf["meta"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized", T.BinaryType(), True),
    ]
)


def resize(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """STUB resize via mapInPandas: emits a deterministic width*height
    byte payload derived from the source bytes (a real implementation
    swaps the body for PIL's ``Image.resize`` — the Arrow batch plumbing,
    declared schema and narrow-map partitioning are the real parts).
    Resampling is per-row and stateless: no shuffle at any scale."""

    n_out = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                src = bytes(p) if p is not None else b""
                if not src:
                    out.append(bytes(n_out))
                    continue
                # nearest-neighbor over the byte stream: deterministic,
                # size-exact — stands in for real pixel resampling
                step = max(1, len(src) // n_out)
                out.append(bytes(src[min(i * step, len(src) - 1)] for i in range(n_out)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled
    offset (JVM-side posexplode — the real video analogue would sample
    keyframes; the partitioning/explode shape is identical)."""
    return media.select(
        "media_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, least(int(meta.n_bytes / {every_n_bytes}), {max_frames - 1})), "
                f"i -> substring(payload, i * {every_n_bytes} + 1, {every_n_bytes}))"
            )
        ).alias("frame_no", "frame_bytes"),
    ).withColumn("frame_checksum", F.md5(F.col("frame_bytes")))
