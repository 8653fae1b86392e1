"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side plumbing (schema, partition sizing,
Arrow batch shape, UDF signatures) is real and tested; the actual codec
work is stubbed because no image/audio libraries exist in this container:

- :func:`decode_media` raises ``NotImplementedError`` per modality unless
  ``fake=True``, in which case a deterministic fake decoder produces
  byte-statistics "features" so the downstream plumbing can be exercised
  and verified.

Scale notes: media rows are large and skew-prone — the operators take a
``target_rows_per_batch`` hint and repartition by a hash of the id so one
hot file cannot pin a partition; feature extraction is ``mapInPandas``
(Arrow-batched), never row-at-a-time.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: payload =
    utf-8 text bytes, modality round-robins image/audio/video. Stands in
    for a parquet/lance media dump at 100 TB (payload column stays opaque
    binary either way)."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: 4 byte-statistics
    pseudo-features derived from the payload digest."""
    if payload is None:
        return []
    digest = hashlib.md5(payload).digest()
    return [
        float(len(payload)),
        float(digest[0]) / 255.0,
        float(digest[1]) / 255.0,
        float(int.from_bytes(digest[2:4], "big")) / 65535.0,
    ]


def extract_media_features(
    media: DataFrame, fake: bool = True, partitions: int | None = None
) -> DataFrame:
    """Decode + featurize media payloads via Arrow-batched ``mapInPandas``.

    With ``fake=False`` this is where PIL/torchaudio/ffmpeg decoders would
    run; in this container that path raises ``NotImplementedError`` with
    the modality named, proving the dispatch works."""
    if partitions:
        media = media.repartition(partitions, F.crc32(F.col("media_id").cast("string")))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                modalities = sorted(set(pdf["modality"]))
                raise NotImplementedError(
                    f"real decoders not available in this environment for: {modalities}"
                    " (install PIL/torchaudio/ffmpeg and implement here)"
                )
            rows = {
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                "payload_md5": pdf["payload"].map(
                    lambda p: None if p is None else hashlib.md5(p).hexdigest()
                ),
                "features": pdf["payload"].map(_fake_features),
            }
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def media_feature_stats(features: DataFrame) -> DataFrame:
    """Per-modality byte/feature statistics (the downstream consumer of the
    plumbing; verified rows-only)."""
    return features.groupBy("modality").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("payload_md5").alias("distinct_payloads"),
    )
