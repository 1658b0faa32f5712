"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas UDFs.

The image/audio codecs are NOT in this environment, so the decode step is
a clearly-marked deterministic fake (``_fake_decode``) behind the same
batch interface a real libjpeg/ffmpeg binding would use — the Spark-side
contract (schema, partitioning, UDF signature, Arrow batch shape) is real
and tested.  Swap ``_fake_decode`` for a real decoder on a cluster with
the codec libraries installed.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque payloads (sha256-derived bytes) with metadata —
    stands in for an Iceberg media table.  Metadata derives from plain
    modular arithmetic on the id (not murmur F.hash) so an independent SQL
    oracle can re-derive every downstream feature."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        F.pmod(F.col("id") * F.lit(2654435761) + F.lit(seed), F.lit(3)).cast("int") + 1,
    )
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.format_string("doc%012d", F.col("id")).alias("doc_id"),
        kinds.alias("kind"),
        F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            (F.pmod(F.col("id") * F.lit(7919) + F.lit(1), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("id") * F.lit(104729) + F.lit(2), F.lit(1080)) + 1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.pmod(F.col("id") * F.lit(31337) + F.lit(3), F.lit(300)) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from the payload bytes.

    A real deployment replaces this with e.g. ``PIL.Image.open`` /
    ``pyav`` — same ndarray-out contract.  Raises on None payload the way
    a real decoder raises on truncated bytes."""
    if payload is None:
        raise NotImplementedError("no payload: real decoder required")
    rng = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(width * height / len(rng)))
    return np.tile(rng, reps)[: width * height].reshape(height, width)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("std_px", T.DoubleType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
    ]
)


def extract_features(media: DataFrame, thumb: int = 8) -> DataFrame:
    """Decode → feature-extract → resize, one Arrow batch at a time.

    The real work (decode + reduce) happens per batch in numpy; Spark only
    sees (media_id → features).  Partition-parallel over the media table;
    no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples():
                w = int(rec.meta["width"])
                h = int(rec.meta["height"])
                px = _fake_decode(rec.payload, w, h)
                sy = max(1, h // thumb)
                sx = max(1, w // thumb)
                th = px[::sy, ::sx]
                # mean/std from EXACT integer sums (pixel counts ≪ 2^53):
                # deterministic to the last bit, independent of numpy's
                # pairwise-summation order — an external oracle can
                # re-derive them with the same two divisions and a sqrt
                flat = px.astype(np.int64)
                n = flat.size
                s = int(flat.sum())
                s2 = int((flat * flat).sum())
                mean = s / n
                std = float(np.sqrt(s2 / n - mean * mean))
                out.append(
                    (
                        rec.media_id,
                        rec.kind,
                        float(mean),
                        std,
                        int(th.shape[1]),
                        int(th.shape[0]),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "mean_px", "std_px", "thumb_w", "thumb_h"]
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_idx) rows via JVM-side
    sequence/explode — the decode of each sampled frame would be another
    ``extract_features``-style pandas UDF."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
