"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas UDFs.

COMPRESSED codecs (JPEG/PNG/MP3/H.264) are NOT in this environment, so
their decode step is a clearly-marked deterministic fake
(``_fake_decode``) behind the same batch interface a real libjpeg/ffmpeg
binding would use.  Uncompressed containers need no codec library:
``decode_bmp`` is a REAL pure-numpy decoder for 24-bit uncompressed BMP
(``make_bmp_gray24`` is its encoder twin), and ``extract_features``
sniffs the ``BM`` magic to route real BMP payloads through real
bytes→pixels decoding while everything else keeps the stub.  The
Spark-side contract (schema, partitioning, UDF signature, Arrow batch
shape) is identical either way.  Swap ``_fake_decode`` for real codec
bindings on a cluster that has them.
"""

from __future__ import annotations

import struct
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


_BMP_HEADER = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def make_bmp_gray24(values: np.ndarray) -> bytes:
    """Encode a (height, width) uint8 grayscale array as a standard
    24-bit uncompressed BMP (R=G=B; row 0 of ``values`` is the TOP row —
    the encoder flips into BMP's bottom-up storage, rows padded to 4
    bytes).  Any external BMP viewer opens the result; ``decode_bmp``
    inverts it exactly."""
    values = np.asarray(values, dtype=np.uint8)
    height, width = values.shape
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * height
    header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER + img_size, 0, 0, _BMP_HEADER)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    zero = b"\x00" * pad
    rows = [
        np.repeat(values[y], 3).tobytes() + zero
        for y in range(height - 1, -1, -1)
    ]
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL bytes→pixels decoding of a 24-bit uncompressed BMP (the one
    image container decodable without codec libraries): parses the file +
    info headers, honors the pixel-data offset, 4-byte row padding, and
    bottom-up vs top-down row order, and returns (height, width) uint8
    luminance as the exact integer mean (B+G+R)//3 — for grayscale BMPs
    (R=G=B) that is the original channel value, bit-exact."""
    if bytes(payload[:2]) != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP decodable without codec libs "
            f"(got bpp={bpp}, compression={compression})"
        )
    top_down = height < 0
    h = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    buf = np.frombuffer(payload, dtype=np.uint8)
    rows = buf[offset : offset + stride * h].reshape(h, stride)[:, :row_bytes]
    bgr = rows.reshape(h, width, 3).astype(np.int64)
    lum = (bgr.sum(axis=2) // 3).astype(np.uint8)
    return lum if top_down else lum[::-1]


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
    no shuffle.  Payloads with the BMP magic go through REAL decoding
    (``decode_bmp``; decoded dimensions override the metadata); all other
    payloads use the documented deterministic stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples():
                if rec.payload is not None and bytes(rec.payload[:2]) == b"BM":
                    px = decode_bmp(rec.payload)
                    h, w = px.shape
                else:
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


def synthetic_media_bmp(spark: SparkSession, n: int) -> DataFrame:
    """Media table whose payloads are REAL 24-bit BMP files built
    distributed (mapInPandas over ``spark.range`` — no driver data):
    image ``id`` is ``(id % 13 + 4) × (id % 11 + 4)`` pixels with flat
    pixel ``i`` = ``(id·31 + i·7) mod 256``.  Pure modular arithmetic so
    an independent SQL oracle can re-derive every decoded feature
    (entry_queries ``media_decode``); ``extract_features`` exercises the
    real bytes→pixels path end-to-end on these rows."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                w = mid % 13 + 4
                h = mid % 11 + 4
                flat = (mid * 31 + np.arange(w * h, dtype=np.int64) * 7) % 256
                rows.append(
                    (
                        mid,
                        "doc%012d" % mid,
                        "image",
                        make_bmp_gray24(flat.reshape(h, w).astype(np.uint8)),
                        {"width": w, "height": h, "sample_rate": None, "n_frames": None},
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "doc_id", "kind", "payload", "meta"]
            )

    return spark.range(n).mapInPandas(build, schema=MEDIA_SCHEMA)


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
