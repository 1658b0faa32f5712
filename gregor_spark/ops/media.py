"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched pandas UDFs.

Codec-library-dependent formats (JPEG/MP3/H.264) are NOT in this
environment, so their decode step is a clearly-marked deterministic
fake (``_fake_decode``) behind the same batch interface a real
libjpeg/ffmpeg binding would use.  Three REAL decoders need no codec
library and are magic-sniffed by ``extract_features``:

* ``decode_bmp`` — 24-bit uncompressed BMP (encoder ``make_bmp_gray24``);
* ``decode_png`` (r5) — 8-bit gray/RGB PNG via stdlib zlib inflate +
  numpy scanline unfiltering, all five PNG filters (encoder
  ``make_png_gray8``, which can emit every filter type) — the most
  common real image container this pipeline will meet;
* ``decode_wav`` — PCM16 RIFF/WAVE (encoder ``make_wav_pcm16``).

Everything else keeps the stub.  The Spark-side contract (schema,
partitioning, UDF signature, Arrow batch shape) is identical either
way.  Swap ``_fake_decode`` for real codec bindings on a cluster that
has them.
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def make_png_gray8(values: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (height, width) uint8 grayscale array as a real PNG
    (color type 0, bit depth 8, one IDAT) — ``decode_png`` inverts it
    exactly and any external viewer opens it.  ``filter_type`` applies
    that scanline filter to EVERY row (0=None, 1=Sub, 2=Up, 3=Average,
    4=Paeth) so tests can exercise each unfilter path with real files."""
    import zlib

    values = np.asarray(values, dtype=np.uint8)
    height, width = values.shape
    raw = bytearray()
    prev = np.zeros(width, dtype=np.int64)
    for y in range(height):
        row = values[y].astype(np.int64)
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub: delta vs left
            filt = row - np.concatenate(([0], row[:-1]))
        elif filter_type == 2:  # Up: delta vs above
            filt = row - prev
        elif filter_type == 3:  # Average: delta vs floor((left+up)/2)
            left = np.concatenate(([0], row[:-1]))
            filt = row - (left + prev) // 2
        elif filter_type == 4:  # Paeth
            left = np.concatenate(([0], row[:-1]))
            ul = np.concatenate(([0], prev[:-1]))
            filt = row - _paeth(left, prev, ul)
        else:
            raise ValueError(f"filter_type {filter_type}")
        raw.append(filter_type)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized: the neighbor
    (left, up, upper-left) closest to p = a + b − c, ties a→b→c."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL bytes→pixels PNG decoding with zero codec libraries: chunk
    walk (CRC-checked) → concatenated-IDAT zlib inflate → per-scanline
    unfilter (None/Sub/Up/Average/Paeth, PNG spec §9) in numpy.  8-bit
    grayscale (color type 0) returns the (height, width) array exactly;
    8-bit RGB (type 2) returns (R+G+B)//3 luminance like ``decode_bmp``.
    Raises on palette/alpha/16-bit/interlaced profiles — never misreads."""
    import zlib

    if bytes(payload[: len(_PNG_SIG)]) != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = bytes(payload[pos + 4 : pos + 8])
        body = bytes(payload[pos + 8 : pos + 8 + length])
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, ctype_n, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype_n not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit gray/RGB non-interlaced PNG decodable here (depth="
            f"{depth}, color_type={ctype_n}, interlace={interlace})"
        )
    ch = 1 if ctype_n == 0 else 3
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel data {len(raw)} bytes, expected {(stride + 1) * height}"
        )
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ft = int(lines[y, 0])
        row = lines[y, 1:].astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):  # Sub/Average/Paeth need the left pixel:
            # sequential per pixel-column in steps of the channel count
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                up = prev[x]
                ul = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = int(_paeth(np.array([left]), np.array([up]), np.array([ul]))[0])
                cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"PNG scanline filter {ft}")
        out[y] = cur
        prev = cur
    if ch == 1:
        return out.astype(np.uint8)
    rgb = out.reshape(height, width, 3)
    return (rgb.sum(axis=2) // 3).astype(np.uint8)


def make_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode mono int16 samples as a standard PCM16 RIFF/WAVE file —
    ``decode_wav`` inverts it exactly; any audio tool plays it."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    data = samples.tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL bytes→samples decoding of PCM16 RIFF/WAVE (the audio
    counterpart of ``decode_bmp``): walks the chunk list (word-aligned,
    unknown chunks skipped), returns (samples, sample_rate) — mono as a
    1-D int16 array, multi-channel as (n_frames, channels)."""
    if bytes(payload[:4]) != b"RIFF" or bytes(payload[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM16 decodable without codec libs "
            f"(got format={audio_format}, bits={bits})"
        )
    arr = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        arr = arr.reshape(-1, channels)
    return arr, int(rate)


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
    no shuffle.  Payloads with the BMP magic go through REAL image
    decoding (``decode_bmp``; decoded dimensions override the metadata);
    RIFF/WAVE payloads through REAL audio decoding (``decode_wav`` — the
    mono sample vector is treated as a 1×n grid, so mean/std are sample
    statistics and the "thumb" is a ×(n//thumb) decimation); all other
    payloads use the documented deterministic stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples():
                head = bytes(rec.payload[:8]) if rec.payload is not None else b""
                if head[:2] == b"BM":
                    px = decode_bmp(rec.payload)
                    h, w = px.shape
                elif head == _PNG_SIG:
                    px = decode_png(rec.payload)
                    h, w = px.shape
                elif head[:4] == b"RIFF":
                    samples, _rate = decode_wav(rec.payload)
                    px = np.atleast_2d(samples)
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


def synthetic_media_png(
    spark: SparkSession, n: int, id_offset: int = 0
) -> DataFrame:
    """PNG twin of ``synthetic_media_bmp``: REAL zlib-compressed PNG
    payloads built distributed.  Image ``id`` is ``(id % 13 + 4) ×
    (id % 11 + 4)`` pixels with flat pixel ``i`` = ``(id·37 + i·11) mod
    256``, written with scanline filter ``id % 5`` — every PNG filter
    type appears in the corpus, so the decode oracle replays the whole
    unfilter matrix.  Pure modular arithmetic, SQL-replayable
    (entry_queries ``media_decode``)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["id"]:
                mid = int(raw) + id_offset
                w = int(raw) % 13 + 4
                h = int(raw) % 11 + 4
                flat = (mid * 37 + np.arange(w * h, dtype=np.int64) * 11) % 256
                rows.append(
                    (
                        mid,
                        "doc%012d" % mid,
                        "image",
                        make_png_gray8(
                            flat.reshape(h, w).astype(np.uint8),
                            filter_type=int(raw) % 5,
                        ),
                        {"width": w, "height": h, "sample_rate": None, "n_frames": None},
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "doc_id", "kind", "payload", "meta"]
            )

    return spark.range(n).mapInPandas(build, schema=MEDIA_SCHEMA)


def synthetic_media_wav(spark: SparkSession, n: int, id_offset: int = 0) -> DataFrame:
    """Audio twin of ``synthetic_media_bmp``: REAL PCM16 WAV payloads
    built distributed — clip ``id`` has ``(id % 50) + 20`` samples with
    sample ``i`` = ``((id·17 + i·11) mod 4096) − 2048``.  Pure modular
    arithmetic, SQL-replayable (entry_queries ``media_decode``)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf["id"]:
                mid = int(raw) + id_offset
                n_samp = int(raw) % 50 + 20
                samples = (
                    (mid * 17 + np.arange(n_samp, dtype=np.int64) * 11) % 4096
                ) - 2048
                rows.append(
                    (
                        mid,
                        "doc%012d" % mid,
                        "audio",
                        make_wav_pcm16(samples.astype(np.int16)),
                        {"width": None, "height": None,
                         "sample_rate": 16000, "n_frames": None},
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


# --------------------------------------------------------------------------
# Perceptual image hashing (r7): dHash (gradient hash) and pHash
# (integer-DCT hash) over the REAL decoders, + banded Hamming near-dup
# pairs — the multimodal tier of the dedup family.  Everything below is
# integer arithmetic end-to-end (nearest-neighbour resize by floor index
# mapping, integer DCT matrix, integer median), so results are exact,
# engine-independent, and SQL-replayable.
# --------------------------------------------------------------------------


def _nn_resize(px: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Nearest-neighbour resize by floor index mapping (r_i = i*h//rows,
    c_j = j*w//cols) — the deterministic integer stand-in for the
    area-interpolated resize a PIL-based pHash uses; any monotone
    downsample works for hashing as long as both compare sides use the
    same one."""
    h, w = px.shape
    ri = (np.arange(rows, dtype=np.int64) * h) // rows
    cj = (np.arange(cols, dtype=np.int64) * w) // cols
    return px[np.ix_(ri, cj)].astype(np.int64)


def dhash64(px: np.ndarray) -> int:
    """64-bit difference hash (Krawetz's dHash, public algorithm): resize
    to 8 rows x 9 cols, bit (i,j) = T[i,j] > T[i,j+1], packed row-major
    (bit index i*8+j).  Returned as the two's-complement int64 (bit 63
    set -> negative), matching Spark's LongType."""
    t = _nn_resize(px, 8, 9)
    bits = (t[:, :-1] > t[:, 1:]).astype(np.uint64)
    h = int((bits.reshape(-1) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return h - (1 << 64) if h >= (1 << 63) else h


_PHASH_DCT = None


def _phash_dct_matrix() -> np.ndarray:
    """Integer DCT-II basis, D[u,x] = floor(64*cos((2x+1)*u*pi/64) + 0.5),
    32x32 int64.  cos(k*pi/64) is never an exact odd multiple of 1/128
    (it is rational only at 0, ±1/2, ±1), so the +0.5 floor has no
    half-way ties and every engine derives the identical matrix."""
    global _PHASH_DCT
    if _PHASH_DCT is None:
        x = np.arange(32, dtype=np.float64)
        u = np.arange(32, dtype=np.float64)[:, None]
        _PHASH_DCT = np.floor(
            64.0 * np.cos((2.0 * x + 1.0) * u * np.pi / 64.0) + 0.5
        ).astype(np.int64)
    return _PHASH_DCT


def phash64(px: np.ndarray) -> int:
    """63-bit perceptual hash (pHash family, public algorithm): resize to
    32x32, 2-D integer DCT (C = D @ T @ D^T, all int64 — max |C| is
    ~1.1e9, far inside the range), keep the low-frequency top-left 8x8
    block minus the DC term (63 coefficients), threshold each against
    the integer median (sorted[31] of 63).  Bit p = u*8+v-1; bit 63 is
    never set, so the value is a non-negative int64."""
    t = _nn_resize(px, 32, 32)
    d = _phash_dct_matrix()
    c = d @ t @ d.T
    block = c[:8, :8].reshape(-1)[1:]  # drop DC
    med = int(np.sort(block)[31])
    bits = (block > med).astype(np.uint64)
    return int((bits << np.arange(63, dtype=np.uint64)).sum(dtype=np.uint64))


def _decode_any(rec) -> np.ndarray:
    """Magic-sniffed decode shared with extract_features: BMP and PNG via
    the real parsers, WAV as a 1xn grid, anything else the documented
    deterministic stub."""
    head = bytes(rec.payload[:8]) if rec.payload is not None else b""
    if head[:2] == b"BM":
        return decode_bmp(rec.payload)
    if head == _PNG_SIG:
        return decode_png(rec.payload)
    if head[:4] == b"RIFF":
        samples, _rate = decode_wav(rec.payload)
        return np.atleast_2d(samples)
    return _fake_decode(rec.payload, int(rec.meta["width"]), int(rec.meta["height"]))


HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("hash64", T.LongType(), False),
    ]
)

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("peak", T.LongType(), False),
        T.StructField("sum_abs", T.LongType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("max_window_energy", T.LongType(), False),
    ]
)


def audio_features(media: DataFrame, window: int = 16) -> DataFrame:
    """(media_id, n_samples, peak, sum_abs, energy, zero_crossings,
    max_window_energy) — EXACT integer acoustic features of PCM16 WAV
    payloads, decoded by the real RIFF parser (``decode_wav``; mono
    clips; multi-channel flattens frame-major, matching the raw data
    chunk order).

    All features are int64 reductions, so an external oracle can replay
    them bit-for-bit from the synthetic sample formula:

    * ``peak`` = max |s|; ``sum_abs`` = Σ|s|; ``energy`` = Σ s²
      (PCM16 keeps Σ s² < 2^31 per million samples — far inside int64);
    * ``zero_crossings`` = #{i : (s_i < 0) ≠ (s_{i+1} < 0)} — the
      classic voiced/unvoiced and noisiness discriminator, with the
      deterministic sign(0) = + convention;
    * ``max_window_energy`` = max over NON-OVERLAPPING ``window``-sample
      blocks (last block partial) of Σ s² — the loudest-moment feature.

    Same 100 TB shape as ``extract_features``: one Arrow-batched
    map-only pass, partition-parallel, no shuffle.
    """
    if window <= 0:
        raise ValueError("window must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rec in pdf.itertuples():
                samples, _rate = decode_wav(rec.payload)
                s = samples.reshape(-1).astype(np.int64)
                n = s.size
                neg = s < 0
                zc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
                sq = s * s
                mwe = 0
                for k in range(0, n, window):
                    mwe = max(mwe, int(sq[k : k + window].sum()))
                out.append(
                    (
                        int(rec.media_id),
                        n,
                        int(np.abs(s).max()) if n else 0,
                        int(np.abs(s).sum()),
                        int(sq.sum()),
                        zc,
                        mwe,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_samples",
                    "peak",
                    "sum_abs",
                    "energy",
                    "zero_crossings",
                    "max_window_energy",
                ],
            )

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


def image_hashes(media: DataFrame, algo: str = "dhash") -> DataFrame:
    """(media_id, hash64) — perceptual hash per image, decode + hash in
    one Arrow-batched pass (mapInPandas, partition-parallel, no shuffle;
    the same 100 TB shape as extract_features)."""
    if algo not in ("dhash", "phash"):
        raise ValueError(f"unknown perceptual hash {algo!r}")
    fn = dhash64 if algo == "dhash" else phash64

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [(int(rec.media_id), fn(_decode_any(rec))) for rec in pdf.itertuples()]
            yield pd.DataFrame(out, columns=["media_id", "hash64"])

    return media.mapInPandas(run, schema=HASH_SCHEMA)


def image_near_dup(
    media: DataFrame, algo: str = "dhash", max_hamming: int = 6
) -> DataFrame:
    """(media_a, media_b, hamming) — perceptual near-duplicate image
    pairs within ``max_hamming`` bits, via the same pigeonhole banded
    join as ops/dedup.py::simhash_pairs: split the 64-bit hash into
    ``max_hamming + 1`` chunks; any pair inside the budget agrees
    exactly on at least one chunk, so candidates come from an equi-join
    on (chunk_idx, chunk_value) — never a cartesian — and
    ``bit_count(xor)`` verifies exactly.  Scale shape: candidates are
    bounded by per-chunk-value collision counts (the LSH-band contract
    shared by the whole dedup family)."""
    from .dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        lambda: image_hashes(media, algo),
        key="media_id",
        sig="hash64",
        bits=64,
        max_hamming=max_hamming,
        out_a="media_a",
        out_b="media_b",
    )


def synthetic_media_bmp_pairs(spark: SparkSession, n: int) -> DataFrame:
    """Planted near-duplicate BMP fixture, built distributed: even ids
    are anchors, odd ids re-encode id-1's image with a sparse +60
    perturbation (flat index k where k % 37 == 0).  Pixel k of pair-base
    b = 2*(id//2): ``((b*1000003 + 12345 + k*(b*7919 + 104729)) %
    100003) % 256`` over (b%13+9) x (b%11+8) pixels — a per-image LCG
    over a large prime, so unrelated images have rich, independent hash
    bits (measured: twin dHash Hamming ≤ 4, unrelated ≥ 6) and the
    perturbation flips only the few bits whose thumbnail samples it hits
    (a REAL near-dup, not an identical copy).  Pure modular arithmetic,
    so an independent SQL oracle re-derives every hash bit
    (entry_queries ``image_near_dup``)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                base = mid - (mid % 2)
                w = base % 13 + 9
                h = base % 11 + 8
                k = np.arange(w * h, dtype=np.int64)
                flat = ((base * 1000003 + 12345 + k * (base * 7919 + 104729)) % 100003) % 256
                if mid % 2 == 1:
                    flat = (flat + np.where(k % 37 == 0, 60, 0)) % 256
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
