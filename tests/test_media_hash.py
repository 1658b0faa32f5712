"""Perceptual image hashing (r7): dHash/pHash integer kernels vs
independent brute references, and the banded Hamming near-dup join vs an
exhaustive pair scan — the multimodal tier of the dedup family
(ops/media.py::dhash64/phash64/image_near_dup)."""

import numpy as np
import pytest

from gregor_spark.ops.media import (
    _nn_resize,
    dhash64,
    decode_bmp,
    image_hashes,
    image_near_dup,
    make_bmp_gray24,
    phash64,
    synthetic_media_bmp_pairs,
)

RNG = np.random.RandomState(77)


# ----------------------------------------------------- independent brutes


def _brute_dhash(px):
    """Loop-wise dHash from the published spec, independent of the
    vectorized kernel (explicit index mapping, per-bit shifts)."""
    h, w = px.shape
    t = [[int(px[(i * h) // 8, (j * w) // 9]) for j in range(9)] for i in range(8)]
    out = 0
    for i in range(8):
        for j in range(8):
            if t[i][j] > t[i][j + 1]:
                out |= 1 << (i * 8 + j)
    return out - (1 << 64) if out >= (1 << 63) else out


def _brute_phash(px):
    """Loop-wise integer-DCT pHash: triple-loop DCT (no matmul), explicit
    median via sorted list."""
    import math

    h, w = px.shape
    t = [[int(px[(i * h) // 32, (j * w) // 32]) for j in range(32)] for i in range(32)]
    d = [
        [math.floor(64.0 * math.cos((2 * x + 1) * u * math.pi / 64.0) + 0.5)
         for x in range(32)]
        for u in range(32)
    ]
    coeff = []
    for u in range(8):
        for v in range(8):
            if u == 0 and v == 0:
                continue
            s = 0
            for x in range(32):
                for y in range(32):
                    s += d[u][x] * t[x][y] * d[v][y]
            coeff.append(s)
    med = sorted(coeff)[31]
    out = 0
    for p, c in enumerate(coeff):
        if c > med:
            out |= 1 << p
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dhash_matches_brute(seed):
    rng = np.random.RandomState(seed)
    for _ in range(20):
        h, w = rng.randint(8, 40), rng.randint(9, 40)
        px = rng.randint(0, 256, size=(h, w)).astype(np.int64)
        assert dhash64(px) == _brute_dhash(px)


def test_phash_matches_brute():
    for seed in range(3):
        rng = np.random.RandomState(seed)
        h, w = rng.randint(8, 64), rng.randint(9, 64)
        px = rng.randint(0, 256, size=(h, w)).astype(np.int64)
        assert phash64(px) == _brute_phash(px)


def test_phash_of_constant_image_is_zero():
    """Flat image: every AC coefficient is 0, median 0, no strict
    exceedance — hash 0 (and never negative: bit 63 unused)."""
    assert phash64(np.full((16, 16), 137, dtype=np.int64)) == 0
    assert phash64(np.zeros((9, 9), dtype=np.int64)) == 0


def test_hashes_survive_bmp_roundtrip():
    """bytes -> decode -> hash equals hashing the source pixels (the
    decoder is lossless for 24-bit gray BMP)."""
    px = RNG.randint(0, 256, size=(13, 17)).astype(np.uint8)
    blob = make_bmp_gray24(px)
    back = decode_bmp(blob)
    assert np.array_equal(back, px)
    assert dhash64(back.astype(np.int64)) == dhash64(px.astype(np.int64))
    assert phash64(back.astype(np.int64)) == phash64(px.astype(np.int64))


def test_nn_resize_degenerate_sizes():
    """Images smaller than the target grid repeat pixels (floor mapping
    stays in range) — no crash, deterministic."""
    px = np.arange(6, dtype=np.int64).reshape(2, 3)
    t = _nn_resize(px, 8, 9)
    assert t.shape == (8, 9)
    assert t.min() >= 0 and t.max() <= 5


# -------------------------------------------------------- Spark-side join


def test_image_near_dup_equals_brute_pairs(spark):
    """The banded Hamming join returns EXACTLY the exhaustive-scan pairs
    (pigeonhole guarantee), and every planted twin is found."""
    media = synthetic_media_bmp_pairs(spark, 60)
    got = {
        (r["media_a"], r["media_b"]): r["hamming"]
        for r in image_near_dup(media, algo="dhash", max_hamming=6).collect()
    }
    hashes = {r["media_id"]: r["hash64"] for r in image_hashes(media, "dhash").collect()}
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            hd = bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1")
            if hd <= 6:
                want[(a, b)] = hd
    assert got == want
    for a in range(0, 60, 2):  # every planted twin pair surfaces
        assert (a, a + 1) in got, f"planted twin ({a},{a+1}) missed"


def test_image_near_dup_phash_twins(spark):
    """pHash (structure-sensitive) also pairs most planted twins while
    keeping unrelated images far apart on this fixture."""
    media = synthetic_media_bmp_pairs(spark, 40)
    hashes = {r["media_id"]: r["hash64"] for r in image_hashes(media, "phash").collect()}
    twin = [bin(hashes[a] ^ hashes[a + 1]).count("1") for a in range(0, 40, 2)]
    other = [
        bin(hashes[a] ^ hashes[b]).count("1")
        for a in range(40)
        for b in range(a + 1, 40)
        if not (b == a + 1 and a % 2 == 0)
    ]
    assert sorted(twin)[len(twin) // 2] <= 12   # median twin distance small
    assert min(other) > 10                      # unrelated images far


def test_image_hashes_rejects_unknown_algo(spark):
    media = synthetic_media_bmp_pairs(spark, 4)
    with pytest.raises(ValueError):
        image_hashes(media, "ahash")
