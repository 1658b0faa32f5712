"""Geohash encode/decode as pure column expressions (zero Python).

Geohash (Niemeyer 2008; the de-facto interchange key for spatial
bucketing) is a base32 rendering of interleaved lon/lat bisection bits,
longitude first.  That makes it a Morton code in disguise, so the
encoder reuses the engine's magic-mask bit-spread ladders
(operators/spatial_join.py::_part1by1_col) inside whole-stage codegen —
no UDF, no per-row Python, and every op is replayable in a SQL oracle.

Bit layout for ``chars`` characters (n = 5·chars bits): counting from
the MSB, bits alternate lon, lat, lon, …  Counting from the LSB that
means lon occupies the ODD positions when n is even and the EVEN
positions when n is odd — both cases are one spread-shift-or.

Canonical public test vectors (Wikipedia's): (42.605, −5.603) →
``ezs42``; (57.64911, 10.40744) → ``u4pruydqqvj`` — asserted in tests
for both parities.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.spatial_join import _compact1by1_col, _part1by1_col

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _axis_bits(coord: Column, origin: float, extent: float, nbits: int) -> Column:
    t = F.floor((coord - F.lit(origin)) / F.lit(extent) * F.lit(float(1 << nbits)))
    return F.least(
        F.greatest(t.cast("long"), F.lit(0)), F.lit((1 << nbits) - 1)
    )


def geohash_int(lon: Column, lat: Column, chars: int = 8) -> Column:
    """The n = 5·chars interleaved bits as a long (chars ≤ 12)."""
    if not 1 <= chars <= 12:
        raise ValueError("chars must be in [1, 12]")
    n = 5 * chars
    nlon = (n + 1) // 2
    nlat = n // 2
    bl = _part1by1_col(_axis_bits(lon, -180.0, 360.0, nlon))
    bt = _part1by1_col(_axis_bits(lat, -90.0, 180.0, nlat))
    if n % 2 == 0:  # MSB is lon → lon sits on odd LSB positions
        return F.shiftleft(bl, 1).bitwiseOR(bt)
    return bl.bitwiseOR(F.shiftleft(bt, 1))  # odd n → lon on even positions


def geohash_col(lon: Column, lat: Column, chars: int = 8) -> Column:
    """The geohash STRING of ``chars`` base32 characters."""
    g = geohash_int(lon, lat, chars)
    alpha = F.lit(ALPHABET)
    parts = [
        F.substring(
            alpha,
            (
                F.shiftrightunsigned(g, 5 * (chars - 1 - i)).bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
            1,
        )
        for i in range(chars)
    ]
    return F.concat(*parts)


def geohash_decode_cols(gh: Column, chars: int = 8) -> tuple[Column, Column]:
    """(lon, lat) CELL-CENTER columns decoded from a geohash string of
    known length — the exact inverse of the encoder's floor-snap up to
    the half-cell offset."""
    if not 1 <= chars <= 12:
        raise ValueError("chars must be in [1, 12]")
    alpha = F.lit(ALPHABET)
    g = F.lit(0).cast("long")
    for i in range(chars):
        idx = (F.instr(alpha, F.substring(gh, i + 1, 1)) - F.lit(1)).cast("long")
        g = F.shiftleft(g, 5).bitwiseOR(idx)
    n = 5 * chars
    nlon = (n + 1) // 2
    nlat = n // 2
    if n % 2 == 0:
        bl = _compact1by1_col(F.shiftrightunsigned(g, 1))
        bt = _compact1by1_col(g)
    else:
        bl = _compact1by1_col(g)
        bt = _compact1by1_col(F.shiftrightunsigned(g, 1))
    lon = F.lit(-180.0) + (bl.cast("double") + F.lit(0.5)) * F.lit(360.0) / F.lit(
        float(1 << nlon)
    )
    lat = F.lit(-90.0) + (bt.cast("double") + F.lit(0.5)) * F.lit(180.0) / F.lit(
        float(1 << nlat)
    )
    return lon, lat
