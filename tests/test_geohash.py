"""Geohash codec: canonical public vectors (both bit-parities), decode
roundtrip within half a cell, prefix-nesting property, validation."""

import pytest
from pyspark.sql import functions as F

from gregor_spark.functions.geohash import (
    geohash_col,
    geohash_decode_cols,
    geohash_int,
)


def _df(spark, pts):
    return spark.createDataFrame(pts, "lon double, lat double")


def test_canonical_vectors_even_and_odd(spark):
    df = _df(spark, [(-5.603, 42.605), (10.40744, 57.64911)])
    got5 = [r.g for r in df.select(geohash_col(F.col("lon"), F.col("lat"), 5)
                                   .alias("g")).collect()]
    assert got5[0] == "ezs42"              # Wikipedia's odd-parity example
    got11 = [r.g for r in df.select(geohash_col(F.col("lon"), F.col("lat"), 11)
                                    .alias("g")).collect()]
    assert got11[1] == "u4pruydqqvj"       # Wikipedia's 11-char example
    got8 = [r.g for r in df.select(geohash_col(F.col("lon"), F.col("lat"), 8)
                                   .alias("g")).collect()]
    assert got8[1].startswith("u4pruyd")   # even parity nests the odd prefix


def test_decode_roundtrip_half_cell(spark):
    pts = [(-5.603, 42.605), (10.40744, 57.64911), (179.9, -89.9), (-179.9, 89.9),
           (0.0, 0.0), (0.3333, -45.77)]
    df = _df(spark, pts)
    enc = df.select("lon", "lat",
                    geohash_col(F.col("lon"), F.col("lat"), 8).alias("g"))
    lon_c, lat_c = geohash_decode_cols(F.col("g"), 8)
    rows = enc.select("lon", "lat", lon_c.alias("lo"), lat_c.alias("la")).collect()
    cell_lon, cell_lat = 360.0 / (1 << 20), 180.0 / (1 << 20)
    for r in rows:
        assert abs(r.lo - r.lon) <= cell_lon / 2 + 1e-12
        assert abs(r.la - r.lat) <= cell_lat / 2 + 1e-12


def test_prefix_nesting(spark):
    """Every shorter geohash is a prefix of the longer one for the same
    point — the property spatial bucketing relies on (even lengths
    halve both axes uniformly; odd steps are asymmetric but prefixes
    still nest because each char refines the same bisection stream)."""
    df = _df(spark, [(10.40744, 57.64911), (-5.603, 42.605), (0.1, 0.2)])
    cols = [geohash_col(F.col("lon"), F.col("lat"), c).alias(f"g{c}")
            for c in (2, 4, 6, 8, 10, 12)]
    for r in df.select(*cols).collect():
        gs = [r[f"g{c}"] for c in (2, 4, 6, 8, 10, 12)]
        for a, b in zip(gs, gs[1:]):
            assert b.startswith(a)


def test_geohash_int_parity_layout(spark):
    # one full-lon cell at chars=1: n=5, lon gets 3 bits, lat 2
    df = _df(spark, [(-180.0, -90.0)])
    v = df.select(geohash_int(F.col("lon"), F.col("lat"), 1).alias("v")).collect()
    assert v[0].v == 0  # all-zero bisections → '0'


def test_geohash_rejects_bad_chars(spark):
    df = _df(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError):
        geohash_col(F.col("lon"), F.col("lat"), 0)
    with pytest.raises(ValueError):
        geohash_decode_cols(F.col("g"), 13)
