"""Geodesic ring metrics: independent-reference parity (pure Python
math over the same formulas written differently), orientation and hole
composition, and a known-value sanity check."""

import math

from pyspark.sql import functions as F

from gregor_spark.functions.geometry import (
    R_EARTH_KM,
    ring_geodesic_perimeter_km,
    ring_geodesic_signed_area_m2,
)


def _ref_area_m2(xs, ys):
    # independent formulation: explicit loop, radians precomputed;
    # negated so CCW is positive (planar shoelace convention)
    r_m = R_EARTH_KM * 1000.0
    tot = 0.0
    n = len(xs)
    for i in range(n):
        j = (i + 1) % n
        tot += math.radians(xs[j] - xs[i]) * (
            2.0 + math.sin(math.radians(ys[i])) + math.sin(math.radians(ys[j]))
        )
    return -tot * r_m * r_m / 2.0


def _ref_perim_km(xs, ys):
    tot = 0.0
    n = len(xs)
    for i in range(n):
        j = (i + 1) % n
        dphi = math.radians(ys[j] - ys[i])
        dlmb = math.radians(xs[j] - xs[i])
        h = math.sin(dphi / 2) ** 2 + math.cos(math.radians(ys[i])) * math.cos(
            math.radians(ys[j])
        ) * math.sin(dlmb / 2) ** 2
        tot += 2.0 * R_EARTH_KM * math.asin(min(1.0, math.sqrt(h)))
    return tot


def _run(spark, xs, ys):
    df = spark.createDataFrame(
        [(list(map(float, xs)), list(map(float, ys)))], "xs array<double>, ys array<double>"
    )
    r = df.select(
        ring_geodesic_signed_area_m2(F.col("xs"), F.col("ys")).alias("a"),
        ring_geodesic_perimeter_km(F.col("xs"), F.col("ys")).alias("p"),
    ).collect()[0]
    return r.a, r.p


def test_geodesic_reference_parity(spark):
    import pytest

    rings = [
        ((0.0, 1.0, 1.0, 0.0), (10.0, 10.0, 11.0, 11.0)),     # ccw-ish quad
        ((5.0, 5.5, 5.25), (40.0, 40.0, 40.5)),               # triangle
        ((-120.0, -119.0, -119.0, -120.0), (35.0, 35.0, 36.0, 36.0)),
    ]
    for xs, ys in rings:
        a, p = _run(spark, xs, ys)
        assert a == pytest.approx(_ref_area_m2(xs, ys), rel=1e-12)
        assert p == pytest.approx(_ref_perim_km(xs, ys), rel=1e-12)


def test_geodesic_known_value_and_orientation(spark):
    import pytest

    # 1°×1° quad at the equator ≈ (111.195 km)² ≈ 1.2364e10 m²
    xs, ys = (0.0, 1.0, 1.0, 0.0), (-0.5, -0.5, 0.5, 0.5)
    a, p = _run(spark, xs, ys)
    assert a == pytest.approx(1.2364e10, rel=2e-3)
    assert p == pytest.approx(4 * 111.195, rel=2e-3)
    # reversed orientation flips the sign, same magnitude
    a2, _ = _run(spark, xs[::-1], ys[::-1])
    assert a2 == pytest.approx(-a, rel=1e-12)
