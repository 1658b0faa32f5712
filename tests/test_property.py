"""Hypothesis property tests for the round-4 driver-side codecs and CRS
kernels — pure numpy surfaces, so hundreds of generated examples cost
milliseconds (the Spark operators keep their fixed-seed golden tests;
spinning a job per hypothesis example would be all overhead)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gregor_spark.model.raster import RasterMeta


# ------------------------------------------------------------------- BMP


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    from gregor_spark.ops.media import decode_bmp, make_bmp_gray24

    img = np.random.RandomState(seed).randint(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_bmp(make_bmp_gray24(img)), img)


# ------------------------------------------------------------------- WAV


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length(n, rate, seed):
    from gregor_spark.ops.media import decode_wav, make_wav_pcm16

    samples = (
        np.random.RandomState(seed).randint(-32768, 32768, n).astype(np.int16)
    )
    got, got_rate = decode_wav(make_wav_pcm16(samples, rate))
    assert got_rate == rate and np.array_equal(got, samples)


# --------------------------------------------------------------- GeoTIFF


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 30),
    h=st.integers(1, 30),
    pixel=st.floats(1e-4, 1e4, allow_nan=False),
    ox=st.floats(-1e6, 1e6, allow_nan=False),
    oy=st.floats(-1e6, 1e6, allow_nan=False),
    dtype=st.sampled_from(["f8", "f4", "u1", "u2", "i2", "i4"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_geotiff_roundtrip_any_profile(tmp_path_factory, w, h, pixel, ox, oy, dtype, seed):
    from gregor_spark.sources.geotiff import read_geotiff, write_geotiff

    rng = np.random.RandomState(seed)
    if dtype.startswith("f"):
        grid = rng.randn(h, w).astype(dtype).astype(np.float64)
    else:
        info = np.iinfo(np.dtype(dtype))
        grid = rng.randint(info.min, info.max + 1, (h, w)).astype(np.float64)
    meta = RasterMeta(
        width=w, height=h, origin_x=ox, origin_y=oy, pixel=pixel,
        crs="EPSG:4326", nodata=0.0,
    )
    p = str(tmp_path_factory.mktemp("gt") / "x.tif")
    write_geotiff(p, meta, grid, dtype=dtype)
    m2, g2 = read_geotiff(p)
    assert (m2.width, m2.height) == (w, h)
    assert m2.pixel == pytest.approx(pixel, rel=0, abs=0)  # stored as f64
    assert m2.origin_x == pytest.approx(ox, abs=1e-9 * max(1.0, abs(ox)))
    assert np.array_equal(g2, grid)


# ------------------------------------------------------------------- CRS


@settings(max_examples=80, deadline=None)
@given(
    crs=st.sampled_from(
        ["EPSG:3857", "EPSG:3035", "EPSG:3034", "EPSG:32633", "EPSG:25832"]
    ),
    lon=st.floats(3.0, 21.0, allow_nan=False),
    lat=st.floats(35.0, 70.0, allow_nan=False),
)
def test_crs_roundtrip_property(crs, lon, lat):
    from gregor_spark.geo.crs import reproject

    E, N = reproject(np.array([lon]), np.array([lat]), "EPSG:4326", crs)
    lon2, lat2 = reproject(E, N, crs, "EPSG:4326")
    assert abs(lon2[0] - lon) < 1e-8 and abs(lat2[0] - lat) < 1e-8


# --------------------------------------------------------------- GeoJSON


@settings(max_examples=40, deadline=None)
@given(
    n_parts=st.integers(1, 3),
    holed=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_geojson_roundtrip_multipart_property(n_parts, holed, seed):
    """Random disjoint rectangular parts (optionally each with a centered
    hole) survive serialize→parse with ring classification intact and
    every hole attached to a containing part."""
    from gregor_spark.model.zones import ZoneSet
    from gregor_spark.sources.geojson import (
        zoneset_from_geojson,
        zoneset_to_geojson,
    )

    rng = np.random.RandomState(seed)

    def box(x0, y0, wdt, hgt):
        return (
            np.array([x0, x0 + wdt, x0 + wdt, x0], dtype=np.float64),
            np.array([y0, y0, y0 + hgt, y0 + hgt], dtype=np.float64),
        )

    extra = []
    primary = None
    for p in range(n_parts):
        x0 = p * 100.0 + rng.uniform(0, 10)
        y0 = rng.uniform(0, 10)
        wdt, hgt = rng.uniform(8, 20), rng.uniform(8, 20)
        ext = box(x0, y0, wdt, hgt)
        rings = [(ext[0], ext[1], False)]
        if holed:
            hole = box(x0 + wdt * 0.3, y0 + hgt * 0.3, wdt * 0.3, hgt * 0.3)
            rings.append((hole[0], hole[1], True))
        if primary is None:
            primary = ext
            extra.extend(rings[1:])
        else:
            extra.extend(rings)
    zones = ZoneSet(
        np.array([0]), [primary[0]], [primary[1]], {0: 2.5},
        extra_rings=[extra] if extra else None,
    )
    back = zoneset_from_geojson(zoneset_to_geojson(zones), value_property="value")
    got = back.zone_rings(0)
    want = zones.zone_rings(0)
    assert sum(1 for *_x, hole in got if hole) == sum(
        1 for *_x, hole in want if hole
    )
    assert sum(1 for *_x, hole in got if not hole) == n_parts
    assert back.values[0] == 2.5
    # every ring survives as a point SET (part order may differ)
    def ring_keys(rings):
        return sorted(
            tuple(sorted(zip(map(float, rx), map(float, ry))))
            for rx, ry, _h in rings
        )

    assert ring_keys(got) == ring_keys(want)
