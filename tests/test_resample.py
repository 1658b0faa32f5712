"""Raster resampling goldens: nearest + bilinear vs an independent
numpy reference (hand-rolled here, not shared with the operator)."""

import math

import numpy as np
import pytest

from gregor_spark.model import fixtures as FX
from gregor_spark.model.raster import RasterMeta, collect_to_grid, raster_df
from gregor_spark.operators.resample import resample_raster

SRC_META = RasterMeta(**FX.RASTER_META)


def np_resample(src: np.ndarray, sm: RasterMeta, dm: RasterMeta, method: str):
    out = np.full((dm.height, dm.width), np.nan)
    for r in range(dm.height):
        for c in range(dm.width):
            x = dm.origin_x + (c + 0.5) * dm.pixel
            y = dm.origin_y - (r + 0.5) * dm.pixel
            if method == "nearest":
                sc = math.floor((x - sm.origin_x) / sm.pixel)
                sr = math.floor((sm.origin_y - y) / sm.pixel)
                if 0 <= sr < sm.height and 0 <= sc < sm.width:
                    out[r, c] = src[sr, sc]
                else:
                    out[r, c] = dm.nodata
            else:
                gx = (x - sm.origin_x) / sm.pixel - 0.5
                gy = (sm.origin_y - y) / sm.pixel - 0.5
                x0, y0 = math.floor(gx), math.floor(gy)
                fx, fy = gx - x0, gy - y0
                tot = 0.0
                for dy, dx in [(0, 0), (0, 1), (1, 0), (1, 1)]:
                    sc = min(max(x0 + dx, 0), sm.width - 1)
                    sr = min(max(y0 + dy, 0), sm.height - 1)
                    tot += src[sr, sc] * (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                out[r, c] = tot
    return out


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_identity_regrid_is_exact(spark, method):
    src = raster_df(spark, SRC_META, FX.RASTER_VALUES)
    out = resample_raster(spark, src, SRC_META, SRC_META, method=method)
    got = collect_to_grid(out, SRC_META)
    assert np.array_equal(got, FX.RASTER_VALUES)


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_matches_numpy_reference(spark, method):
    # deterministic non-trivial source grid, larger than the fixture
    sm = RasterMeta(width=9, height=7, origin_x=2.0, origin_y=5.0, pixel=0.25)
    vals = np.array(
        [[math.sin(3 * r + c) * 10 + r * c for c in range(9)] for r in range(7)]
    )
    # off-grid, different pixel size, partially outside the source
    dm = RasterMeta(
        width=13, height=6, origin_x=1.8, origin_y=5.1, pixel=0.21, nodata=-1.0
    )
    src = raster_df(spark, sm, vals)
    got = collect_to_grid(resample_raster(spark, src, sm, dm, method=method), dm)
    want = np_resample(vals, sm, dm, method)
    assert np.allclose(got, want, atol=1e-12), (got, want)


def test_nearest_out_of_bounds_gets_nodata(spark):
    dm = RasterMeta(
        width=7, height=5, origin_x=-0.5, origin_y=12.0, pixel=0.4, nodata=-9.0
    )
    src = raster_df(spark, SRC_META, FX.RASTER_VALUES)
    got = collect_to_grid(resample_raster(spark, src, SRC_META, dm, method="nearest"), dm)
    want = np_resample(FX.RASTER_VALUES, SRC_META, dm, "nearest")
    # meta carries nodata for the query; numpy reference uses dm.nodata too
    assert np.allclose(got, want)
    assert (got == -9.0).any()  # the fixture really exercises the OOB branch


def test_bilinear_conserves_constant_field(spark):
    # resampling a constant raster returns that constant (to float ULP:
    # c*(1-fx)·(1-fy) + ... re-rounds each product, so bit-exactness
    # only holds where fx=fy=0)
    sm = RasterMeta(width=5, height=5, origin_x=0.0, origin_y=5.0, pixel=1.0)
    dm = RasterMeta(width=11, height=9, origin_x=-0.3, origin_y=5.2, pixel=0.47)
    src = raster_df(spark, sm, np.full((5, 5), 3.25))
    got = collect_to_grid(resample_raster(spark, src, sm, dm, method="bilinear"), dm)
    assert np.allclose(got, np.full((9, 11), 3.25), atol=1e-12)


def test_warp_same_crs_equals_resample(spark):
    from gregor_spark.operators.resample import warp_raster

    dm = RasterMeta(width=5, height=4, origin_x=-0.3, origin_y=11.9, pixel=0.45)
    src = raster_df(spark, SRC_META, FX.RASTER_VALUES)
    a = collect_to_grid(resample_raster(spark, src, SRC_META, dm, "nearest"), dm)
    b = collect_to_grid(warp_raster(spark, src, SRC_META, dm, "nearest"), dm)
    assert np.array_equal(a, b)


def test_warp_mercator_roundtrip_nearest(spark):
    """Warp the fixture into WebMercator, then verify every in-bounds
    target against a driver-side inverse projection + numpy nearest."""
    from gregor_spark.geo.crs import reproject
    from gregor_spark.operators.resample import warp_raster

    dm = RasterMeta(
        width=9, height=9, origin_x=-60000.0, origin_y=1330000.0, pixel=28000.0,
        crs="EPSG:3857", nodata=-7.0,
    )
    src = raster_df(spark, SRC_META, FX.RASTER_VALUES)
    got = collect_to_grid(warp_raster(spark, src, SRC_META, dm, "nearest"), dm)
    sm = SRC_META
    saw_nodata = False
    for r in range(dm.height):
        for c in range(dm.width):
            mx = dm.origin_x + (c + 0.5) * dm.pixel
            my = dm.origin_y - (r + 0.5) * dm.pixel
            lon, lat = reproject(
                np.array([mx]), np.array([my]), "EPSG:3857", "EPSG:4326"
            )
            sc = math.floor((lon[0] - sm.origin_x) / sm.pixel)
            sr = math.floor((sm.origin_y - lat[0]) / sm.pixel)
            if 0 <= sr < sm.height and 0 <= sc < sm.width:
                assert got[r, c] == FX.RASTER_VALUES[sr, sc], (r, c)
            else:
                assert got[r, c] == -7.0, (r, c)
                saw_nodata = True
    assert saw_nodata  # the grid really overhangs the source


def test_warp_bilinear_runs_and_conserves_constant(spark):
    from gregor_spark.operators.resample import warp_raster

    sm = RasterMeta(width=6, height=6, origin_x=-0.25, origin_y=11.75, pixel=0.4)
    dm = RasterMeta(
        width=5, height=5, origin_x=10000.0, origin_y=1300000.0, pixel=20000.0,
        crs="EPSG:3857",
    )
    src = raster_df(spark, sm, np.full((6, 6), 2.5))
    got = collect_to_grid(warp_raster(spark, src, sm, dm, "bilinear"), dm)
    assert np.allclose(got, np.full((5, 5), 2.5), atol=1e-12)


def test_resample_nearest_golden(spark):
    """Direct registry-query golden for the window-tail rotation
    (entry_queries._WINDOW_TAIL): the nearest regrid of the 4x4 fixture
    onto the 7x5 overhang grid, checked cell-by-cell against an inline
    nearest lookup independent of the operator's join plan."""
    from gregor_spark.entry_queries import META, REGISTRY, _RS_NEAR

    rows = REGISTRY["resample_nearest"][0](spark, "/root/testdata/sf0.001").collect()
    src = FX.RASTER_VALUES
    dm = _RS_NEAR
    assert len(rows) == dm["height"] * dm["width"]
    for r in rows:
        sc = math.floor((r.x - META.origin_x) / META.pixel)
        sr = math.floor((META.origin_y - r.y) / META.pixel)
        if 0 <= sr < META.height and 0 <= sc < META.width:
            assert r.value == src[sr][sc], (r.row, r.col)
        else:
            assert r.value == dm["nodata"], (r.row, r.col)
