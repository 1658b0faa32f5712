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
