"""Horn gradients: analytic plane goldens, edge/nodata NULLs, numpy
brute-force parity, partition invariance."""

import numpy as np
import pytest

from gregor_spark.model.raster import RasterMeta, raster_df
from gregor_spark.operators.terrain import _HORN, slope_gradients


def _meta(h, w):
    return RasterMeta(width=w, height=h, origin_x=0.0, origin_y=float(h), pixel=1.0)


def _brute(vals, pixel, nodata=None):
    h, w = vals.shape
    out = {}
    for r in range(h):
        for c in range(w):
            sx = sy = 0.0
            n = 0
            for dr, dc, wx, wy in _HORN:
                rr, cc = r + dr, c + dc
                if 0 <= rr < h and 0 <= cc < w and not np.isnan(vals[rr, cc]) and (
                    nodata is None or vals[rr, cc] != nodata
                ):
                    n += 1
                    sx += vals[rr, cc] * wx
                    sy += vals[rr, cc] * wy
            if n == 8:
                out[(r, c)] = (n, sx / (8 * pixel), sy / (8 * pixel))
            else:
                out[(r, c)] = (n, None, None)
    return out


def test_slope_plane_golden(spark):
    # z = 2x + 3y (pixel 1): interior dzdx = 2, dzdy = 3, tan2 = 13
    vals = np.array([[2.0 * c + 3.0 * r for c in range(6)] for r in range(6)])
    df = raster_df(spark, _meta(6, 6), vals)
    got = {(r.row, r.col): r for r in slope_gradients(df, pixel=1.0).collect()}
    assert len(got) == 36
    for r in range(6):
        for c in range(6):
            g = got[(r, c)]
            if 1 <= r <= 4 and 1 <= c <= 4:
                assert g.n_nb == 8
                assert g.dzdx == 2.0 and g.dzdy == 3.0 and g.tan2_slope == 13.0
            else:
                assert g.n_nb < 8 and g.dzdx is None and g.tan2_slope is None


def test_slope_nodata_hole(spark):
    vals = np.full((5, 5), 7.0)
    vals[2, 2] = -1.0  # nodata
    df = raster_df(spark, _meta(5, 5), vals)
    got = {(r.row, r.col): r
           for r in slope_gradients(df, pixel=0.5, nodata=-1.0).collect()}
    # the 8 cells around the hole lose a neighbor -> NULL gradients
    for dr, dc, _, _ in _HORN:
        g = got[(2 + dr, 2 + dc)]
        assert g.n_nb == 7 and g.dzdx is None
    # on a 5x5 every interior cell is adjacent to the center hole
    assert got[(1, 1)].n_nb == 7


def test_slope_brute_force_parity(spark):
    vals = np.array(
        [[float((r * 31 + c * 17) % 13) for c in range(9)] for r in range(9)]
    )
    vals[3, 4] = 5.0
    df = raster_df(spark, _meta(9, 9), vals)
    got = {(r.row, r.col): (r.n_nb, r.dzdx, r.dzdy)
           for r in slope_gradients(df, pixel=2.0, nodata=5.0).collect()}
    want = _brute(vals, 2.0, nodata=5.0)
    assert got == want  # integer-valued DEM: exact equality incl. NULLs


def test_slope_rejects_bad_pixel(spark):
    df = raster_df(spark, _meta(1, 1), np.ones((1, 1)))
    with pytest.raises(ValueError):
        slope_gradients(df, pixel=0.0)


def test_slope_partition_invariance(spark):
    vals = np.arange(64, dtype=float).reshape(8, 8) % 9
    df = raster_df(spark, _meta(8, 8), vals)
    a = sorted(map(tuple, slope_gradients(df, pixel=1.0).collect()))
    b = sorted(map(tuple, slope_gradients(df.repartition(11), pixel=1.0).collect()))
    assert a == b
