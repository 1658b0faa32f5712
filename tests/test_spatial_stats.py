"""Moran's I: analytic goldens (perfect checkerboard → −1, constant →
NULL), quantized brute-force parity vs an independent numpy replay
(pair-sum formulation, not the factored one), nodata exclusion, and
partition invariance."""

import numpy as np

from gregor_spark.model.raster import RasterMeta, raster_df
from gregor_spark.ops.spatial_stats import MORAN_SCALE, morans_i


def _meta(h, w):
    return RasterMeta(width=w, height=h, origin_x=0.0, origin_y=float(h), pixel=1.0)


def _brute(vals, nodata=None):
    """Independent replay via the PAIR-SUM definition with the same
    quantization: I = N/W * Σ_pairs q(devᵢ·devⱼ) / Σ q(devᵢ²)."""
    h, w = vals.shape
    pts = {
        (r, c): vals[r, c]
        for r in range(h)
        for c in range(w)
        if not np.isnan(vals[r, c]) and (nodata is None or vals[r, c] != nodata)
    }
    n = len(pts)
    mean = sum(pts.values()) / n
    num = den = wsum = 0
    for (r, c), x in pts.items():
        den += round((x - mean) * (x - mean) * MORAN_SCALE)
        s = 0.0
        nn = 0
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            if (r + dr, c + dc) in pts:
                nn += 1
                s += pts[(r + dr, c + dc)]
                wsum += 1
        # the operator quantizes the FACTORED per-cell cross term
        num += round((x - mean) * (s - nn * mean) * MORAN_SCALE)
    i = (n * num) / (wsum * den) if wsum and den else None
    return n, wsum, i


def test_moran_checkerboard_is_minus_one(spark):
    vals = np.array([[float((r + c) % 2) for c in range(6)] for r in range(6)])
    df = raster_df(spark, _meta(6, 6), vals)
    row = morans_i(df).collect()[0]
    assert row.n == 36 and row.w_sum == 2 * (2 * 6 * 5)
    assert abs(row.morans_i - (-1.0)) < 1e-4  # perfect dispersion


def test_moran_constant_surface_null(spark):
    df = raster_df(spark, _meta(4, 4), np.full((4, 4), 3.0))
    row = morans_i(df).collect()[0]
    assert row.n == 16 and row.morans_i is None  # zero variance


def test_moran_blocks_positive(spark):
    # two homogeneous halves -> strong positive autocorrelation
    vals = np.zeros((6, 6))
    vals[:, 3:] = 10.0
    row = morans_i(raster_df(spark, _meta(6, 6), vals)).collect()[0]
    assert row.morans_i > 0.7


def test_moran_brute_force_parity_with_nodata(spark):
    vals = np.array(
        [[float((r * 31 + c * 17) % 13) for c in range(8)] for r in range(8)]
    )
    df = raster_df(spark, _meta(8, 8), vals)
    got = morans_i(df, nodata=4.0).collect()[0]
    n, wsum, i = _brute(vals, nodata=4.0)
    assert (got.n, got.w_sum) == (n, wsum)
    assert abs(got.morans_i - i) < 1e-12


def test_moran_partition_invariance(spark):
    vals = np.arange(64, dtype=float).reshape(8, 8) % 7
    df = raster_df(spark, _meta(8, 8), vals)
    a = morans_i(df).collect()[0]
    b = morans_i(df.repartition(13)).collect()[0]
    assert tuple(a) == tuple(b)


# ------------------------------------------------------- Getis-Ord Gi*


def _gstar_brute(vals, nodata=None):
    """Independent numpy replay of Gi* (queen + self) with the same
    fixed op order as the operator."""
    h, w = vals.shape
    pts = {
        (r, c): vals[r, c]
        for r in range(h)
        for c in range(w)
        if not np.isnan(vals[r, c]) and (nodata is None or vals[r, c] != nodata)
    }
    n = len(pts)
    sx = sum(pts.values())
    sxx = sum(x * x for x in pts.values())
    xbar = sx / n
    s = np.sqrt(sxx / n - xbar * xbar)
    out = {}
    for (r, c) in pts:
        win = [
            pts[(r + dr, c + dc)]
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
            if (r + dr, c + dc) in pts
        ]
        w_i = len(win)
        s_nb = sum(win)
        tt = float(n * w_i - w_i * w_i) / (float(n) - 1.0)
        den = s * np.sqrt(tt)
        z = (s_nb - xbar * w_i) / den if den > 0 else None
        out[(r, c)] = (w_i, s_nb, z)
    return out


def test_getis_ord_brute_parity(spark):
    from gregor_spark.ops.spatial_stats import getis_ord_gstar

    vals = np.array(
        [[float((r * 31 + c * 17) % 13) for c in range(9)] for r in range(9)]
    )
    vals[4, 4] = 7.0
    df = raster_df(spark, _meta(9, 9), vals)
    got = {
        (r.row, r.col): (r.w_i, r.sum_nb, r.gi_z)
        for r in getis_ord_gstar(df, nodata=7.0).collect()
    }
    want = _gstar_brute(vals, nodata=7.0)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2], k
        if want[k][2] is None:
            assert got[k][2] is None, k
        else:
            # integer inputs → identical fixed-order float chain
            assert got[k][2] == want[k][2], k


def test_getis_ord_hot_and_cold_spots(spark):
    """A high block in a low field: block center is a hot spot
    (gi_z > 2), far-field cells are mildly cold (gi_z < 0)."""
    from gregor_spark.ops.spatial_stats import getis_ord_gstar

    vals = np.zeros((9, 9))
    vals[3:6, 3:6] = 10.0
    rows = {(r.row, r.col): r.gi_z
            for r in getis_ord_gstar(raster_df(spark, _meta(9, 9), vals)).collect()}
    assert rows[(4, 4)] > 2.0
    assert rows[(0, 0)] < 0.0
    assert rows[(4, 4)] > rows[(3, 3)] > rows[(0, 0)]


def test_getis_ord_constant_surface_null(spark):
    from gregor_spark.ops.spatial_stats import getis_ord_gstar

    vals = np.full((5, 5), 3.0)
    rows = getis_ord_gstar(raster_df(spark, _meta(5, 5), vals)).collect()
    assert len(rows) == 25 and all(r.gi_z is None for r in rows)


def test_getis_ord_partition_invariance(spark):
    from gregor_spark.ops.spatial_stats import getis_ord_gstar

    vals = np.arange(64, dtype=float).reshape(8, 8) % 11
    df = raster_df(spark, _meta(8, 8), vals)
    a = sorted(map(tuple, getis_ord_gstar(df).collect()))
    b = sorted(map(tuple, getis_ord_gstar(df.repartition(13)).collect()))
    assert a == b
