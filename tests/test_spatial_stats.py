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
