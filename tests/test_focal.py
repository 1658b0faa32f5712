"""Focal-stats goldens: hand-computed 3x3 windows with edge truncation,
nodata exclusion, 5x5 windows, brute-force parity on a random grid, and
parallelism invariance."""

import numpy as np
import pytest

from gregor_spark.model.raster import RasterMeta, raster_df
from gregor_spark.operators.focal import focal_stats


def _meta(h, w):
    return RasterMeta(width=w, height=h, origin_x=0.0, origin_y=float(h), pixel=1.0)


def _brute(vals, size, nodata):
    h, w = vals.shape
    half = size // 2
    out = {}
    for r in range(h):
        for c in range(w):
            vs = [
                vals[rr, cc]
                for rr in range(max(0, r - half), min(h, r + half + 1))
                for cc in range(max(0, c - half), min(w, c + half + 1))
                if not np.isnan(vals[rr, cc])
                and (nodata is None or vals[rr, cc] != nodata)
            ]
            out[(r, c)] = vs
    return out


def test_focal_mean_3x3_golden(spark):
    vals = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    df = raster_df(spark, _meta(3, 3), vals)
    got = {(r.row, r.col): r for r in focal_stats(df, size=3).collect()}
    assert len(got) == 9
    # center: all nine cells
    assert got[(1, 1)].n_valid == 9 and got[(1, 1)].f_mean == 5.0
    # corner (0,0): window truncates to the 2x2 block {1,2,4,5}
    assert got[(0, 0)].n_valid == 4 and got[(0, 0)].f_mean == 3.0
    assert got[(0, 0)].f_min == 1.0 and got[(0, 0)].f_max == 5.0
    # edge (0,1): 2x3 block {1,2,3,4,5,6}
    assert got[(0, 1)].n_valid == 6 and got[(0, 1)].f_sum == 21.0


def test_focal_nodata_excluded_but_present(spark):
    vals = np.array([[1.0, 0.0], [0.0, 0.0]])
    df = raster_df(spark, _meta(2, 2), vals)
    got = {(r.row, r.col): r for r in focal_stats(df, size=3, nodata=0.0).collect()}
    # nodata cells still get rows; only the single valid value contributes
    assert len(got) == 4
    for rc in got:
        assert got[rc].n_valid == 1 and got[rc].f_mean == 1.0
    # all-nodata neighborhood -> n_valid 0, NULL stats
    vals2 = np.zeros((2, 2))
    got2 = focal_stats(
        raster_df(spark, _meta(2, 2), vals2), size=3, nodata=0.0
    ).collect()
    assert len(got2) == 4
    assert all(r.n_valid == 0 and r.f_mean is None and r.f_sum is None for r in got2)


def test_focal_even_size_rejected(spark):
    df = raster_df(spark, _meta(1, 1), np.ones((1, 1)))
    with pytest.raises(ValueError):
        focal_stats(df, size=2)


def test_focal_brute_force_parity_5x5(spark):
    rng = [(r, c, float((r * 31 + c * 17) % 13)) for r in range(9) for c in range(9)]
    vals = np.full((9, 9), np.nan)
    for r, c, v in rng:
        vals[r, c] = v
    df = raster_df(spark, _meta(9, 9), vals)
    got = {(r.row, r.col): r for r in focal_stats(df, size=5, nodata=3.0).collect()}
    want = _brute(vals, 5, 3.0)
    assert set(got) == set(want)
    for rc, vs in want.items():
        g = got[rc]
        assert g.n_valid == len(vs), rc
        if vs:
            assert g.f_sum == sum(vs) and g.f_min == min(vs) and g.f_max == max(vs)
            assert g.f_mean == sum(vs) / len(vs), rc
        else:
            assert g.f_sum is None and g.f_mean is None


def test_focal_partition_invariance(spark):
    vals = np.arange(64, dtype=float).reshape(8, 8) % 11
    df = raster_df(spark, _meta(8, 8), vals)
    a = sorted(map(tuple, focal_stats(df, size=3).collect()))
    b = sorted(map(tuple, focal_stats(df.repartition(13), size=3).collect()))
    assert a == b  # integer-valued doubles: exact sums at any parallelism


# ------------------------------------------------- focal majority (r6)


def _fm_brute(vals, size, nodata=None):
    h, w = vals.shape
    half = size // 2
    out = {}
    for r in range(h):
        for c in range(w):
            cnt = {}
            for dr in range(-half, half + 1):
                for dc in range(-half, half + 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < h and 0 <= cc < w and not np.isnan(vals[rr, cc]) \
                            and (nodata is None or vals[rr, cc] != nodata):
                        cnt[vals[rr, cc]] = cnt.get(vals[rr, cc], 0) + 1
            if not cnt:
                out[(r, c)] = (0, 0, None, None, None, None)
                continue
            maj = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            mino = min(cnt.items(), key=lambda kv: (kv[1], kv[0]))
            out[(r, c)] = (sum(cnt.values()), len(cnt),
                           maj[0], maj[1], mino[0], mino[1])
    return out


def test_focal_majority_golden_and_ties(spark):
    from gregor_spark.operators.focal import focal_majority

    # center window: four 1s, four 2s, one 3 -> tie 1 vs 2 -> SMALLEST (1)
    vals = np.array([
        [1.0, 2.0, 1.0],
        [2.0, 3.0, 2.0],
        [1.0, 2.0, 1.0],
    ])
    df = raster_df(spark, _meta(3, 3), vals).select("row", "col", "value")
    got = {(r["row"], r["col"]): r for r in focal_majority(df, 3).collect()}
    center = got[(1, 1)]
    assert center["n_valid"] == 9 and center["n_distinct"] == 3
    assert center["majority"] == 1.0 and center["majority_n"] == 4
    assert center["minority"] == 3.0 and center["minority_n"] == 1
    corner = got[(0, 0)]  # 2x2 window: 1,2,2,3 -> majority 2
    assert corner["n_valid"] == 4 and corner["majority"] == 2.0


def test_focal_majority_brute_parity_and_nodata(spark):
    from pyspark.sql import functions as F

    from gregor_spark.operators.focal import focal_majority

    n = 12
    vals = np.array(
        [[np.nan if (r * 7 + c * 13) % 23 == 0
          else float(((r * 31 + c * 17) % 97) % 4)
          for c in range(n)] for r in range(n)]
    )
    g = spark.range(n * n).select(
        (F.col("id") / n).cast("int").alias("row"),
        (F.col("id") % n).cast("int").alias("col"),
    )
    val = (((F.col("row") * 31 + F.col("col") * 17) % 97) % 4).cast("double")
    df = g.select(
        "row", "col",
        F.when((F.col("row") * 7 + F.col("col") * 13) % 23 == 0, None)
        .otherwise(val).alias("value"),
    )
    got = {(r["row"], r["col"]):
           (r["n_valid"], r["n_distinct"], r["majority"], r["majority_n"],
            r["minority"], r["minority_n"])
           for r in focal_majority(df, 3).collect()}
    assert got == _fm_brute(vals, 3)
    a = sorted(map(tuple, focal_majority(df, 5).collect()))
    b = sorted(map(tuple, focal_majority(df.repartition(9), 5).collect()))
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError):
        focal_majority(df, 4)
