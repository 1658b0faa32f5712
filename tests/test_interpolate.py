"""IDW interpolation goldens: hand-computed weights on a tiny layout,
empty-cell NULLs, exactly-once pairing across block boundaries, and
parallelism invariance of the quantized sums."""

from pyspark.sql import functions as F

from gregor_spark.model.raster import uniform_proxy_df
from gregor_spark.operators.interpolate import IDW_EPS, IDW_SCALE, idw_to_grid


def _pts(spark, rows):
    return spark.createDataFrame(rows, "px double, py double, val double")


def _grid(spark, bounds, res):
    return uniform_proxy_df(spark, bounds, res).drop("value")


def test_idw_golden_two_points(spark):
    # 2x2 grid over [0,2]x[0,2]: centers (0.5,1.5),(1.5,1.5),(0.5,0.5),(1.5,0.5)
    g = _grid(spark, (0.0, 0.0, 2.0, 2.0), (2, 2))
    pts = _pts(spark, [(0.5, 1.5, 10.0), (0.9, 1.5, 20.0)])
    out = {(r.row, r.col): r
           for r in idw_to_grid(g, pts, radius=0.6,
                                px="px", py="py", value="val").collect()}

    # cell (0,0) center (0.5,1.5): point A at d2=0 (eps clamp), B at 0.4 away
    dxb = 0.5 - 0.9
    wa, wb = 1.0 / IDW_EPS, 1.0 / (dxb * dxb)
    num = round(10.0 * wa * IDW_SCALE) + round(20.0 * wb * IDW_SCALE)
    den = round(wa * IDW_SCALE) + round(wb * IDW_SCALE)
    r00 = out[(0, 0)]
    assert r00.n_pts == 2
    assert abs(r00.est - num / den) < 1e-9
    # cell (0,1) center (1.5,1.5): only B in range, right at the radius
    # edge — kept (<=).  est is ~20 only to quantization (num and den are
    # rounded separately), so compare against the quantized expectation.
    d2b = (1.5 - 0.9) ** 2
    nb = round(20.0 / d2b * IDW_SCALE)
    db = round(1.0 / d2b * IDW_SCALE)
    r01 = out[(0, 1)]
    assert r01.n_pts == 1 and abs(r01.est - nb / db) < 1e-12
    # bottom cells: nothing within 0.6
    assert out[(1, 0)].n_pts == 0 and out[(1, 0)].est is None
    assert out[(1, 1)].n_pts == 0 and out[(1, 1)].est is None


def test_idw_exactly_once_across_blocks(spark):
    # a point RIGHT on a block boundary (x = radius) must contribute
    # exactly once to each in-range cell, despite the x9 explode
    g = _grid(spark, (0.0, 0.0, 1.0, 1.0), (1, 1))  # one cell, center (0.5,0.5)
    pts = _pts(spark, [(0.25, 0.5, 7.0)])
    r = idw_to_grid(g, pts, radius=0.25, px="px", py="py", value="val").collect()[0]
    assert r.n_pts == 1 and abs(r.est - 7.0) < 1e-9


def test_idw_partition_invariance(spark):
    g = _grid(spark, (0.0, 0.0, 4.0, 4.0), (8, 8))
    rows = [((i * 37 % 100) / 25.0, (i * 61 % 100) / 25.0, float(1 + i % 9))
            for i in range(200)]
    pts = _pts(spark, rows)
    a = sorted(map(tuple, idw_to_grid(g, pts, radius=0.7, px="px", py="py", value="val").collect()))
    b = sorted(map(tuple, idw_to_grid(
        g.repartition(7), pts.repartition(11), radius=0.7, px="px", py="py", value="val").collect()))
    assert a == b  # integer-quantized sums: order-independent


def test_idw_brute_force_parity(spark):
    # independent quadratic check: same weights, no blocking
    g = _grid(spark, (0.0, 0.0, 4.0, 4.0), (4, 4))
    rows = [((i * 13 % 40) / 10.0, (i * 29 % 40) / 10.0, float(i % 5 + 1))
            for i in range(60)]
    pts = _pts(spark, rows)
    got = {(r.row, r.col): (r.n_pts, r.est)
           for r in idw_to_grid(g, pts, radius=0.9, px="px", py="py", value="val").collect()}
    centers = {(r.row, r.col): (r.x, r.y) for r in g.collect()}
    for (rc, (x, y)) in centers.items():
        num = den = n = 0
        for (px, py, v) in rows:
            d2 = (x - px) * (x - px) + (y - py) * (y - py)
            if d2 <= 0.9 * 0.9:
                n += 1
                num += round(v / max(d2, IDW_EPS) * IDW_SCALE)
                den += round(1.0 / max(d2, IDW_EPS) * IDW_SCALE)
        want = num / den if den else None
        assert got[rc][0] == n, rc
        if want is None:
            assert got[rc][1] is None, rc
        else:
            assert abs(got[rc][1] - want) < 1e-12, rc


def test_kde_golden_and_empty(spark):
    from gregor_spark.operators.interpolate import kde_to_grid

    g = _grid(spark, (0.0, 0.0, 2.0, 2.0), (2, 2))
    pts = _pts(spark, [(0.5, 1.5, 10.0), (0.9, 1.5, 20.0)])
    out = {(r.row, r.col): r
           for r in kde_to_grid(g, pts, radius=0.6,
                                px="px", py="py", value="val").collect()}
    r2 = 0.6 * 0.6
    # cell (0,0) center (0.5,1.5): A at d2=0 (K=1), B at d2=0.16
    ka, kb = 1.0, 1.0 - (0.5 - 0.9) ** 2 / r2
    den = (round(ka * IDW_SCALE) + round(kb * IDW_SCALE)) / IDW_SCALE
    wsum = (round(10.0 * ka * IDW_SCALE) + round(20.0 * kb * IDW_SCALE)) / IDW_SCALE
    r00 = out[(0, 0)]
    assert r00.n_pts == 2
    assert abs(r00.density - den) < 1e-12 and abs(r00.wsum - wsum) < 1e-12
    # cell (0,1): B exactly at the radius edge -> K = 0 (kept, zero weight)
    r01 = out[(0, 1)]
    assert r01.n_pts == 1 and r01.density == 0.0 and r01.wsum == 0.0
    # empty cells: density 0.0 (not NULL), wsum NULL
    assert out[(1, 0)].n_pts == 0 and out[(1, 0)].density == 0.0
    assert out[(1, 0)].wsum is None


def test_kde_brute_force_parity(spark):
    from gregor_spark.operators.interpolate import kde_to_grid

    g = _grid(spark, (0.0, 0.0, 4.0, 4.0), (4, 4))
    rows = [((i * 13 % 40) / 10.0, (i * 29 % 40) / 10.0, float(i % 5 + 1))
            for i in range(60)]
    pts = _pts(spark, rows)
    r, r2 = 0.9, 0.81
    got = {(rr.row, rr.col): rr
           for rr in kde_to_grid(g, pts, radius=r, px="px", py="py", value="val").collect()}
    for gr in g.collect():
        den = ws = n = 0
        for (px, py, v) in rows:
            d2 = (gr.x - px) ** 2 + (gr.y - py) ** 2
            if d2 <= r2:
                n += 1
                k = 1.0 - d2 / r2
                den += round(k * IDW_SCALE)
                ws += round(v * k * IDW_SCALE)
        rr = got[(gr.row, gr.col)]
        assert rr.n_pts == n
        assert abs(rr.density - den / IDW_SCALE) < 1e-12
        if n:
            assert abs(rr.wsum - ws / IDW_SCALE) < 1e-12
        else:
            assert rr.wsum is None
