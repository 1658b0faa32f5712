"""Golden tests for the pure-numpy geometry kernels — ported row-for-row
from the reference suite (/root/reference/test/test_belongs_to.py:13-50,
test_disaggregate.py, test_aggregate.py) via the decoded fixtures."""

import numpy as np
import pytest

from gregor_spark.geo import kernels as K
from gregor_spark.model import fixtures as FX


def _assign_matrix(zones):
    ids, xs, ys = FX.zones_arrays(zones)
    cells = FX.raster_long_form()
    px = np.array([c[2] for c in cells])
    py = np.array([c[3] for c in cells])
    got = K.assign_cells(px, py, ids, xs, ys)
    return got.reshape(4, 4)


def _golden_to_array(g):
    return np.array([[-1 if v is None else v for v in row] for row in g], dtype=np.int64)


def test_belongs_to_2x2():
    np.testing.assert_array_equal(
        _assign_matrix(FX.SEG_2X2), _golden_to_array(FX.GOLDEN_BELONGS_2X2)
    )


def test_belongs_to_3x3():
    np.testing.assert_array_equal(
        _assign_matrix(FX.SEG_3X3), _golden_to_array(FX.GOLDEN_BELONGS_3X3)
    )


def test_belongs_to_overlapping():
    np.testing.assert_array_equal(
        _assign_matrix(FX.SEG_OVERLAP), _golden_to_array(FX.GOLDEN_BELONGS_OVERLAP)
    )


def test_zonal_sums_2x2():
    assign = _assign_matrix(FX.SEG_2X2)
    for zid, want in FX.GOLDEN_ZONAL_SUM_2X2.items():
        got = FX.RASTER_VALUES[assign == zid].sum()
        assert got == pytest.approx(want)


def test_disaggregation_grid_2x2():
    """cell = zone_value(=2) * proxy / zone_norm, golden from
    test_disaggregate.py:18-23."""
    assign = _assign_matrix(FX.SEG_2X2)
    norms = np.array([FX.GOLDEN_ZONAL_SUM_2X2[z] for z in assign.ravel()]).reshape(4, 4)
    got = 2.0 * FX.RASTER_VALUES / norms
    np.testing.assert_allclose(got, FX.GOLDEN_DISAGG_2X2, atol=1e-8)
    # conservation invariant: coarsen(2,2).sum() == [[2,2],[2,2]]
    coarse = got.reshape(2, 2, 2, 2).sum(axis=(1, 3))
    np.testing.assert_allclose(coarse, np.full((2, 2), 2.0), atol=1e-8)


def test_points_within_assignment():
    """All 10 fixture points land in zones 0/2/3 (zone 1 empty), each in
    exactly one zone — the O4 cardinality assert (disaggregate.py:189-192)."""
    ids, xs, ys = FX.zones_arrays(FX.SEG_2X2)
    px = np.array([p[1] for p in FX.POINTS])
    py = np.array([p[2] for p in FX.POINTS])
    zid, hits = K.assign_points_within(px, py, ids, xs, ys)
    assert (hits == 1).all()
    assert set(zid.tolist()) == {0, 2, 3}


def test_point_disaggregation_conservation():
    ids, xs, ys = FX.zones_arrays(FX.SEG_2X2)
    values = {0: 1.0, 1: 3.0, 2: 5.0, 3: 7.0}
    px = np.array([p[1] for p in FX.POINTS])
    py = np.array([p[2] for p in FX.POINTS])
    w = np.array([p[3] for p in FX.POINTS])
    zid, _ = K.assign_points_within(px, py, ids, xs, ys)
    norms = {z: w[zid == z].sum() for z in set(zid.tolist())}
    disagg = np.array([values[z] * wi / norms[z] for z, wi in zip(zid, w)])
    assert disagg.sum() == pytest.approx(FX.GOLDEN_POINT_DISAGG_TOTAL)


def test_intersection_area():
    # unit squares overlapping by a quarter
    xs = np.array([0.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0])
    assert K.intersection_area_rect(xs, ys, 0.5, 0.5, 1.5, 1.5) == pytest.approx(0.25)
    assert K.intersection_area_rect(xs, ys, 2.0, 2.0, 3.0, 3.0) == 0.0
    # triangle half-covering a cell
    txs = np.array([0.0, 2.0, 0.0])
    tys = np.array([0.0, 0.0, 2.0])
    assert K.intersection_area_rect(txs, tys, 0.0, 0.0, 2.0, 2.0) == pytest.approx(2.0)


def test_signed_area_orientation():
    assert K.signed_area([0, 1, 1, 0], [0, 0, 1, 1]) == pytest.approx(1.0)  # CCW
    assert K.signed_area([0, 0, 1, 1], [0, 1, 1, 0]) == pytest.approx(-1.0)  # CW


def test_convex_clip_triangle_target():
    """polygon ∩ convex target: unit square ∩ right triangle = half."""
    sq_x = np.array([0.0, 1.0, 1.0, 0.0])
    sq_y = np.array([0.0, 0.0, 1.0, 1.0])
    tri_x = np.array([0.0, 1.0, 0.0])
    tri_y = np.array([0.0, 0.0, 1.0])
    assert K.intersection_area_convex(sq_x, sq_y, tri_x, tri_y) == pytest.approx(0.5)
    # CW clip ring normalizes to the same answer
    assert K.intersection_area_convex(sq_x, sq_y, tri_x[::-1], tri_y[::-1]) == pytest.approx(0.5)
    # disjoint
    assert K.intersection_area_convex(sq_x, sq_y, tri_x + 5, tri_y) == 0.0
    # convex clip of the overlap fixture polygons reproduces rect behavior
    from gregor_spark.model import fixtures as FX
    z = FX.SEG_OVERLAP[1]  # triangle
    a_rect = K.intersection_area_rect(np.asarray(z.xs), np.asarray(z.ys), -0.25, 9.75, 0.75, 10.75)
    box_x = np.array([-0.25, 0.75, 0.75, -0.25]); box_y = np.array([9.75, 9.75, 10.75, 10.75])
    a_conv = K.intersection_area_convex(np.asarray(z.xs), np.asarray(z.ys), box_x, box_y)
    assert a_conv == pytest.approx(a_rect)
