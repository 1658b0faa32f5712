"""Unit tests for the Morton cell index (hierarchy, roundtrip, polyfill)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gregor_spark.geo import cells as C
from gregor_spark.model import fixtures as FX

BOUNDS = (-0.25, 9.75, 1.75, 11.75)  # fixture extent


def test_morton_roundtrip():
    rng = np.random.RandomState(7)
    ix = rng.randint(0, 1 << 20, size=1000)
    iy = rng.randint(0, 1 << 20, size=1000)
    m = C.morton_encode(ix, iy)
    rx, ry = C.morton_decode(m)
    np.testing.assert_array_equal(rx, ix)
    np.testing.assert_array_equal(ry, iy)


@settings(max_examples=50, deadline=None)
@given(
    st.floats(-179.999, 179.999),
    st.floats(-89.999, 89.999),
    st.integers(1, C.MAX_RES),
)
def test_cell_contains_point(lon, lat, res):
    cid = C.cell(np.array([lon]), np.array([lat]), res)
    minx, miny, maxx, maxy = C.cell_bounds(cid)
    # epsilon: points within float-quantization distance of a tile edge may
    # land in the adjacent tile — harmless for covers (polyfill pads rects)
    assert minx[0] - 1e-9 <= lon <= maxx[0] + 1e-9
    assert miny[0] - 1e-9 <= lat <= maxy[0] + 1e-9
    assert int(C.cell_res(cid)[0]) == res


def test_parent_is_hierarchical():
    rng = np.random.RandomState(3)
    x = rng.uniform(-180, 180, 500)
    y = rng.uniform(-90, 90, 500)
    fine = C.cell(x, y, 12)
    coarse = C.cell(x, y, 8)
    np.testing.assert_array_equal(C.parent(fine, 8), coarse)
    # parent one step at a time agrees with direct truncation
    step = fine
    for r in range(11, 7, -1):
        step = C.parent(step)
        np.testing.assert_array_equal(step, C.cell(x, y, r))


def test_children_roundtrip():
    cid = int(C.cell(np.array([10.0]), np.array([20.0]), 5)[0])
    kids = C.children(cid)
    assert len(kids) == 4
    np.testing.assert_array_equal(C.parent(kids, 5), np.full(4, cid))


def test_neighbors_ring():
    # center cell away from edges: 3x3 Moore neighborhood
    cid = C.cell(np.array([0.0]), np.array([0.0]), 6)
    nbrs = C.neighbors(cid, ring=1)
    assert len(nbrs) == 9
    assert int(cid[0]) in nbrs.tolist()
    # corner cell: clipped
    corner = C.cell(np.array([-179.99]), np.array([-89.99]), 6)
    assert len(C.neighbors(corner, ring=1)) == 4


def test_polyfill_covers_zone_points():
    """Every point of a zone must land in a polyfill cell of that zone —
    the no-false-negative property the spatial hash join depends on."""
    rng = np.random.RandomState(11)
    for z in FX.SEG_2X2 + FX.SEG_OVERLAP:
        xs = np.asarray(z.xs)
        ys = np.asarray(z.ys)
        cover = set(C.polyfill(xs, ys, 6, BOUNDS).tolist())
        assert cover
        # sample interior points via rejection from the bbox
        from gregor_spark.geo import kernels as K

        minx, miny, maxx, maxy = K.polygon_bbox(xs, ys)
        px = rng.uniform(minx, maxx, 2000)
        py = rng.uniform(miny, maxy, 2000)
        inside = K.points_strictly_inside(px, py, xs, ys)
        pc = C.cell(px[inside], py[inside], 6, BOUNDS)
        assert set(pc.tolist()) <= cover


def test_polyfill_area_sane():
    """Cover of a fixture box is within the bbox tile count."""
    z = FX.SEG_2X2[0]
    cover = C.polyfill(np.asarray(z.xs), np.asarray(z.ys), 4, BOUNDS)
    # zone 0 is exactly the NW quadrant of the fixture extent: at res 4
    # that's an 8x8 block of tiles (plus boundary-touching ring)
    assert 64 <= len(cover) <= 81
