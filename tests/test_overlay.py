"""Segment overlay + snap-to-segment: parity against an independent
brute-force reference (pure-Python exact integer predicates / float
projection), exactly-once emission across cell boundaries, and the
long-segment guard."""

import math

import pytest
from pyspark.sql import functions as F

from gregor_spark.operators.overlay import segment_intersections, snap_to_segments


def _lcg_segs(n, mults, seed, world=20000, max_d=1500):
    # NOTE: the two layers need DIFFERENT multipliers — same-multiplier
    # LCG streams put both layers on parallel lattice lines (the classic
    # LCG hyperplane structure) and the layers barely ever cross
    c1, c2, c3, c4 = mults
    out = []
    for i in range(n):
        m1 = (i * c1 + 12345 + seed) % 100003
        m2 = (i * c2 + 54321 + seed) % 100003
        m3 = (i * c3 + 7 + seed) % 100003
        m4 = (i * c4 + 11 + seed) % 100003
        x1, y1 = m1 % world, m2 % world
        dx = (m3 % (2 * max_d + 1)) - max_d
        dy = (m4 % (2 * max_d + 1)) - max_d
        if dx == 0 and dy == 0:
            dy = 1
        out.append((i, x1, y1, x1 + dx, y1 + dy))
    return out


def _brute_intersections(A, B):
    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    got = {}
    for aid, ax1, ay1, ax2, ay2 in A:
        for bid, bx1, by1, bx2, by2 in B:
            d1 = cross(bx1, by1, bx2, by2, ax1, ay1)
            d2 = cross(bx1, by1, bx2, by2, ax2, ay2)
            d3 = cross(ax1, ay1, ax2, ay2, bx1, by1)
            d4 = cross(ax1, ay1, ax2, ay2, bx2, by2)
            if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0) and (
                (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0
            ):
                t = d1 / (d1 - d2)
                got[(aid, bid)] = (ax1 + t * (ax2 - ax1), ay1 + t * (ay2 - ay1))
    return got


def _seg_df(spark, rows, idc):
    return spark.createDataFrame(
        rows, f"{idc} long, x1 long, y1 long, x2 long, y2 long"
    )


def test_segment_intersections_brute_parity(spark):
    A = _lcg_segs(300, (1103515245, 69069, 48271, 16807), seed=0)
    B = _lcg_segs(300, (40692, 22695477, 134775813, 69621), seed=777)
    want = _brute_intersections(A, B)
    out = segment_intersections(
        _seg_df(spark, A, "a_id"), _seg_df(spark, B, "b_id"), cell=500
    ).collect()
    got = {(r.a_id, r.b_id): (r.px, r.py) for r in out}
    assert len(out) == len(got), "pair emitted more than once"
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
    assert len(want) > 50  # fixture actually exercises the predicate


def test_segment_intersections_exactly_once_across_cells(spark):
    # a long horizontal B crossed by verticals in DIFFERENT cells; with
    # cell=10 each pair shares many candidate cells — ownership must
    # emit each exactly once
    A = [(i, 5 + 10 * i, -50, 5 + 10 * i, 50) for i in range(8)]
    B = [(0, -100, 0, 200, 0)]
    out = segment_intersections(
        _seg_df(spark, A, "a_id"), _seg_df(spark, B, "b_id"), cell=10
    ).collect()
    assert sorted((r.a_id, r.b_id) for r in out) == [(i, 0) for i in range(8)]
    for r in out:
        assert r.py == 0.0 and r.px == pytest.approx(5 + 10 * r.a_id)


def test_segment_intersections_touch_and_collinear_excluded(spark):
    A = [(0, 0, 0, 10, 0),   # collinear overlap with B0
         (1, 5, 0, 5, 10)]   # endpoint ON B0 (touch, not proper)
    B = [(0, -5, 0, 20, 0)]
    out = segment_intersections(
        _seg_df(spark, A, "a_id"), _seg_df(spark, B, "b_id"), cell=50
    ).collect()
    assert out == []


def test_overlay_long_segment_guard(spark):
    A = [(0, 0, 0, 10_000_000, 0)]
    B = [(0, 1, -5, 1, 5)]
    with pytest.raises(Exception, match="max_cells_per_seg"):
        segment_intersections(
            _seg_df(spark, A, "a_id"), _seg_df(spark, B, "b_id"),
            cell=10, max_cells_per_seg=64,
        ).collect()


def _cells_hit_ref(seg, w):
    """Independent exact supercover reference: cell square [cx·w,(cx+1)·w]
    × [cy·w,(cy+1)·w] is hit iff the parameter interval where the segment
    lies inside it is nonempty — solved in exact rationals (Fractions),
    a completely different formulation from the engine's SAT test."""
    from fractions import Fraction as Fr

    _, x1, y1, x2, y2 = seg
    cells = set()
    cx_lo, cx_hi = min(x1, x2) // w, max(x1, x2) // w
    cy_lo, cy_hi = min(y1, y2) // w, max(y1, y2) // w
    for cx in range(cx_lo, cx_hi + 1):
        for cy in range(cy_lo, cy_hi + 1):
            lo, hi = Fr(0), Fr(1)
            ok = True
            for p0, dp, b0, b1 in (
                (x1, x2 - x1, cx * w, (cx + 1) * w),
                (y1, y2 - y1, cy * w, (cy + 1) * w),
            ):
                if dp == 0:
                    if not (b0 <= p0 <= b1):
                        ok = False
                        break
                else:
                    t0, t1 = Fr(b0 - p0, dp), Fr(b1 - p0, dp)
                    if t0 > t1:
                        t0, t1 = t1, t0
                    lo, hi = max(lo, t0), min(hi, t1)
            if ok and lo <= hi:
                cells.add((cx, cy))
    return cells


def test_rasterize_lines_exact_reference_parity(spark):
    from gregor_spark.operators.overlay import rasterize_lines

    segs = _lcg_segs(150, (1103515245, 69069, 48271, 16807), seed=5)
    # plus adversarial exact-touch cases: axis-aligned on cell borders,
    # diagonal through a corner, zero-length on a corner
    segs += [
        (1000, 500, 0, 500, 900),     # vertical ON a cell boundary
        (1001, 0, 250, 990, 250),     # horizontal crossing cells
        (1002, 0, 0, 750, 750),       # diagonal through corners
        (1003, 250, 250, 250, 250),   # degenerate point
        (1004, 500, 500, 500, 500),   # degenerate point ON a corner
    ]
    out = rasterize_lines(_seg_df(spark, segs, "seg_id"), cell=250).collect()
    got = {}
    for r in out:
        got.setdefault(r.seg_id, set()).add((r.cx, r.cy))
    for seg in segs:
        assert got.get(seg[0], set()) == _cells_hit_ref(seg, 250), seg


def test_rasterize_lines_plan_is_map_only(spark):
    from gregor_spark.operators.overlay import rasterize_lines

    segs = _lcg_segs(10, (1103515245, 69069, 48271, 16807), seed=1)
    plan = rasterize_lines(
        _seg_df(spark, segs, "seg_id"), cell=250
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle: explode + filter only


def _brute_snap(pts, segs, radius):
    best = {}
    for pid, px, py in pts:
        cands = []
        for sid, x1, y1, x2, y2 in segs:
            lx, ly = x2 - x1, y2 - y1
            len2 = lx * lx + ly * ly
            if len2 > 0:
                t = min(max(((px - x1) * lx + (py - y1) * ly) / len2, 0.0), 1.0)
            else:
                t = 0.0
            sx, sy = x1 + t * lx, y1 + t * ly
            d2 = (px - sx) ** 2 + (py - sy) ** 2
            if d2 <= radius * radius:
                cands.append((d2, sid, sx, sy))
        if cands:
            best[pid] = min(cands)
    return best


def test_snap_to_segments_brute_parity(spark):
    segs = _lcg_segs(250, (1103515245, 69069, 48271, 16807), seed=31337)
    pts = []
    for i in range(400):
        m1 = (i * 22695477 + 1) % 100003
        m2 = (i * 134775813 + 1) % 100003
        pts.append((i, m1 % 20000, m2 % 20000))
    want = _brute_snap(pts, segs, radius=500.0)
    pdf = spark.createDataFrame(pts, "point_id long, x long, y long")
    out = snap_to_segments(
        pdf, _seg_df(spark, segs, "seg_id"), radius=500.0, cell=500
    ).collect()
    got = {r.point_id: (r.d2, r.seg_id, r.sx, r.sy) for r in out}
    assert len(out) == len(got)
    assert set(got) == set(want)
    assert len(want) > 100
    for pid, (d2, sid, sx, sy) in want.items():
        gd2, gsid, gsx, gsy = got[pid]
        assert gsid == sid, pid
        assert (gd2, gsx, gsy) == pytest.approx((d2, sx, sy), abs=1e-9)


def test_snap_zero_length_segment_and_tiebreak(spark):
    # two zero-length "segments" equidistant from the point — the
    # (d2, seg_id) lexicographic min must pick the smaller id
    segs = [(5, 10, 0, 10, 0), (3, -10, 0, -10, 0)]
    pts = [(0, 0, 0)]
    out = snap_to_segments(
        spark.createDataFrame(pts, "point_id long, x long, y long"),
        _seg_df(spark, segs, "seg_id"),
        radius=20.0,
        cell=20,
    ).collect()
    assert len(out) == 1 and out[0].seg_id == 3 and out[0].d2 == 100.0


def test_seg_intersections_grid_line_crossings(spark):
    """r8 ADVICE regression: crossings whose intersection point lies
    EXACTLY on a cell boundary (axis-parallel segment lying on a grid
    line) must be owned by exactly one cell and never dropped."""
    from gregor_spark.operators.overlay import segment_intersections

    cell = 500
    # vertical B exactly on the x=500 grid line; horizontal A segments
    # crossing it at integer y values, several on y-grid lines too
    a_rows = [
        (i, 100, y, 900, y) for i, y in enumerate(range(0, 2600, 250))
    ]
    b_rows = [(0, 500, -100, 500, 2700)]
    a = spark.createDataFrame(
        a_rows, "a_id long, x1 long, y1 long, x2 long, y2 long"
    )
    b = spark.createDataFrame(
        b_rows, "b_id long, x1 long, y1 long, x2 long, y2 long"
    )
    out = segment_intersections(a, b, cell).collect()
    # every horizontal strictly crosses B once (endpoints at y -100/2700
    # are beyond every A's y, Ax range 100..900 strictly brackets 500)
    assert len(out) == len(a_rows)
    assert {(r["a_id"], r["b_id"]) for r in out} == {
        (i, 0) for i in range(len(a_rows))
    }
    for r in out:
        assert r["px"] == 500.0
