"""Distributed convex hull: definitional correctness (a vertex iff NOT
in the convex hull of the other points — exact integer arithmetic),
CCW ordering, salt-level/composition invariance, degenerate groups."""

import pytest
from pyspark.sql import functions as F

from gregor_spark.operators.hull import convex_hull


def _lcg_pts(n, seed=0, world=10000):
    out = []
    for i in range(n):
        m1 = (i * 1103515245 + 12345 + seed) % 100003
        m2 = (i * 69069 + 54321 + seed) % 100003
        out.append((i % 4, m1 % world, m2 % world))
    return out


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _in_hull_of(p, others):
    """Exact p ∈ conv(others): inside some non-degenerate triangle
    (closed) or on some segment (Carathéodory in the plane)."""
    pts = list(others)
    n = len(pts)
    for i in range(n):
        a = pts[i]
        for j in range(i + 1, n):
            b = pts[j]
            if _cross(a, b, p) == 0 and min(a[0], b[0]) <= p[0] <= max(
                a[0], b[0]
            ) and min(a[1], b[1]) <= p[1] <= max(a[1], b[1]):
                return True
            for k in range(j + 1, n):
                c = pts[k]
                if _cross(a, b, c) == 0:
                    continue
                d1, d2, d3 = _cross(a, b, p), _cross(b, c, p), _cross(c, a, p)
                if (d1 >= 0 and d2 >= 0 and d3 >= 0) or (
                    d1 <= 0 and d2 <= 0 and d3 <= 0
                ):
                    return True
    return False


def _df(spark, rows):
    return spark.createDataFrame(rows, "zone_id long, x long, y long")


def test_hull_definitional_and_ccw(spark):
    rows = _lcg_pts(120)
    out = convex_hull(_df(spark, rows)).collect()
    by_zone = {}
    for r in out:
        by_zone.setdefault(r.zone_id, []).append((r.seq, r.x, r.y))
    pts_by_zone = {}
    for z, x, y in rows:
        pts_by_zone.setdefault(z, set()).add((x, y))
    for z, verts in by_zone.items():
        verts = [(x, y) for _, x, y in sorted(verts)]
        vset = set(verts)
        assert len(verts) == len(vset)
        pts = pts_by_zone[z]
        # definitional: output vertices are exactly the strict extremes
        for p in pts:
            expect_vertex = not _in_hull_of(p, pts - {p})
            assert (p in vset) == expect_vertex, (z, p)
        # CCW simple polygon: positive shoelace, all turns strictly left
        n = len(verts)
        assert n >= 3
        area2 = sum(
            verts[i][0] * verts[(i + 1) % n][1]
            - verts[(i + 1) % n][0] * verts[i][1]
            for i in range(n)
        )
        assert area2 > 0
        for i in range(n):
            assert _cross(verts[i], verts[(i + 1) % n], verts[(i + 2) % n]) > 0
        # starts at the lexicographic minimum
        assert verts[0] == min(verts)


@pytest.mark.parametrize("n_salt", [1, 3, 16])
def test_hull_salt_invariance(spark, n_salt):
    rows = _lcg_pts(200, seed=9)
    base = {
        (r.zone_id, r.seq, r.x, r.y)
        for r in convex_hull(_df(spark, rows), n_salt=16).collect()
    }
    got = {
        (r.zone_id, r.seq, r.x, r.y)
        for r in convex_hull(_df(spark, rows), n_salt=n_salt).collect()
    }
    assert got == base


def test_hull_degenerate_groups(spark):
    rows = (
        [(0, 5, 5)]                                   # single point
        + [(1, i, 2 * i) for i in range(6)]           # all collinear
        + [(2, 0, 0), (2, 4, 0), (2, 2, 0), (2, 2, 3), (2, 2, 3)]  # dup +
    )                                                  # collinear-on-edge
    out = convex_hull(_df(spark, rows)).collect()
    by_zone = {}
    for r in out:
        by_zone.setdefault(r.zone_id, []).append((r.seq, r.x, r.y))
    assert sorted(by_zone[0]) == [(0, 5, 5)]
    assert sorted((x, y) for _, x, y in by_zone[1]) == [(0, 0), (5, 10)]
    assert sorted((x, y) for _, x, y in by_zone[2]) == [(0, 0), (2, 3), (4, 0)]
