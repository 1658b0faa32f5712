"""Polygon-ring column functions: shoelace area, centroid, perimeter —
pure Catalyst array expressions (zip_with / aggregate folds), no Python.

These operate on a RING TABLE representation — one row per ring,
``xs: array<double>, ys: array<double>`` (open rings: first vertex not
repeated) — which is the distributed form of a polygon layer at scale
(the driver-side ZoneSet is the small-layer twin).  The fold order of
``F.aggregate`` is sequential and therefore deterministic, with a
DuckDB twin via ``list_reduce(list_prepend(0.0, ...))`` (the kmeans
oracle idiom), so results are engine-exact whenever the vertex
arithmetic is (e.g. dyadic-rational coordinates — exactly the fixture
discipline geo/kernels.py relies on).

Centroid formula (standard shoelace moments): Cx = Σ(x_i + x_{i+1})·
cross_i / (6·A_signed) with cross_i = x_i·y_{i+1} − x_{i+1}·y_i —
winding-independent because numerator and denominator flip sign
together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _rot(a: Column) -> Column:
    """Array rotated left by one: (a2..an, a1) — pairs each vertex with
    its successor, wrapping."""
    n = F.size(a)
    return F.concat(F.slice(a, 2, n - 1), F.slice(a, 1, 1))


def _fold_sum(terms: Column) -> Column:
    """Sequential left fold — deterministic order; DuckDB twin:
    list_reduce(list_prepend(0.0, terms), (x, y) -> x + y)."""
    return F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)


def _cross(xs: Column, ys: Column) -> Column:
    """Per-edge cross terms x_i·y_{i+1} − x_{i+1}·y_i."""
    t1 = F.zip_with(xs, _rot(ys), lambda a, b: a * b)
    t2 = F.zip_with(_rot(xs), ys, lambda a, b: a * b)
    return F.zip_with(t1, t2, lambda a, b: a - b)


def ring_signed_area(xs: Column, ys: Column) -> Column:
    """Shoelace signed area (positive = counter-clockwise)."""
    return F.lit(0.5) * _fold_sum(_cross(xs, ys))


def ring_centroid_x(xs: Column, ys: Column) -> Column:
    num = F.zip_with(
        F.zip_with(xs, _rot(xs), lambda a, b: a + b),
        _cross(xs, ys),
        lambda s, c: s * c,
    )
    return _fold_sum(num) / (F.lit(6.0) * ring_signed_area(xs, ys))


def ring_centroid_y(xs: Column, ys: Column) -> Column:
    num = F.zip_with(
        F.zip_with(ys, _rot(ys), lambda a, b: a + b),
        _cross(xs, ys),
        lambda s, c: s * c,
    )
    return _fold_sum(num) / (F.lit(6.0) * ring_signed_area(xs, ys))


def ring_perimeter(xs: Column, ys: Column) -> Column:
    dx = F.zip_with(xs, _rot(xs), lambda a, b: b - a)
    dy = F.zip_with(ys, _rot(ys), lambda a, b: b - a)
    return _fold_sum(
        F.zip_with(dx, dy, lambda a, b: F.sqrt(a * a + b * b))
    )


def ring_geodesic_signed_area_m2(xs: Column, ys: Column) -> Column:
    """Signed spherical ring area in m² — the Chamberlain & Duquette
    (1989, NGS) spherical-excess formula used by turf.js/geographiclib's
    fast path:  A = R²/2 · Σ_edges radians(λ₂−λ₁)·(2 + sin φ₁ + sin φ₂).
    Positive for counter-clockwise rings (matching the planar shoelace
    sign), exact enough for zone-layer extents; callers wanting
    ellipsoidal precision reproject.  Pure fold — same interpreted-HOF
    note as the planar metrics: zone layers are driver-sized."""
    t = F.zip_with(
        F.zip_with(xs, _rot(xs), lambda a, b: F.radians(b - a)),
        F.zip_with(
            ys,
            _rot(ys),
            lambda a, b: F.lit(2.0) + F.sin(F.radians(a)) + F.sin(F.radians(b)),
        ),
        lambda dl, s: dl * s,
    )
    # the raw Chamberlain–Duquette sum is NEGATIVE for counter-clockwise
    # rings; negate so the sign convention matches the planar shoelace
    return _fold_sum(t) * F.lit(-(R_EARTH_KM * R_EARTH_KM * 1e6 / 2.0))


def ring_geodesic_perimeter_km(xs: Column, ys: Column) -> Column:
    """Great-circle ring perimeter in km — per-edge haversine fold
    (same constants and clamp as :func:`haversine_km`)."""
    edges = F.arrays_zip(
        xs.alias("ax"), ys.alias("ay"), _rot(xs).alias("bx"), _rot(ys).alias("by")
    )
    return _fold_sum(
        F.transform(
            edges,
            lambda e: haversine_km(e["ax"], e["ay"], e["bx"], e["by"]),
        )
    )


# ---------------------------------------------------- point-in-polygon
#
# Catalyst-expression twins of the numpy PIP kernels (geo/kernels.py:
# points_strictly_inside / on_boundary_masks / claims_raster_cell,
# ring-list variants) — the broadcast assign path's hot loop with NO
# Python in it: a zone travels as one array<struct<xs, ys, hole>>
# column and the whole even-odd + boundary + west-wall evaluation is a
# nested fold (aggregate over rings, aggregate over edges) inside
# whole-stage codegen.  Semantics notes mirrored from the kernels:
#   * even-odd parity across ALL rings (holes/multiparts fall out);
#   * boundary epsilon 1e-9 with per-edge scale (cross / max(|dx|,|dy|,1));
#   * west wall = vertical edge whose polygon interior is +x of it
#     (ccw XOR hole flips the side), excluded for raster-cell claims;
#   * claim rule: (inside AND NOT on_boundary) OR (on_boundary AND NOT
#     on_west_wall).

_EPS = 1e-9


def _edges(xs: Column, ys: Column) -> Column:
    """array<struct<ax, ay, bx, by>> of ring edges (wrapping)."""
    return F.arrays_zip(
        xs.alias("ax"), ys.alias("ay"), _rot(xs).alias("bx"), _rot(ys).alias("by")
    )


def _ring_state(px: Column, py: Column, xs: Column, ys: Column, ccw: Column):
    """struct<i, a, w>: even-odd parity, on-any-boundary, on-west-wall
    for ONE ring — a single fold over the edge array.

    ``ccw`` is the ring's effective interior orientation —
    ``(signed_area > 0) XOR hole`` — passed in precomputed: for literal
    zone layers it is a CONSTANT, and deriving it here would splice a
    whole signed-area fold into every edge step (measured: pushes the
    expression tree from O(edges) to O(edges²) per point per ring)."""

    def step(acc, e):
        ax, ay, bx, by = e["ax"], e["ay"], e["bx"], e["by"]
        # ray cast (horizontal edges: cond is false; xint's /0 yields
        # inf/nan which the AND masks out — ANSI off)
        cond = (ay > py) != (by > py)
        xint = ax + (py - ay) * (bx - ax) / (by - ay)
        crossed = cond & (px < xint)
        # boundary: |cross| <= eps * scale, inside the eps-padded bbox
        inbox = (
            (px >= F.least(ax, bx) - F.lit(_EPS))
            & (px <= F.greatest(ax, bx) + F.lit(_EPS))
            & (py >= F.least(ay, by) - F.lit(_EPS))
            & (py <= F.greatest(ay, by) + F.lit(_EPS))
        )
        cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        scale = F.greatest(F.abs(bx - ax), F.abs(by - ay), F.lit(1.0))
        on_seg = inbox & (F.abs(cross) <= F.lit(_EPS) * scale)
        going_down = by < ay
        interior_right = F.when(ccw, going_down).otherwise(~going_down)
        is_west = (ax == bx) & (ay != by) & interior_right
        return F.struct(
            (acc["i"] != crossed).alias("i"),
            (acc["a"] | on_seg).alias("a"),
            (acc["w"] | (on_seg & is_west)).alias("w"),
        )

    init = F.struct(
        F.lit(False).alias("i"), F.lit(False).alias("a"), F.lit(False).alias("w")
    )
    return F.aggregate(_edges(xs, ys), init, step)


def point_zone_state(px: Column, py: Column, rings: Column) -> Column:
    """struct<i, a, w> across a ring-list zone column
    (``array<struct<xs: array<double>, ys: array<double>, ccw:
    boolean>>`` — ``ccw`` = (signed_area > 0) XOR hole, precomputed):
    parity XORs over rings, boundary masks OR."""

    def step(acc, r):
        s = _ring_state(px, py, r["xs"], r["ys"], r["ccw"])
        return F.struct(
            (acc["i"] != s["i"]).alias("i"),
            (acc["a"] | s["a"]).alias("a"),
            (acc["w"] | s["w"]).alias("w"),
        )

    init = F.struct(
        F.lit(False).alias("i"), F.lit(False).alias("a"), F.lit(False).alias("w")
    )
    return F.aggregate(rings, init, step)


def _once(state: Column, fn) -> Column:
    """Evaluate ``state`` ONCE and feed it to ``fn`` — the one-element
    array+transform let-binding idiom.  Without it, every field
    reference re-splices the entire nested PIP fold into the plan
    (Catalyst has no subexpression sharing across lambda boundaries;
    measured 4x tree blowup on the claim rule)."""
    return F.transform(F.array(state), fn)[0]


def point_claims_zone(px: Column, py: Column, rings: Column) -> Column:
    """Raster-assignment claim (kernels.claims_raster_cell_rings twin):
    interior off-boundary, or boundary that is not a west wall."""
    return _once(
        point_zone_state(px, py, rings),
        lambda s: (s["i"] & ~s["a"]) | (s["a"] & ~s["w"]),
    )


def point_within_zone(px: Column, py: Column, rings: Column) -> Column:
    """Strict interior (kernels.points_within_rings twin): odd parity
    and not on any ring boundary."""
    return _once(point_zone_state(px, py, rings), lambda s: s["i"] & ~s["a"])


# ------------------------------------------------------------ geodesic

R_EARTH_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km (haversine on the mean sphere) —
    pure codegen trig, no UDF.  sqrt is clamped to 1.0 before asin so
    antipodal float noise cannot produce NaN."""
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    h = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlmb / 2)
        * F.sin(dlmb / 2)
    )
    return F.lit(2.0 * R_EARTH_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))
