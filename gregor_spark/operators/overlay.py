"""Vector-vector overlay primitives: segment-segment intersection and
snap-to-nearest-segment (map-matching) joins.

The reference engine stops at polygon↔raster/point transforms
(/root/reference/src/gregor/disaggregate.py, aggregate.py); line-layer
overlay is the missing vector-vector tier a GIS user hits next
(st_intersection / nearest-feature in PostGIS terms).  Both operators
here are grid-blocked equi-joins — the segment sibling of
operators/knn.py::within_distance_join — never a nested-loop join:

* each segment enumerates the grid cells its bounding box overlaps
  (two codegen ``sequence`` explodes, O(ceil(len/cell))² rows per
  segment, guarded by ``max_cells_per_seg``);
* candidates meet through a hash equi-join on the cell key (one
  shuffle per side, AQE skew-join splits hot cells);
* an EXACT integer orientation predicate (cross products of int64
  micro-unit coordinates — no epsilon, no floating error) decides
  intersection, and floating math only enters afterwards, to emit the
  intersection point / projection from already-qualified pairs.

Exactly-once semantics without a ``distinct``: a pair that shares
several candidate cells is reported only by the cell that CONTAINS the
intersection point (for crossings) — ownership is a post-join filter,
so no second shuffle.

Scale contract (100 TB): per-segment work is bounded by segment length
over cell width — callers pre-split polylines into bounded segments
(the standard tiling discipline); both joins are then one partial-agg
shuffle + one equi-join regardless of corpus size.  Long segments fail
loudly via ``max_cells_per_seg`` instead of silently exploding.

Coordinates are int64 micro-units.  Overflow audit: the orientation
cross products are products of coordinate DIFFERENCES — callers keep
|coord| ≤ ~1e9 so the products stay ≤ ~4e18 < 2^63 (the contract
fixtures use ≤ 21k-unit worlds, far inside the bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cells_for_bbox(df: DataFrame, w: int, ring: int, max_cells: int,
                    x1: str, y1: str, x2: str, y2: str) -> DataFrame:
    """Explode rows over the grid cells of their (ring-dilated) segment
    bounding box: adds ``_cx``/``_cy``.  Pure codegen (sequence +
    explode); raises via ``raise_error`` when a segment would cover more
    than ``max_cells`` cells (pre-split it instead)."""
    cxmin = F.floor(F.least(F.col(x1), F.col(x2)) / F.lit(w)).cast("long") - ring
    cxmax = F.floor(F.greatest(F.col(x1), F.col(x2)) / F.lit(w)).cast("long") + ring
    cymin = F.floor(F.least(F.col(y1), F.col(y2)) / F.lit(w)).cast("long") - ring
    cymax = F.floor(F.greatest(F.col(y1), F.col(y2)) / F.lit(w)).cast("long") + ring
    ncells = (cxmax - cxmin + 1) * (cymax - cymin + 1)
    # the guard lives INSIDE the sequence bound (not a dropped side
    # column Catalyst would prune away — the ops/temporal.py lesson): an
    # over-long segment evaluates raise_error before the generator can
    # materialize its cell array
    stop_x = F.when(ncells <= F.lit(max_cells), cxmax).otherwise(
        F.raise_error(
            F.lit(
                f"segment covers more than max_cells_per_seg={max_cells} "
                "grid cells — pre-split long segments or widen `cell`"
            )
        ).cast("long")
    )
    return df.withColumn("_cx", F.explode(F.sequence(cxmin, stop_x))).withColumn(
        "_cy", F.explode(F.sequence(cymin, cymax))
    )


def segment_intersections(
    a_segs: DataFrame,
    b_segs: DataFrame,
    cell: int,
    id_a: str = "a_id",
    id_b: str = "b_id",
    max_cells_per_seg: int = 4096,
) -> DataFrame:
    """(a_id, b_id, px, py) — every PROPER crossing (strict interior
    intersection) between a segment of layer A and one of layer B,
    each pair exactly once.

    Inputs carry (id, x1, y1, x2, y2) with int64 coordinates.  The
    predicate is the classic four-orientation test — d1/d2 the B-line
    sides of A's endpoints, d3/d4 the A-line sides of B's — all in
    exact integer arithmetic, so the qualifying pair set is EXACT (the
    SQL oracle replays the identical products).  Collinear overlaps and
    endpoint touches are excluded by design (they have no unique
    intersection point; run the predicate with ≥ semantics downstream
    if touch-pairs are wanted).

    The intersection point (px, py) = A1 + t·(A2−A1) with
    t = d1/(d1−d2) evaluated in doubles AFTER the exact predicate —
    identical IEEE expression on both engines.  Exactly-once: the pair
    is emitted only by the grid cell containing (px, py).
    """
    w = int(cell)
    if w <= 0:
        raise ValueError("cell width must be positive")
    left = _cells_for_bbox(
        a_segs.select(
            F.col(id_a).alias("_aid"),
            F.col("x1").alias("_ax1"), F.col("y1").alias("_ay1"),
            F.col("x2").alias("_ax2"), F.col("y2").alias("_ay2"),
        ),
        w, 0, max_cells_per_seg, "_ax1", "_ay1", "_ax2", "_ay2",
    )
    right = _cells_for_bbox(
        b_segs.select(
            F.col(id_b).alias("_bid"),
            F.col("x1").alias("_bx1"), F.col("y1").alias("_by1"),
            F.col("x2").alias("_bx2"), F.col("y2").alias("_by2"),
        ),
        w, 0, max_cells_per_seg, "_bx1", "_by1", "_bx2", "_by2",
    )
    j = left.join(right, ["_cx", "_cy"])

    def cross(ox, oy, px_, py_, qx, qy):
        return (F.col(px_) - F.col(ox)) * (F.col(qy) - F.col(oy)) - (
            F.col(py_) - F.col(oy)
        ) * (F.col(qx) - F.col(ox))

    d1 = cross("_bx1", "_by1", "_bx2", "_by2", "_ax1", "_ay1")
    d2 = cross("_bx1", "_by1", "_bx2", "_by2", "_ax2", "_ay2")
    d3 = cross("_ax1", "_ay1", "_ax2", "_ay2", "_bx1", "_by1")
    d4 = cross("_ax1", "_ay1", "_ax2", "_ay2", "_bx2", "_by2")
    proper = (
        ((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
        & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0))
    )
    q = j.where(proper).withColumn("_t", d1.cast("double") / (d1 - d2).cast("double"))
    px = F.col("_ax1") + F.col("_t") * (F.col("_ax2") - F.col("_ax1"))
    py = F.col("_ay1") + F.col("_t") * (F.col("_ay2") - F.col("_ay1"))
    q = q.withColumn("px", px).withColumn("py", py)
    # Ownership in EXACT arithmetic (r8, ADVICE fix): the true point is
    # the int64 rational N/D with D = d1−d2 ≠ 0 under `proper`, so the
    # owning cell is floor(N / (D·w)) exactly.  The float-derived floor
    # is only a ±1 candidate — when the crossing lies exactly on a grid
    # line (every crossing of an axis-parallel segment ON a grid line),
    # rounding yields e.g. 499.99999999999994 and floor lands one cell
    # low, a cell outside the partner's bbox explode, silently dropping
    # the pair (~20% of configurations in the ADVICE simulation).  The
    # candidate is corrected by exact integer comparison against
    # c·(D·w) ≤ N < (c+1)·(D·w), sign-normalized so D·w > 0.
    d_raw = d1 - d2
    neg = d_raw < 0
    den = F.when(neg, -d_raw).otherwise(d_raw)

    def exact_own(c_float, n1, delta):
        n_raw = n1 * d_raw + d1 * delta
        n = F.when(neg, -n_raw).otherwise(n_raw)
        m = den * F.lit(w)
        c0 = F.floor(c_float / F.lit(float(w))).cast("long")
        lo_ok = c0 * m <= n
        hi_ok = n < (c0 + F.lit(1)) * m
        return (
            F.when(lo_ok & hi_ok, c0)
            .when(~lo_ok, c0 - F.lit(1))
            .otherwise(c0 + F.lit(1))
        )

    own_cx = exact_own(F.col("px"), F.col("_ax1"), F.col("_ax2") - F.col("_ax1"))
    own_cy = exact_own(F.col("py"), F.col("_ay1"), F.col("_ay2") - F.col("_ay1"))
    own = (own_cx == F.col("_cx")) & (own_cy == F.col("_cy"))
    return q.where(own).select(
        F.col("_aid").alias(id_a), F.col("_bid").alias(id_b), "px", "py"
    )


def rasterize_lines(
    segs: DataFrame,
    cell: int,
    seg_id: str = "seg_id",
    max_cells_per_seg: int = 4096,
) -> DataFrame:
    """(seg_id, cx, cy) — every grid cell whose CLOSED square the
    segment touches (supercover rasterization; the vector→raster
    companion of operators/terrain.py's raster ops and the exact
    inverse-shape of marching-squares contours).

    ENTIRELY codegen, zero shuffle, zero Python: explode the segment's
    bbox cells (bounded by ``max_cells_per_seg``), then keep cells by
    the exact integer separating-axis test — the bbox explode already
    settles the x and y axes, and the remaining axis (the segment's
    normal) passes iff the cell's four corners do not lie strictly on
    one side of the segment's line:

        min over corners of cross(p1, p2, corner) ≤ 0 ≤ max(...)

    Closed-square convention: corner/edge touches count (consistent in
    the SQL oracle).  This is the map-only 100 TB shape — per-segment
    work bounded by length/cell, no exchange anywhere.
    """
    w = int(cell)
    if w <= 0:
        raise ValueError("cell width must be positive")
    s = _cells_for_bbox(
        segs.select(
            F.col(seg_id).alias("_sid"),
            F.col("x1").alias("_x1"), F.col("y1").alias("_y1"),
            F.col("x2").alias("_x2"), F.col("y2").alias("_y2"),
        ),
        w, 0, max_cells_per_seg, "_x1", "_y1", "_x2", "_y2",
    )
    dx = F.col("_x2") - F.col("_x1")
    dy = F.col("_y2") - F.col("_y1")

    def corner_cross(cx_off: int, cy_off: int):
        px = (F.col("_cx") + F.lit(cx_off)) * F.lit(w)
        py = (F.col("_cy") + F.lit(cy_off)) * F.lit(w)
        return dx * (py - F.col("_y1")) - dy * (px - F.col("_x1"))

    crosses = [corner_cross(a, b) for a in (0, 1) for b in (0, 1)]
    hit = (F.least(*crosses) <= 0) & (F.greatest(*crosses) >= 0)
    return s.where(hit).select(
        F.col("_sid").alias(seg_id), F.col("_cx").alias("cx"), F.col("_cy").alias("cy")
    )


def snap_to_segments(
    pts: DataFrame,
    segs: DataFrame,
    radius: float,
    cell: int,
    point_id: str = "point_id",
    seg_id: str = "seg_id",
    max_cells_per_seg: int = 4096,
) -> DataFrame:
    """(point_id, seg_id, sx, sy, d2) — each point snapped to its
    NEAREST segment within ``radius`` (map-matching); points with no
    segment in range are dropped.

    Points keep their single grid cell; segments explode over their
    bounding-box cells dilated by ceil(radius/cell) rings, so every
    in-range (point, segment) pair meets EXACTLY once (the point's cell
    appears once in the segment's dilated rectangle) — no distinct.
    Point-to-segment distance uses the clamped-projection formula in
    doubles (t = clamp(dot/len², 0, 1), identical IEEE expression in
    the SQL oracle); zero-length segments degrade to point distance.
    The winner per point is the lexicographic minimum of
    (d2, seg_id) — a deterministic tie-break replayed by the oracle's
    ROW_NUMBER ordering.  One shuffle per side + one partial-agg min.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    w = int(cell)
    if w <= 0:
        raise ValueError("cell width must be positive")
    import math

    ring = int(math.ceil(float(radius) / w))
    p = pts.select(
        F.col(point_id).alias("_pid"),
        F.col("x").alias("_px"),
        F.col("y").alias("_py"),
        F.floor(F.col("x") / F.lit(w)).cast("long").alias("_cx"),
        F.floor(F.col("y") / F.lit(w)).cast("long").alias("_cy"),
    )
    s = _cells_for_bbox(
        segs.select(
            F.col(seg_id).alias("_sid"),
            F.col("x1").alias("_sx1"), F.col("y1").alias("_sy1"),
            F.col("x2").alias("_sx2"), F.col("y2").alias("_sy2"),
        ),
        w, ring, max_cells_per_seg, "_sx1", "_sy1", "_sx2", "_sy2",
    )
    j = p.join(s, ["_cx", "_cy"])
    lx = F.col("_sx2") - F.col("_sx1")
    ly = F.col("_sy2") - F.col("_sy1")
    len2 = lx * lx + ly * ly
    dot = (F.col("_px") - F.col("_sx1")) * lx + (F.col("_py") - F.col("_sy1")) * ly
    t = F.when(len2 > 0, F.least(F.greatest(dot / len2, F.lit(0.0)), F.lit(1.0))).otherwise(
        F.lit(0.0)
    )
    sx = F.col("_sx1") + t * lx
    sy = F.col("_sy1") + t * ly
    d2 = (F.col("_px") - sx) * (F.col("_px") - sx) + (F.col("_py") - sy) * (
        F.col("_py") - sy
    )
    cand = (
        j.withColumn("_sx", sx)
        .withColumn("_sy", sy)
        .withColumn("_d2", d2)
        .where(F.col("_d2") <= F.lit(float(radius) * float(radius)))
    )
    best = cand.groupBy("_pid").agg(
        F.min(F.struct(F.col("_d2"), F.col("_sid"), F.col("_sx"), F.col("_sy"))).alias(
            "_b"
        )
    )
    return best.select(
        F.col("_pid").alias(point_id),
        F.col("_b._sid").alias(seg_id),
        F.col("_b._sx").alias("sx"),
        F.col("_b._sy").alias("sy"),
        F.col("_b._d2").alias("d2"),
    )
