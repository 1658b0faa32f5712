"""Inverse-distance-weighted (IDW) interpolation from a point layer onto
a raster grid.

Extension surface beyond the reference's §2 list: the reference moves
values between polygons, points, and rasters by containment
(disaggregate.py / aggregate.py); IDW is the standard way to turn a
SCATTERED point layer (sensor readings, survey sites) into a raster
when there is no zone geometry to apportion by.

Scale shape: never a nested loop.  Points are exploded into the 3×3
neighborhood of radius-sized blocks (×9 rows, map-only), the grid keys
its own block, and one equi-join on the block id — with the exact
distance test pushed into the join condition — bounds candidate pairs
by radius-local point density.  A LEFT join keeps empty cells (NULL
estimate), so the whole operator is one join + one groupBy.

Cross-engine determinism: per-neighbor contributions are quantized to
integers BEFORE summing (same trick as ops/trajectory.py — integer
sums are order-independent), and the weight function is 1/max(d², eps)
— no sqrt, no libm anywhere, so every float op is IEEE-exact-rounded
and a single-threaded oracle bit-matches any cluster run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: quantization scale for the weighted sums (see module docstring).
IDW_SCALE = 1_000_000
#: d² clamp: an exact point-on-grid-center hit would divide by zero and
#: a near-hit would overflow the quantized BIGINT sum; eps caps the
#: weight at 1/eps (documented "exact hit wins, capped" semantics).
IDW_EPS = 1e-6


def _radius_candidates(
    grid: DataFrame, points: DataFrame, radius: float, px: str, py: str, value: str
) -> DataFrame:
    """LEFT-join every grid cell to the points within ``radius`` of its
    center: points explode into the 3×3 neighborhood of radius-sized
    blocks (×9, map-only), the grid keys its own block, one equi-join on
    the block id with the exact d² test in the join condition.  Exposes
    ``_pv`` (point value, NULL for empty cells) and ``_d2``."""
    r2 = radius * radius

    def blk(c):
        return F.floor(c / F.lit(radius)).cast("long")

    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    pts = (
        points.select(
            F.col(px).alias("_px"),
            F.col(py).alias("_py"),
            F.col(value).alias("_pv"),
        )
        .withColumn("_ox", off)
        .withColumn("_oy", off)
        .select(
            (blk(F.col("_px")) + F.col("_ox")).alias("_bx"),
            (blk(F.col("_py")) + F.col("_oy")).alias("_by"),
            "_px",
            "_py",
            "_pv",
        )
    )
    g = grid.select(
        "row", "col", "x", "y", blk(F.col("x")).alias("_bx"), blk(F.col("y")).alias("_by")
    )
    dx = F.col("x") - F.col("_px")
    dy = F.col("y") - F.col("_py")
    d2 = dx * dx + dy * dy
    return g.join(
        pts, [g["_bx"] == pts["_bx"], g["_by"] == pts["_by"], d2 <= F.lit(r2)], "left"
    ).withColumn("_d2", d2)


def idw_to_grid(
    grid: DataFrame,
    points: DataFrame,
    radius: float,
    px: str = "x",
    py: str = "y",
    value: str = "value",
) -> DataFrame:
    """Interpolate ``points`` (px, py, value) onto ``grid`` (row, col,
    x, y): ``est`` = Σ v/max(d², eps) / Σ 1/max(d², eps) over points
    within ``radius`` of the cell center, NULL (with ``n_pts`` = 0) for
    cells with no point in range."""
    cand = _radius_candidates(grid, points, radius, px, py, value)
    d2 = F.col("_d2")
    wden = F.lit(1.0) / F.greatest(d2, F.lit(IDW_EPS))
    wnum = F.col("_pv") / F.greatest(d2, F.lit(IDW_EPS))
    agg = cand.groupBy("row", "col", "x", "y").agg(
        F.count("_pv").alias("n_pts"),
        F.sum(F.round(wnum * IDW_SCALE).cast("long")).alias("_num"),
        F.sum(
            F.when(F.col("_pv").isNotNull(), F.round(wden * IDW_SCALE).cast("long"))
        ).alias("_den"),
    )
    return agg.select(
        "row",
        "col",
        "x",
        "y",
        "n_pts",
        F.when(
            F.col("_den") > 0, F.col("_num").cast("double") / F.col("_den").cast("double")
        ).alias("est"),
    )


def kde_to_grid(
    grid: DataFrame,
    points: DataFrame,
    radius: float,
    px: str = "x",
    py: str = "y",
    value: str = "value",
) -> DataFrame:
    """Kernel density estimate of ``points`` on ``grid`` cell centers
    with the Epanechnikov kernel K(d) = 1 − d²/r² (the classic
    heat-map/hot-spot surface).  ``density`` = Σ K over points within
    ``radius`` (0.0 for empty cells — a density, not an interpolation,
    so no NULL), ``wsum`` = Σ v·K (NULL when no point is in range).

    The kernel is POLYNOMIAL — unlike a Gaussian there is no exp/libm
    call, so every term is IEEE-exact-rounded and a SQL oracle replays
    it bit-for-bit.  Same plumbing and determinism contract as
    ``idw_to_grid``: radius-block equi-join bounds candidates by local
    point density, per-neighbor terms quantized to integers before the
    sum (order-independent at any parallelism), one join + one groupBy.
    """
    r2 = radius * radius
    cand = _radius_candidates(grid, points, radius, px, py, value)
    k = F.lit(1.0) - F.col("_d2") / F.lit(r2)
    agg = cand.groupBy("row", "col", "x", "y").agg(
        F.count("_pv").alias("n_pts"),
        F.sum(
            F.when(F.col("_pv").isNotNull(), F.round(k * IDW_SCALE).cast("long"))
        ).alias("_kden"),
        F.sum(F.round(F.col("_pv") * k * IDW_SCALE).cast("long")).alias("_kw"),
    )
    return agg.select(
        "row",
        "col",
        "x",
        "y",
        "n_pts",
        (F.coalesce(F.col("_kden"), F.lit(0)).cast("double") / F.lit(float(IDW_SCALE))).alias(
            "density"
        ),
        (F.col("_kw").cast("double") / F.lit(float(IDW_SCALE))).alias("wsum"),
    )
