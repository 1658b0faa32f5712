"""Focal (moving-window) raster statistics: per-cell aggregates over a
k×k pixel neighborhood.

Extension surface beyond the reference's §2 list: the reference
aggregates rasters BY ZONE GEOMETRY (aggregate.py::aggregate_raster_to_polygon);
focal stats are the complementary raster-native smoothing/terrain
primitive (GDAL `gdal_proximity`/`r.neighbors`, xarray `rolling`).

Scale shape: never a windowed scan of a dense array.  Each VALID source
cell emits its value to the k² neighbor targets (map-only explode), every
original cell emits one identity marker, and ONE groupBy on the target
(row, col) folds count/sum/min/max — a single Exchange regardless of
window size, partitioned by cell key so a 100 TB raster distributes on
the same plan.  Phantom targets off the grid edge are dropped by the
identity marker (max(tag)), not by a second join back to the cell table.

Determinism: `f_sum`/`f_mean` are exact when cell values are
integer-valued (float64 addition of integers is associative below 2^53
— the contract fixture and tests use integer-valued doubles); for
general float rasters the sums carry last-ulp partition-order variance
like any distributed float sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def focal_stats(
    cells: DataFrame,
    size: int = 3,
    value: str = "value",
    nodata: float | None = None,
) -> DataFrame:
    """Per-cell neighborhood stats over ``cells(row, col, value)``: for
    every cell of the input (including nodata cells), aggregate the
    valid values in the centered ``size``×``size`` window —
    ``n_valid`` (0 for isolated nodata neighborhoods), ``f_sum`` /
    ``f_mean`` / ``f_min`` / ``f_max`` (NULL when ``n_valid`` = 0).
    ``nodata`` cells (and NULL values) contribute nothing but still get
    an output row, matching GDAL/r.neighbors edge semantics: windows
    truncate at the grid edge (no wraparound, no padding)."""
    if size < 1 or size % 2 == 0:
        raise ValueError(f"size must be odd and positive, got {size}")
    half = size // 2
    v = F.col(value)
    valid = v.isNotNull() if nodata is None else v.isNotNull() & (v != F.lit(nodata))

    offs = F.explode(
        F.array(*[F.lit(i) for i in range(-half, half + 1)])
    )
    contrib = (
        cells.where(valid)
        .select(F.col("row"), F.col("col"), v.alias("_v"))
        .withColumn("_dr", offs)
        .withColumn("_dc", offs)
        .select(
            (F.col("row") + F.col("_dr")).alias("row"),
            (F.col("col") + F.col("_dc")).alias("col"),
            "_v",
            F.lit(0).alias("_id"),
        )
    )
    ident = cells.select(
        "row", "col", F.lit(None).cast("double").alias("_v"), F.lit(1).alias("_id")
    )
    agg = (
        contrib.unionByName(ident)
        .groupBy("row", "col")
        .agg(
            F.max("_id").alias("_present"),
            F.count("_v").alias("n_valid"),
            F.sum("_v").alias("f_sum"),
            F.min("_v").alias("f_min"),
            F.max("_v").alias("f_max"),
        )
        .where(F.col("_present") == 1)
    )
    return agg.select(
        "row",
        "col",
        "n_valid",
        "f_sum",
        (F.col("f_sum") / F.col("n_valid")).alias("f_mean"),
        "f_min",
        "f_max",
    )


def focal_majority(
    cells: DataFrame,
    size: int = 3,
    value: str = "value",
    nodata: float | None = None,
) -> DataFrame:
    """(row, col, n_valid, n_distinct, majority, majority_n, minority,
    minority_n) — modal filter over the centered ``size``×``size``
    window (GRASS ``r.neighbors method=mode`` / ArcGIS FocalStatistics
    MAJORITY): the salt-and-pepper cleanup pass for classified rasters.
    Ties break deterministically toward the SMALLEST value (GRASS's
    lowest-category rule); minority is the symmetric least-frequent
    value.  Every input cell gets a row; cells with no valid neighbors
    get NULLs.

    Shape: the same ×size² neighbor explode as :func:`focal_stats`,
    then (target, value) partial-agg counts → one struct-max per
    target — two bounded Exchanges at any raster size — and a left
    join back onto the input keeps nodata cells present."""
    if size < 1 or size % 2 == 0:
        raise ValueError(f"size must be odd and positive, got {size}")
    half = size // 2
    v = F.col(value)
    valid = v.isNotNull() if nodata is None else v.isNotNull() & (v != F.lit(nodata))

    dr = F.explode(F.array(*[F.lit(i) for i in range(-half, half + 1)]))
    dc = F.explode(F.array(*[F.lit(i) for i in range(-half, half + 1)]))
    contrib = (
        cells.where(valid)
        .select("row", "col", v.alias("_v"))
        .withColumn("_dr", dr)
        .withColumn("_dc", dc)
        .select(
            (F.col("row") + F.col("_dr")).alias("row"),
            (F.col("col") + F.col("_dc")).alias("col"),
            F.col("_v"),
        )
    )
    per_val = contrib.groupBy("row", "col", "_v").agg(F.count("*").alias("_n"))
    agg = per_val.groupBy("row", "col").agg(
        F.sum("_n").cast("long").alias("n_valid"),
        F.count("*").cast("long").alias("n_distinct"),
        F.max(F.struct(F.col("_n"), (-F.col("_v")).alias("_nv"))).alias("_maj"),
        F.min(F.struct(F.col("_n"), F.col("_v"))).alias("_mino"),
    )
    out = cells.select("row", "col").join(agg, ["row", "col"], "left")
    return out.select(
        "row",
        "col",
        F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        (-F.col("_maj._nv")).alias("majority"),
        F.col("_maj._n").alias("majority_n"),
        F.col("_mino._v").alias("minority"),
        F.col("_mino._n").alias("minority_n"),
    )
