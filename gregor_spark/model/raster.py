"""Raster model: dense grids as long-form cell tables.

The reference holds rasters as dense xr.DataArray grids
(disaggregate.py:11, aggregate.py:10).  Spark-first, a raster is a
DataFrame ``cells(row, col, x, y, value)`` — pixel centers under an
affine transform — plus a tiny broadcastable ``RasterMeta``.  Dense→long
is lossless because coords are affine (reference
test/_files/create_test_data.py:65-75).

At 100 TB scale the cell table is generated distributively from
``spark.range`` (no driver materialization) and partitioned by coarse
Morton tile so bbox predicates prune at scan time.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RasterMeta:
    width: int
    height: int
    origin_x: float  # west edge of col 0
    origin_y: float  # north edge of row 0 (north-up: y decreases with row)
    pixel: float
    crs: str = "EPSG:4326"
    nodata: float = 0.0

    def center_x(self, col):
        return self.origin_x + (np.asarray(col) + 0.5) * self.pixel

    def center_y(self, row):
        return self.origin_y - (np.asarray(row) + 0.5) * self.pixel


def raster_df(spark: SparkSession, meta: RasterMeta, values: np.ndarray) -> DataFrame:
    """Long-form cells from a dense (height, width) numpy grid (fixtures)."""
    rows = []
    for r in range(meta.height):
        for c in range(meta.width):
            rows.append(
                (
                    r,
                    c,
                    float(meta.center_x(c)),
                    float(meta.center_y(r)),
                    float(values[r, c]),
                )
            )
    from .localdf import local_df

    # JVM LocalRelation, not a python RDD: fixture-sized grids must not pay
    # python-worker round trips per scan (see localdf.py)
    return local_df(spark, rows, "row int, col int, x double, y double, value double")


def uniform_proxy_df(
    spark: SparkSession,
    bounds: tuple[float, float, float, float],
    resolution: tuple[int, int],
    value: float = 1.0,
) -> DataFrame:
    """Constant-valued proxy raster spanning ``bounds`` — the reference's
    ``get_uniform_proxy`` (disaggregate.py:74-109) built distributively:
    one ``spark.range(h*w)`` with affine column math, no driver loop, no
    data movement.  Scales to arbitrarily fine grids."""
    minx, miny, maxx, maxy = bounds
    h, w = resolution
    px = (maxx - minx) / w
    py = (maxy - miny) / h
    return (
        spark.range(h * w)
        .select(
            (F.col("id") / w).cast("int").alias("row"),
            (F.col("id") % w).cast("int").alias("col"),
        )
        .withColumn("x", F.lit(minx) + (F.col("col") + F.lit(0.5)) * F.lit(px))
        .withColumn("y", F.lit(maxy) - (F.col("row") + F.lit(0.5)) * F.lit(py))
        .withColumn("value", F.lit(float(value)))
    )


def collect_to_grid(df: DataFrame, meta: RasterMeta, column: str = "value") -> np.ndarray:
    """Materialize a long-form raster back to a dense grid (tests/goldens
    only — never in the scale path)."""
    grid = np.full((meta.height, meta.width), np.nan)
    for rec in df.select("row", "col", column).collect():
        if rec[2] is not None:
            grid[rec[0], rec[1]] = rec[2]
    return grid


def coarsen_cells(
    df: DataFrame, factor: int, value: str = "value", out: str | None = None
) -> DataFrame:
    """Block-sum downsampling (xarray ``coarsen(x=f, y=f).sum()``, used by
    the reference's conservation test, test_disaggregate.py:29-31):
    one partial-agg groupBy on integer-divided grid coords."""
    out = out or f"sum_{value}"
    return (
        df.groupBy(
            F.floor(F.col("row") / factor).cast("int").alias("row"),
            F.floor(F.col("col") / factor).cast("int").alias("col"),
        ).agg(F.sum(value).alias(out))
    )


def clip_bbox(
    df: DataFrame,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Bbox clip (reference ``gregor.raster.clip``, raster.py:14-74) — a
    plain predicate Catalyst pushes into the scan; with Morton-partitioned
    storage this becomes partition pruning."""
    return df.filter(
        (F.col(x) >= minx) & (F.col(x) <= maxx) & (F.col(y) >= miny) & (F.col(y) <= maxy)
    )
