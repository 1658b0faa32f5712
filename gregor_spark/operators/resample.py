"""Raster resampling: regrid a long-form raster onto a new affine grid.

Extension surface (the reference's rioxarray stack exposes regridding
via ``rio.reproject``/GDAL warp; the reference repo itself only ever
resamples implicitly through GDAL — /root/reference/src/gregor/raster.py
keeps whatever grid the file carries).  Spark-first shape:

* the TARGET grid is generated distributively from ``spark.range``
  (never driver-side) exactly like ``uniform_proxy_df``;
* **nearest** is one equi-join on the computed source pixel index —
  Catalyst broadcasts a small source or shuffle-joins co-partitioned
  (row, col) keys for a large one; out-of-grid targets get nodata;
* **bilinear** explodes each target pixel into its 4 (edge-clamped)
  corner lookups, equi-joins the source once, then pivots the corners
  back into FIXED slots so the final weighted sum is evaluated in a
  deterministic order (``v00*w00 + v01*w01 + v10*w10 + v11*w11``) —
  float-exact across engines and across partitionings, unlike a
  ``sum()`` over an unordered group.

Both paths are pure column expressions + one equi-join: no Python UDFs,
no driver materialization, and the join key count is O(target pixels),
so the plan survives any grid size that fits the cluster.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.raster import RasterMeta


def target_grid(spark: SparkSession, meta: RasterMeta) -> DataFrame:
    """(row, col, x, y) pixel centers of ``meta``, generated distributively."""
    w = meta.width
    return (
        spark.range(meta.height * w)
        .select(
            (F.col("id") / w).cast("int").alias("row"),
            (F.col("id") % w).cast("int").alias("col"),
        )
        .withColumn(
            "x", F.lit(meta.origin_x) + (F.col("col") + F.lit(0.5)) * F.lit(meta.pixel)
        )
        .withColumn(
            "y", F.lit(meta.origin_y) - (F.col("row") + F.lit(0.5)) * F.lit(meta.pixel)
        )
    )


def _nearest_lookup(
    tgt: DataFrame,
    src: DataFrame,
    src_meta: RasterMeta,
    dst_meta: RasterMeta,
    value: str,
    lx: str,
    ly: str,
) -> DataFrame:
    """Nearest-pixel lookup of target rows at coords (``lx``, ``ly``)
    expressed in the SOURCE grid's CRS; OOB targets -> nodata."""
    # nearest pixel = the cell whose half-open [edge, edge+pixel) span
    # contains the target center, i.e. floor of the edge-relative coord
    sc = F.floor((F.col(lx) - F.lit(src_meta.origin_x)) / F.lit(src_meta.pixel))
    sr = F.floor((F.lit(src_meta.origin_y) - F.col(ly)) / F.lit(src_meta.pixel))
    tgt = tgt.withColumn("_sr", sr.cast("int")).withColumn("_sc", sc.cast("int"))
    s = src.select(
        F.col("row").alias("_sr"), F.col("col").alias("_sc"), F.col(value).alias("_v")
    )
    return (
        tgt.join(s, ["_sr", "_sc"], "left")
        .select(
            "row",
            "col",
            "x",
            "y",
            F.coalesce(F.col("_v"), F.lit(float(dst_meta.nodata))).alias(value),
        )
    )


def resample_nearest(
    spark: SparkSession,
    src: DataFrame,
    src_meta: RasterMeta,
    dst_meta: RasterMeta,
    value: str = "value",
) -> DataFrame:
    """Nearest-neighbor regrid.  Targets whose nearest source pixel falls
    outside the source grid get ``dst_meta.nodata`` (no silent clamp —
    resampling beyond the source extent is extrapolation and the caller
    should see it as missing)."""
    tgt = target_grid(spark, dst_meta)
    return _nearest_lookup(tgt, src, src_meta, dst_meta, value, "x", "y")


def _bilinear_lookup(
    tgt: DataFrame,
    src: DataFrame,
    src_meta: RasterMeta,
    value: str,
    lx: str,
    ly: str,
) -> DataFrame:
    """Edge-clamped bilinear lookup at coords (``lx``, ``ly``) in the
    source CRS (GDAL/edge-extend convention: targets within the outer
    source bounds but outside the center lattice reuse border pixels).
    Requires a DENSE source (the model's invariant)."""
    w, h = src_meta.width, src_meta.height
    gx = (F.col(lx) - F.lit(src_meta.origin_x)) / F.lit(src_meta.pixel) - F.lit(0.5)
    gy = (F.lit(src_meta.origin_y) - F.col(ly)) / F.lit(src_meta.pixel) - F.lit(0.5)
    tgt = (
        tgt.withColumn("_gx", gx)
        .withColumn("_gy", gy)
        .withColumn("_x0", F.floor(F.col("_gx")).cast("int"))
        .withColumn("_y0", F.floor(F.col("_gy")).cast("int"))
        .withColumn("_fx", F.col("_gx") - F.floor(F.col("_gx")))
        .withColumn("_fy", F.col("_gy") - F.floor(F.col("_gy")))
    )
    # 4 corner lookups per target; slot id fixes the summation order
    corners = F.array(
        *[
            F.struct(F.lit(k).alias("slot"), F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
            for k, (dy, dx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)])
        ]
    )
    ex = tgt.select(
        "row", "col", "x", "y", "_x0", "_y0", "_fx", "_fy", F.explode(corners).alias("k")
    ).select(
        "row",
        "col",
        "x",
        "y",
        "_fx",
        "_fy",
        F.col("k.slot").alias("_slot"),
        F.col("k.dx").alias("_dx"),
        F.col("k.dy").alias("_dy"),
        F.greatest(F.lit(0), F.least(F.lit(w - 1), F.col("_x0") + F.col("k.dx"))).alias(
            "_sc"
        ),
        F.greatest(F.lit(0), F.least(F.lit(h - 1), F.col("_y0") + F.col("k.dy"))).alias(
            "_sr"
        ),
    )
    wx = F.when(F.col("_dx") == 1, F.col("_fx")).otherwise(F.lit(1.0) - F.col("_fx"))
    wy = F.when(F.col("_dy") == 1, F.col("_fy")).otherwise(F.lit(1.0) - F.col("_fy"))
    s = src.select(
        F.col("row").alias("_sr"), F.col("col").alias("_sc"), F.col(value).alias("_v")
    )
    joined = ex.join(s, ["_sr", "_sc"]).withColumn("_wv", F.col("_v") * wx * wy)
    slots = [
        F.max(F.when(F.col("_slot") == k, F.col("_wv"))).alias(f"_s{k}")
        for k in range(4)
    ]
    return (
        joined.groupBy("row", "col", "x", "y")
        .agg(*slots)
        .select(
            "row",
            "col",
            "x",
            "y",
            (F.col("_s0") + F.col("_s1") + F.col("_s2") + F.col("_s3")).alias(value),
        )
    )


def resample_bilinear(
    spark: SparkSession,
    src: DataFrame,
    src_meta: RasterMeta,
    dst_meta: RasterMeta,
    value: str = "value",
) -> DataFrame:
    """Bilinear regrid (same CRS both sides); see :func:`_bilinear_lookup`."""
    tgt = target_grid(spark, dst_meta)
    return _bilinear_lookup(tgt, src, src_meta, value, "x", "y")


def resample_raster(
    spark: SparkSession,
    src: DataFrame,
    src_meta: RasterMeta,
    dst_meta: RasterMeta,
    method: str = "nearest",
    value: str = "value",
) -> DataFrame:
    if method == "nearest":
        return resample_nearest(spark, src, src_meta, dst_meta, value)
    if method == "bilinear":
        return resample_bilinear(spark, src, src_meta, dst_meta, value)
    raise ValueError(f"method={method!r} (nearest or bilinear)")


def warp_raster(
    spark: SparkSession,
    src: DataFrame,
    src_meta: RasterMeta,
    dst_meta: RasterMeta,
    method: str = "nearest",
    value: str = "value",
) -> DataFrame:
    """Reproject + regrid (GDAL-warp semantics): the target grid lives
    in ``dst_meta.crs``; each target center is INVERSE-projected into
    the source CRS (vectorized pandas-UDF kernels from ``geo/crs.py`` —
    any registered CRS pair works) and looked up with the same
    nearest/bilinear machinery as :func:`resample_raster`.

    Scale shape: the inverse projection is one Arrow-batched map over
    the TARGET grid only (never the source raster), then the identical
    single equi-join; output (row, col, x, y, value) keeps target-CRS
    coordinates."""
    from pyspark.sql import types as T

    from ..geo.crs import _norm, reproject

    tgt = target_grid(spark, dst_meta)
    if _norm(src_meta.crs) == _norm(dst_meta.crs):
        lx, ly = "x", "y"
    else:
        @F.pandas_udf(
            T.StructType(
                [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
            )
        )
        def inv(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
            import numpy as np

            nx, ny = reproject(
                xs.to_numpy("float64"), ys.to_numpy("float64"),
                dst_meta.crs, src_meta.crs,
            )
            return pd.DataFrame({"x": nx, "y": ny})

        tgt = (
            tgt.withColumn("_l", inv(F.col("x"), F.col("y")))
            .withColumn("_lx", F.col("_l.x"))
            .withColumn("_ly", F.col("_l.y"))
            .drop("_l")
        )
        lx, ly = "_lx", "_ly"
    if method == "nearest":
        return _nearest_lookup(tgt, src, src_meta, dst_meta, value, lx, ly)
    if method == "bilinear":
        return _bilinear_lookup(tgt, src, src_meta, value, lx, ly)
    raise ValueError(f"method={method!r} (nearest or bilinear)")
