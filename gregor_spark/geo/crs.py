"""CRS handling — pure-numpy reprojection kernels.

The reference reprojects via geopandas/rioxarray (pyproj under the hood)
whenever data and proxy CRS disagree, printing a warning
(disaggregate.py:40-44, 177-181; aggregate.py:45,59,66,86; raster.py:56).
pyproj is not in this environment, so the engine implements the
transforms it needs directly (public formulas):

* EPSG:4326  — WGS84 lon/lat (identity reference frame here)
* EPSG:3857  — WebMercator (spherical; the standard tiling CRS)

Everything is vectorized numpy, exposed both driver-side (ZoneSet) and
as an Arrow-batched pandas UDF for fact tables.  Unknown CRS pairs raise
rather than silently pass through.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

R = 6378137.0  # WGS84 / WebMercator sphere radius


def _wgs84_to_webmercator(x: np.ndarray, y: np.ndarray):
    lon = np.asarray(x, dtype=np.float64)
    lat = np.clip(np.asarray(y, dtype=np.float64), -85.06, 85.06)
    mx = np.radians(lon) * R
    my = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return mx, my


def _webmercator_to_wgs84(x: np.ndarray, y: np.ndarray):
    mx = np.asarray(x, dtype=np.float64)
    my = np.asarray(y, dtype=np.float64)
    lon = np.degrees(mx / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(my / R)) - np.pi / 2.0)
    return lon, lat


def _norm(crs: str) -> str:
    return crs.upper().replace(" ", "")


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): _wgs84_to_webmercator,
    ("EPSG:3857", "EPSG:4326"): _webmercator_to_wgs84,
}


def reproject(
    x: np.ndarray, y: np.ndarray, src: str, dst: str
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized coordinate transform; identity when src == dst."""
    s, d = _norm(src), _norm(dst)
    if s == d:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    fn = _TRANSFORMS.get((s, d))
    if fn is None:
        raise ValueError(f"unsupported CRS transform {src} -> {dst}")
    return fn(x, y)


def reproject_df(df, src: str, dst: str, x: str = "x", y: str = "y"):
    """Reproject coordinate columns in place (pandas UDF, Arrow-batched).

    Mirrors the reference's align-to-proxy-CRS step; prints the same kind
    of warning when CRSs differ (disaggregate.py:41-43)."""
    if _norm(src) == _norm(dst):
        return df
    print(f"Data CRS ({src}) differs from target CRS ({dst}). Reprojecting data.")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
        )
    )
    def go(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        nx, ny = reproject(xs.to_numpy(np.float64), ys.to_numpy(np.float64), src, dst)
        return pd.DataFrame({"x": nx, "y": ny})

    tmp = df.withColumn("_xy", go(F.col(x), F.col(y)))
    return tmp.withColumn(x, F.col("_xy.x")).withColumn(y, F.col("_xy.y")).drop("_xy")


def reproject_zones(zones, src: str, dst: str):
    """Driver-side ZoneSet reprojection (returns a new ZoneSet)."""
    from ..model.zones import ZoneSet

    if _norm(src) == _norm(dst):
        return zones
    xs, ys = [], []
    for zx, zy in zip(zones.xs, zones.ys):
        nx, ny = reproject(zx, zy, src, dst)
        xs.append(nx)
        ys.append(ny)
    extra = None
    if zones.extra_rings is not None:
        extra = [
            [(*reproject(rx, ry, src, dst), hole) for rx, ry, hole in per_zone]
            for per_zone in zones.extra_rings
        ]
    return ZoneSet(zones.zone_ids.copy(), xs, ys, dict(zones.values), extra_rings=extra)
