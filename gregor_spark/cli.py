"""CLI — the reference's four commands (src/gregor/cli.py:10-82)
re-expressed over parquet datasets.

    python -m gregor_spark.cli raster-poly  <cells.parquet|.tif> <zones.json> <dst> [--stats sum]
    python -m gregor_spark.cli point-poly   <points.parquet|.geojson> <zones.json> <dst> [--stats sum]
    python -m gregor_spark.cli poly-raster  <zones.json> <column> <proxy.parquet|.tif> <dst[.tif]>
    python -m gregor_spark.cli poly-point   <zones.json> <column> <proxy.parquet|.geojson> <proxy_column> <dst>

Reference parity notes:
* refuses an existing destination (cli.py:16-17, 32, 49, 73);
* ``poly-raster`` pre-clips the proxy to the zone bounds "for better
  performance" (cli.py:55-57) — kept as an explicit filter even though
  Catalyst pushes it into the scan anyway;
* zone layers load from GeoJSON FeatureCollections (parsed directly —
  GDAL-free; Polygon/MultiPolygon with holes, feature id/properties) or
  from the engine's small JSON sidecar (zone_id, xs, ys, value);
* point layers ending in .geojson/.json load as FeatureCollections of
  Points (ids + the 'data' property as weight — the reference's
  points.geojson shape);
* raster inputs ending in .tif/.tiff load through the pure-numpy GeoTIFF
  reader (sources/geotiff.py — the reference's rioxarray surface,
  cli.py:19, raster.py:62-74); a poly-raster destination ending in
  .tif/.tiff writes the result back as GeoTIFF on the proxy's grid
  (requires a GeoTIFF proxy so the grid georeferencing is known).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load_zones(path: str, value_property: str | None = None):
    """Zone layer from GeoJSON (FeatureCollection — the reference's
    gpd.read_file surface, parsed without GDAL; holes + multipolygons
    honored; ``value_property`` = the data column, like the reference's
    <column> argument) or the engine's plain JSON sidecar
    (zone_id/xs/ys/value)."""
    from .model.zones import ZoneSet

    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict) and data.get("type") == "FeatureCollection":
        from .sources.geojson import zoneset_from_geojson

        return zoneset_from_geojson(data, value_property=value_property or "value")
    return ZoneSet(
        [z["zone_id"] for z in data],
        [z["xs"] for z in data],
        [z["ys"] for z in data],
        {z["zone_id"]: z["value"] for z in data if "value" in z},
    )


def _check_dst(path: str) -> None:
    if os.path.exists(path):
        # reference: "Destination already exists." (cli.py:16-17)
        sys.exit(f"Destination already exists: {path}")


def _is_tiff(path: str) -> bool:
    return path.lower().endswith((".tif", ".tiff"))


def _read_raster(spark, path: str, band: int | None = None):
    """(cells_df, meta_or_None): GeoTIFF or parquet cell table.  ``band``
    picks one band of a multi-band GeoTIFF (reader raises a descriptive
    error when a multi-band file is read without it)."""
    if _is_tiff(path):
        from .sources.geotiff import read_geotiff_cells

        return read_geotiff_cells(spark, path, band=band)
    return spark.read.parquet(path), None


def _read_points(spark, path: str):
    """Point layer: GeoJSON FeatureCollection of Points (the reference's
    gpd.read_file surface — cli.py:19-23 on points.geojson) or a parquet
    table with (point_id, x, y, weight)."""
    if path.lower().endswith((".geojson", ".json")):
        from .sources.geojson import points_from_geojson

        return spark.createDataFrame(
            points_from_geojson(path),
            "point_id long, x double, y double, weight double",
        )
    return spark.read.parquet(path)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="gregor_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("raster-poly")
    p.add_argument("raster"), p.add_argument("polygons"), p.add_argument("destination")
    p.add_argument("--stats", default="sum")
    # 0-based band of a multi-band GeoTIFF; single-band files need none
    p.add_argument("--band", type=int, default=None)

    p = sub.add_parser("point-poly")
    p.add_argument("points"), p.add_argument("polygons"), p.add_argument("destination")
    p.add_argument("--stats", default="sum")

    p = sub.add_parser("poly-raster")
    p.add_argument("data"), p.add_argument("column"), p.add_argument("proxy")
    p.add_argument("destination")
    # reference cli.py:59-61: --to-data-crs reprojects the RESULT back to
    # the data CRS; parquet carries no CRS, so the pair travels as flags
    p.add_argument("--to-data-crs", action="store_true", dest="to_data_crs")
    p.add_argument("--data-crs", default="EPSG:4326")
    # None = "flag not given" sentinel: a GeoTIFF proxy's header CRS is
    # adopted only then, so an EXPLICIT --proxy-crs EPSG:4326 overriding a
    # mislabeled file is honored (a default of "EPSG:4326" could not tell
    # the two apart and silently preferred the file header)
    p.add_argument("--proxy-crs", default=None)

    p = sub.add_parser("poly-point")
    p.add_argument("data"), p.add_argument("column"), p.add_argument("proxy")
    p.add_argument("proxy_column"), p.add_argument("destination")
    # reference cli.py:78-81
    p.add_argument("--to-data-crs", action="store_true", dest="to_data_crs")
    p.add_argument("--data-crs", default="EPSG:4326")
    p.add_argument("--proxy-crs", default=None)

    args = ap.parse_args(argv)
    _check_dst(args.destination)

    from .session import get_spark

    spark = get_spark(app=f"gregor-cli-{args.cmd}")

    if args.cmd == "raster-poly":
        from .operators.aggregate import aggregate_raster_to_polygon

        cells, _meta = _read_raster(spark, args.raster, band=args.band)
        zones = _load_zones(args.polygons)
        out = aggregate_raster_to_polygon(cells, zones, args.stats)
    elif args.cmd == "point-poly":
        from .operators.aggregate import aggregate_point_to_polygon

        pts = _read_points(spark, args.points)
        zones = _load_zones(args.polygons)
        out = aggregate_point_to_polygon(pts, zones, args.stats)
    elif args.cmd == "poly-raster":
        from .model.raster import clip_bbox
        from .operators.disaggregate import disaggregate_polygon_to_raster

        zones = _load_zones(args.data, args.column)
        proxy, proxy_meta = _read_raster(spark, args.proxy)
        if args.proxy_crs is None:  # flag not given
            args.proxy_crs = (
                proxy_meta.crs if _is_tiff(args.proxy) else "EPSG:4326"
            )
        if args.data_crs != args.proxy_crs:
            from .geo.crs import reproject_zones

            # the operator re-derives this alignment from the crs flags; a
            # second driver-side numpy pass over admin-sized rings is
            # negligible and keeps the operator's signature file-free
            bzones = reproject_zones(zones, args.data_crs, args.proxy_crs)
        else:
            bzones = zones
        minx, miny, maxx, maxy = bzones.total_bounds()
        proxy = clip_bbox(proxy, minx, miny, maxx, maxy)  # cli.py:55-57
        out = disaggregate_polygon_to_raster(
            zones,
            proxy,
            value_column=args.column,
            data_crs=args.data_crs,
            proxy_crs=args.proxy_crs,
            to_data_crs=args.to_data_crs,
        )
    else:  # poly-point
        from .operators.disaggregate import disaggregate_polygon_to_point

        if args.proxy_crs is None:  # flag not given (point layers carry no CRS)
            args.proxy_crs = "EPSG:4326"
        zones = _load_zones(args.data, args.column)
        pts = _read_points(spark, args.proxy)
        out = disaggregate_polygon_to_point(
            zones,
            pts,
            proxy_column=args.proxy_column,
            data_crs=args.data_crs,
            proxy_crs=args.proxy_crs,
            to_data_crs=args.to_data_crs,
        )

    if _is_tiff(args.destination):
        if args.cmd != "poly-raster":
            sys.exit("GeoTIFF destination only supported for poly-raster")
        if proxy_meta is None:
            sys.exit(
                "GeoTIFF destination requires a GeoTIFF proxy (the result "
                "grid's georeferencing comes from the proxy's header)"
            )
        if getattr(args, "to_data_crs", False):
            sys.exit(
                "--to-data-crs with a GeoTIFF destination would mislabel "
                "the grid (rows/cols stay on the proxy grid); write "
                "parquet or drop the flag"
            )
        from .sources.geotiff import write_geotiff_cells

        write_geotiff_cells(out, proxy_meta, args.destination, column="disaggregated")
    else:
        out.write.parquet(args.destination)
    print(f"wrote {args.destination}")


if __name__ == "__main__":
    main()
