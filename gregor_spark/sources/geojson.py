"""GeoJSON (RFC 7946) zone-layer I/O — pure python, no GDAL.

The reference loads zone layers with ``gpd.read_file`` (GDAL under the
hood; reference cli.py:19-23, raster.py:62-74).  GDAL is unavailable in
this environment, but GeoJSON itself is plain JSON — FeatureCollections
of Polygon / MultiPolygon features parse directly into ``ZoneSet``:

* first ring of a Polygon = exterior, subsequent rings = holes
  (RFC 7946 §3.1.6); MultiPolygon = one polygon array per part, the
  first part becomes the primary ring and the rest go to extra_rings
* feature ``id`` (or ``properties[id_property]``, or enumeration order)
  becomes ``zone_id``; ``properties[value_property]`` becomes the zone
  value (the reference reads the data column the same way)
* closing vertex (GeoJSON rings repeat the first point) is dropped —
  the kernels expect open rings
* writer emits the inverse, so layers round-trip losslessly

Zone layers are driver-sized by design (see model/zones.py); GeoJSON
stays a driver-side format here, exactly like the reference.
"""

from __future__ import annotations

import json

import numpy as np


def _open_ring(coords) -> tuple[np.ndarray, np.ndarray]:
    xs = np.asarray([c[0] for c in coords], dtype=np.float64)
    ys = np.asarray([c[1] for c in coords], dtype=np.float64)
    if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    return xs, ys


def zoneset_from_geojson(
    src,
    id_property: str | None = None,
    value_property: str | None = None,
):
    """Parse a GeoJSON FeatureCollection (path, JSON string, or dict) into
    a ZoneSet.  Raises on non-polygonal geometries."""
    from ..model.zones import ZoneSet

    if isinstance(src, str):
        if src.lstrip().startswith("{"):
            data = json.loads(src)
        else:
            with open(src) as f:
                data = json.load(f)
    else:
        data = src
    if data.get("type") != "FeatureCollection":
        raise ValueError(f"expected FeatureCollection, got {data.get('type')!r}")

    ids, xs, ys, extra, values = [], [], [], [], {}
    any_extra = False
    for i, feat in enumerate(data.get("features", [])):
        geom = feat.get("geometry") or {}
        gtype = geom.get("type")
        props = feat.get("properties") or {}
        if id_property is not None:
            zid = int(props[id_property])
        elif "id" in feat:
            zid = int(feat["id"])
        else:
            zid = i
        if gtype == "Polygon":
            polys = [geom["coordinates"]]
        elif gtype == "MultiPolygon":
            polys = geom["coordinates"]
        else:
            raise ValueError(f"feature {zid}: unsupported geometry {gtype!r}")
        rings: list[tuple[np.ndarray, np.ndarray, bool]] = []
        for poly in polys:
            for r, ring in enumerate(poly):
                rx, ry = _open_ring(ring)
                rings.append((rx, ry, r > 0))  # ring 0 exterior, rest holes
        ids.append(zid)
        xs.append(rings[0][0])
        ys.append(rings[0][1])
        extra.append(rings[1:])
        if rings[1:]:
            any_extra = True
        if value_property is not None and value_property in props:
            values[zid] = float(props[value_property])
    return ZoneSet(
        np.asarray(ids, dtype=np.int64),
        xs,
        ys,
        values,
        extra_rings=extra if any_extra else None,
    )


def points_from_geojson(
    src,
    id_property: str = "id",
    value_property: str | None = "data",
) -> list[tuple]:
    """Parse a FeatureCollection of Point features into
    ``(point_id, x, y[, value])`` rows — the reference CLI's point-layer
    read surface (gpd.read_file on points.geojson, reference
    cli.py:19-23, test/_files/points.geojson).  Feature ``id`` comes
    from ``properties[id_property]``, the feature-level ``id``, or
    enumeration order; ``value_property=None`` omits the value column.
    Rows feed ``spark.createDataFrame(rows, "point_id long, x double,
    y double, weight double")``."""
    if isinstance(src, str):
        if src.lstrip().startswith("{"):
            data = json.loads(src)
        else:
            with open(src) as f:
                data = json.load(f)
    else:
        data = src
    if data.get("type") != "FeatureCollection":
        raise ValueError(f"expected FeatureCollection, got {data.get('type')!r}")
    rows = []
    for i, feat in enumerate(data.get("features", [])):
        geom = feat.get("geometry") or {}
        if geom.get("type") != "Point":
            raise ValueError(
                f"feature {i}: expected Point, got {geom.get('type')!r}"
            )
        props = feat.get("properties") or {}
        if id_property in props:
            pid = int(props[id_property])
        elif "id" in feat:
            pid = int(feat["id"])
        else:
            pid = i
        x, y = (float(v) for v in geom["coordinates"][:2])
        if value_property is None:
            rows.append((pid, x, y))
        else:
            if value_property not in props:
                # match the parser's descriptive-ValueError contract (a
                # bare KeyError fails the CLI with an opaque traceback)
                raise ValueError(
                    f"feature {i}: missing property {value_property!r} "
                    f"(have {sorted(props)!r}); pass value_property=None "
                    "to omit the value column"
                )
            rows.append((pid, x, y, float(props[value_property])))
    return rows


def _close_ring(rx: np.ndarray, ry: np.ndarray) -> list[list[float]]:
    pts = [[float(x), float(y)] for x, y in zip(rx, ry)]
    pts.append(pts[0][:])
    return pts


def _containing_part(hole_rings, exterior_rings) -> int:
    """Index of the exterior ring containing the hole (tested on one hole
    vertex — holes nest strictly inside their exterior, so any vertex
    decides).  Falls back to part 0 only when no exterior contains the
    vertex (already-invalid input; keeps serialization total)."""
    from ..geo.kernels import points_strictly_inside

    hx, hy = hole_rings
    for i, (ex, ey) in enumerate(exterior_rings):
        if points_strictly_inside(hx[:1], hy[:1], ex, ey)[0]:
            return i
    return 0


def zoneset_to_geojson(
    zones, path: str | None = None, value_property: str = "value"
) -> dict:
    """Serialize a ZoneSet as a GeoJSON FeatureCollection (the round-trip
    inverse of ``zoneset_from_geojson``).  Exterior parts each become a
    Polygon in a MultiPolygon (single part → plain Polygon); each hole
    attaches to the part whose exterior CONTAINS it (a point-in-ring test
    on one hole vertex) — the engine's own even-odd kernels are
    part-agnostic, but RFC 7946 consumers reject an interior ring outside
    its exterior, so membership matters for interchange.  A zone whose
    rings are ALL holes raises ValueError (no valid serialization
    exists)."""
    features = []
    for k, zid in enumerate(zones.zone_ids):
        zid = int(zid)
        rings = zones.zone_rings(k)
        ext_open = [(rx, ry) for rx, ry, hole in rings if not hole]
        if not ext_open:
            raise ValueError(
                f"zone {zid}: every ring is a hole — no exterior to "
                "serialize (GeoJSON requires ring 0 of each part to be "
                "an exterior)"
            )
        exteriors = [_close_ring(rx, ry) for rx, ry in ext_open]
        polys = [[ext] for ext in exteriors]
        for rx, ry, hole in rings:
            if hole:
                polys[_containing_part((rx, ry), ext_open)].append(
                    _close_ring(rx, ry)
                )
        geom = (
            {"type": "Polygon", "coordinates": polys[0]}
            if len(polys) == 1
            else {"type": "MultiPolygon", "coordinates": polys}
        )
        props = {}
        if zid in zones.values:
            props[value_property] = zones.values[zid]
        features.append(
            {"type": "Feature", "id": zid, "geometry": geom, "properties": props}
        )
    out = {"type": "FeatureCollection", "features": features}
    if path is not None:
        with open(path, "w") as f:
            json.dump(out, f)
    return out
