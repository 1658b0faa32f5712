"""CLI round trip + CRS reprojection kernels."""

import json

import numpy as np
import pytest

from gregor_spark.geo import crs
from gregor_spark.model import fixtures as FX


def test_reproject_roundtrip():
    rng = np.random.RandomState(2)
    lon = rng.uniform(-179, 179, 500)
    lat = rng.uniform(-80, 80, 500)
    mx, my = crs.reproject(lon, lat, "EPSG:4326", "EPSG:3857")
    # known anchor: (0,0) -> (0,0); (180,0) -> pi*R
    zx, zy = crs.reproject(np.array([0.0]), np.array([0.0]), "EPSG:4326", "EPSG:3857")
    assert zx[0] == pytest.approx(0) and zy[0] == pytest.approx(0)
    bx, _ = crs.reproject(np.array([180.0]), np.array([0.0]), "EPSG:4326", "EPSG:3857")
    assert bx[0] == pytest.approx(np.pi * crs.R)
    back_lon, back_lat = crs.reproject(mx, my, "EPSG:3857", "EPSG:4326")
    np.testing.assert_allclose(back_lon, lon, atol=1e-9)
    np.testing.assert_allclose(back_lat, lat, atol=1e-9)
    with pytest.raises(ValueError):
        crs.reproject(lon, lat, "EPSG:4326", "EPSG:9999")


def test_reproject_df_and_zones(spark):
    df = spark.createDataFrame(
        [(0, 10.0, 45.0), (1, -10.0, -45.0)], "id long, x double, y double"
    )
    out = {r["id"]: (r["x"], r["y"]) for r in crs.reproject_df(df, "EPSG:4326", "EPSG:3857").collect()}
    ex, ey = crs.reproject(np.array([10.0]), np.array([45.0]), "EPSG:4326", "EPSG:3857")
    assert out[0][0] == pytest.approx(ex[0]) and out[0][1] == pytest.approx(ey[0])
    from gregor_spark.model.zones import ZoneSet

    zs = ZoneSet.from_fixture(FX.SEG_2X2, values={0: 1.0})
    rz = crs.reproject_zones(zs, "EPSG:4326", "EPSG:3857")
    assert rz.values == {0: 1.0}
    assert rz.xs[0][0] == pytest.approx(
        crs.reproject(np.array([zs.xs[0][0]]), np.array([zs.ys[0][0]]), "EPSG:4326", "EPSG:3857")[0][0]
    )
    # identity path returns the same object contents
    same = crs.reproject_zones(zs, "EPSG:4326", "epsg:4326")
    np.testing.assert_array_equal(same.xs[0], zs.xs[0])


def test_cli_raster_poly_and_refusal(spark, tmp_path, capsys):
    from gregor_spark.cli import main
    from gregor_spark.model.raster import RasterMeta, raster_df

    cells = raster_df(spark, RasterMeta(**FX.RASTER_META), FX.RASTER_VALUES)
    cells_path = str(tmp_path / "cells.parquet")
    cells.write.parquet(cells_path)
    zones_path = str(tmp_path / "zones.json")
    with open(zones_path, "w") as f:
        json.dump(
            [
                {"zone_id": z.zone_id, "xs": list(z.xs), "ys": list(z.ys), "value": 2.0}
                for z in FX.SEG_2X2
            ],
            f,
        )
    dst = str(tmp_path / "out.parquet")
    main(["raster-poly", cells_path, zones_path, dst, "--stats", "sum"])
    got = {
        r["zone_id"]: r["sum_value"] for r in spark.read.parquet(dst).collect()
    }
    assert got == pytest.approx(FX.GOLDEN_ZONAL_SUM_2X2)
    # reference semantics: refuse existing destination (cli.py:16-17)
    with pytest.raises(SystemExit, match="already exists"):
        main(["raster-poly", cells_path, zones_path, dst])


def test_disaggregate_to_data_crs_roundtrip(spark):
    """Reference parity (disaggregate.py:67-69,215-217): zones given in a
    data CRS (3857) against a 4326 proxy; values computed in the proxy CRS
    and the RESULT's coordinates reprojected back to the data CRS, with
    mass conservation intact."""
    from gregor_spark.model.raster import RasterMeta, raster_df
    from gregor_spark.model.zones import ZoneSet
    from gregor_spark.operators.disaggregate import disaggregate_polygon_to_raster

    cells = raster_df(spark, RasterMeta(**FX.RASTER_META), FX.RASTER_VALUES)
    zones4326 = ZoneSet.from_fixture(FX.SEG_2X2, values={z: 2.0 for z in range(4)})
    zones3857 = crs.reproject_zones(zones4326, "EPSG:4326", "EPSG:3857")
    out = disaggregate_polygon_to_raster(
        zones3857,
        cells,
        data_crs="EPSG:3857",
        proxy_crs="EPSG:4326",
        to_data_crs=True,
    )
    rows = out.collect()
    # conservation: 4 zones x value 2
    assert sum(r["disaggregated"] for r in rows) == pytest.approx(8.0)
    # coordinates came back in the DATA crs (WebMercator meters)
    xs4326 = [c[2] for c in FX.raster_long_form()]
    ys4326 = [c[3] for c in FX.raster_long_form()]
    ex, ey = crs.reproject(np.array(xs4326), np.array(ys4326), "EPSG:4326", "EPSG:3857")
    got = {(r["row"], r["col"]): (r["x"], r["y"]) for r in rows}
    lf = FX.raster_long_form()
    for (r_, c_, _x, _y, _v), gx, gy in zip(lf, ex, ey):
        if (r_, c_) in got:
            assert got[(r_, c_)][0] == pytest.approx(gx)
            assert got[(r_, c_)][1] == pytest.approx(gy)


def test_cli_poly_point_to_data_crs(spark, tmp_path):
    """CLI --to-data-crs flag (reference cli.py:78-81): conservation holds
    and output coordinates are in the data CRS."""
    from gregor_spark.cli import main
    from gregor_spark.model.zones import ZoneSet

    pts = spark.createDataFrame(
        FX.POINTS, "point_id long, x double, y double, weight double"
    )
    pts_path = str(tmp_path / "pts.parquet")
    pts.write.parquet(pts_path)
    zones4326 = ZoneSet.from_fixture(
        [FX.SEG_2X2[0], FX.SEG_2X2[2], FX.SEG_2X2[3]], values={0: 1.0, 2: 5.0, 3: 7.0}
    )
    zones3857 = crs.reproject_zones(zones4326, "EPSG:4326", "EPSG:3857")
    zones_path = str(tmp_path / "zones3857.json")
    with open(zones_path, "w") as f:
        json.dump(
            [
                {
                    "zone_id": int(z),
                    "xs": list(map(float, x)),
                    "ys": list(map(float, y)),
                    "value": zones3857.values[int(z)],
                }
                for z, x, y in zip(zones3857.zone_ids, zones3857.xs, zones3857.ys)
            ],
            f,
        )
    dst = str(tmp_path / "out.parquet")
    main(
        [
            "poly-point", zones_path, "value", pts_path, "weight", dst,
            "--to-data-crs", "--data-crs", "EPSG:3857", "--proxy-crs", "EPSG:4326",
        ]
    )
    rows = spark.read.parquet(dst).collect()
    assert sum(r["disaggregated"] for r in rows) == pytest.approx(13.0)
    # x is now WebMercator meters (point 0: lon 0.332... -> ~37k m)
    got0 = {r["point_id"]: r["x"] for r in rows}[0]
    ex = crs.reproject(np.array([FX.POINTS[0][1]]), np.array([FX.POINTS[0][2]]),
                       "EPSG:4326", "EPSG:3857")[0][0]
    assert got0 == pytest.approx(ex)


def test_cli_poly_raster_conservation(spark, tmp_path):
    from gregor_spark.cli import main
    from gregor_spark.model.raster import RasterMeta, raster_df

    cells = raster_df(spark, RasterMeta(**FX.RASTER_META), FX.RASTER_VALUES)
    proxy_path = str(tmp_path / "proxy.parquet")
    cells.write.parquet(proxy_path)
    zones_path = str(tmp_path / "zones.json")
    with open(zones_path, "w") as f:
        json.dump(
            [
                {"zone_id": z.zone_id, "xs": list(z.xs), "ys": list(z.ys), "value": 2.0}
                for z in FX.SEG_2X2
            ],
            f,
        )
    dst = str(tmp_path / "disagg.parquet")
    main(["poly-raster", zones_path, "value", proxy_path, dst])
    total = (
        spark.read.parquet(dst).groupBy().sum("disaggregated").collect()[0][0]
    )
    assert total == pytest.approx(8.0)  # 4 zones x value 2, mass conserved


def test_cli_poly_raster_laea_data_crs(spark, tmp_path):
    """Round-3: zones supplied in EPSG:3035 (LAEA Europe — the reference's
    EU energy-domain CRS) against a 4326 proxy raster; --to-data-crs brings
    result coordinates back to LAEA meters, conservation intact."""
    from gregor_spark.cli import main
    from gregor_spark.model.raster import RasterMeta, raster_df
    from gregor_spark.model.zones import ZoneSet

    cells = raster_df(spark, RasterMeta(**FX.RASTER_META), FX.RASTER_VALUES)
    proxy_path = str(tmp_path / "proxy.parquet")
    cells.write.parquet(proxy_path)
    zones4326 = ZoneSet.from_fixture(FX.SEG_2X2, values={z: 2.0 for z in range(4)})
    zones3035 = crs.reproject_zones(zones4326, "EPSG:4326", "EPSG:3035")
    zones_path = str(tmp_path / "zones3035.json")
    with open(zones_path, "w") as f:
        json.dump(
            [
                {
                    "zone_id": int(z),
                    "xs": list(map(float, x)),
                    "ys": list(map(float, y)),
                    "value": zones3035.values[int(z)],
                }
                for z, x, y in zip(zones3035.zone_ids, zones3035.xs, zones3035.ys)
            ],
            f,
        )
    dst = str(tmp_path / "disagg3035.parquet")
    main(
        [
            "poly-raster", zones_path, "value", proxy_path, dst,
            "--to-data-crs", "--data-crs", "EPSG:3035", "--proxy-crs", "EPSG:4326",
        ]
    )
    rows = spark.read.parquet(dst).collect()
    assert sum(r["disaggregated"] for r in rows) == pytest.approx(8.0)
    # coordinates came back in LAEA meters
    lf = FX.raster_long_form()
    ex, ey = crs.reproject(
        np.array([c[2] for c in lf]), np.array([c[3] for c in lf]),
        "EPSG:4326", "EPSG:3035",
    )
    got = {(r["row"], r["col"]): (r["x"], r["y"]) for r in rows}
    for (r_, c_, _x, _y, _v), gx, gy in zip(lf, ex, ey):
        if (r_, c_) in got:
            assert got[(r_, c_)][0] == pytest.approx(gx)
            assert got[(r_, c_)][1] == pytest.approx(gy)
