"""Pure-numpy GeoTIFF I/O: roundtrip fidelity, profile guards, endian
and dtype handling, and the CLI .tif surface (reference cli.py:19,
raster.py:62-74 — rioxarray read/write re-expressed without GDAL)."""

import struct

import numpy as np
import pytest

from gregor_spark.model.raster import RasterMeta
from gregor_spark.sources.geotiff import read_geotiff, write_geotiff

META = RasterMeta(
    width=5, height=4, origin_x=-0.25, origin_y=11.75, pixel=0.5,
    crs="EPSG:3035", nodata=-9.5,
)


def _grid(h=4, w=5):
    return (np.arange(h * w, dtype=np.float64).reshape(h, w) * 1.25) - 3.0


def test_geotiff_roundtrip_float64(tmp_path):
    p = str(tmp_path / "r.tif")
    write_geotiff(p, META, _grid())
    meta, grid = read_geotiff(p)
    assert meta == META  # width/height/origin/pixel/crs/nodata all survive
    assert np.array_equal(grid, _grid())


@pytest.mark.parametrize("dtype,exact", [("f4", False), ("u2", True), ("i2", True)])
def test_geotiff_dtypes(tmp_path, dtype, exact):
    g = np.abs(_grid()).astype(np.dtype(dtype)).astype(np.float64)
    p = str(tmp_path / f"d_{dtype}.tif")
    write_geotiff(p, META, g, dtype=dtype)
    meta, grid = read_geotiff(p)
    assert meta.pixel == META.pixel
    if exact:
        assert np.array_equal(grid, g)
    else:
        assert np.allclose(grid, g, atol=1e-6)


def test_geotiff_multi_strip(tmp_path):
    """heights beyond rows_per_strip produce multiple strips; the reader
    must reassemble them in order."""
    h, w = 20000, 3
    meta = RasterMeta(width=w, height=h, origin_x=0.0, origin_y=100.0,
                      pixel=0.01, crs="EPSG:4326", nodata=0.0)
    g = np.random.RandomState(0).rand(h, w)
    p = str(tmp_path / "strips.tif")
    write_geotiff(p, meta, g, dtype="f8")
    m2, g2 = read_geotiff(p)
    assert m2 == meta and np.array_equal(g2, g)


def test_geotiff_big_endian_read(tmp_path):
    """Handcrafted MM (big-endian) uint8 GeoTIFF — the reader honors the
    byte-order mark for headers, tag values, and pixel data."""
    e = ">"
    w, h = 3, 2
    pixels = bytes([10, 20, 30, 40, 50, 60])
    # tags sorted: 256,257,258,259,273,277,278,279,339,33550,33922
    tags = []

    def tag(t, ttype, count, value_or_off):
        tags.append(struct.pack(e + "HHI", t, ttype, count) + value_or_off)

    def short_val(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    def long_val(v):
        return struct.pack(e + "I", v)

    n_tags = 11
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    scale_off = ifd_off + ifd_size
    tie_off = scale_off + 3 * 8
    pix_off = tie_off + 6 * 8
    tag(256, 3, 1, short_val(w))
    tag(257, 3, 1, short_val(h))
    tag(258, 3, 1, short_val(8))
    tag(259, 3, 1, short_val(1))
    tag(273, 4, 1, long_val(pix_off))
    tag(277, 3, 1, short_val(1))
    tag(278, 4, 1, long_val(h))
    tag(279, 4, 1, long_val(len(pixels)))
    tag(339, 3, 1, short_val(1))
    tag(33550, 12, 3, long_val(scale_off))
    tag(33922, 12, 6, long_val(tie_off))
    buf = (
        struct.pack(e + "2sHI", b"MM", 42, ifd_off)
        + struct.pack(e + "H", n_tags)
        + b"".join(tags)
        + struct.pack(e + "I", 0)
        + struct.pack(e + "ddd", 0.25, 0.25, 0.0)
        + struct.pack(e + "dddddd", 0, 0, 0, 10.0, 20.0, 0)
        + pixels
    )
    p = tmp_path / "mm.tif"
    p.write_bytes(buf)
    meta, grid = read_geotiff(str(p))
    assert (meta.width, meta.height) == (w, h)
    assert meta.origin_x == 10.0 and meta.origin_y == 20.0 and meta.pixel == 0.25
    assert np.array_equal(grid, np.array([[10, 20, 30], [40, 50, 60]], float))


def test_geotiff_rejects_unsupported(tmp_path):
    p = str(tmp_path / "x.tif")
    write_geotiff(p, META, _grid())
    buf = bytearray(open(p, "rb").read())
    # find tag 259 (compression) in the IFD and flip its value to 5 (LZW)
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        base = 10 + i * 12
        if struct.unpack_from("<H", buf, base)[0] == 259:
            struct.pack_into("<H", buf, base + 8, 5)
    bad = tmp_path / "lzw.tif"
    bad.write_bytes(bytes(buf))
    with pytest.raises(NotImplementedError, match="compression"):
        read_geotiff(str(bad))
    notif = tmp_path / "no.tif"
    notif.write_bytes(b"PK\x03\x04 definitely not a tiff")
    with pytest.raises(ValueError, match="byte-order"):
        read_geotiff(str(notif))


REFERENCE_TIF = "/root/reference/test/_files/raster.tif"


@pytest.mark.skipif(
    not __import__("os").path.exists(REFERENCE_TIF),
    reason="reference fixture not present",
)
def test_reference_geotiff_decodes_exactly():
    """Real-world cross-validation: the reference repo's raster.tif was
    written by GDAL (reference test/_files/create_test_data.py); our
    pure-numpy reader must recover the exact golden grid and meta that
    FIXTURES.md documents (and that gregor's own tests assert against)."""
    from gregor_spark.model import fixtures as FX

    meta, grid = read_geotiff(REFERENCE_TIF)
    assert meta == RasterMeta(**FX.RASTER_META)
    np.testing.assert_array_equal(grid, np.asarray(FX.RASTER_VALUES, dtype=np.float64))


def test_cli_geotiff_poly_raster_roundtrip(spark, tmp_path):
    """poly-raster with a GeoTIFF proxy and GeoTIFF destination:
    disaggregate zone values over a uniform .tif proxy, write .tif, read
    it back, and check conservation (sums per zone == zone values)."""
    import json

    from gregor_spark.cli import main

    proxy_meta = RasterMeta(
        width=4, height=4, origin_x=-0.25, origin_y=11.75, pixel=0.5,
        crs="EPSG:4326", nodata=0.0,
    )
    proxy_tif = str(tmp_path / "proxy.tif")
    write_geotiff(proxy_tif, proxy_meta, np.ones((4, 4)))
    zones_json = str(tmp_path / "zones.json")
    # one zone covering the whole grid, value 8 -> each of 16 cells 0.5
    with open(zones_json, "w") as f:
        json.dump(
            [{"zone_id": 0, "xs": [-0.25, 1.75, 1.75, -0.25],
              "ys": [9.75, 9.75, 11.75, 11.75], "value": 8.0}], f
        )
    dst = str(tmp_path / "out.tif")
    main(["poly-raster", zones_json, "value", proxy_tif, dst])
    meta, grid = read_geotiff(dst)
    assert (meta.width, meta.height, meta.pixel) == (4, 4, 0.5)
    assert grid.sum() == pytest.approx(8.0)
    assert np.allclose(grid, 0.5)


def test_cli_geotiff_raster_poly_input(spark, tmp_path):
    """raster-poly accepts a .tif input: zonal sum over a GeoTIFF."""
    import json

    import duckdb

    from gregor_spark.cli import main

    meta = RasterMeta(width=4, height=4, origin_x=-0.25, origin_y=11.75,
                      pixel=0.5, crs="EPSG:4326", nodata=0.0)
    g = np.arange(16, dtype=np.float64).reshape(4, 4)
    tif = str(tmp_path / "cells.tif")
    write_geotiff(tif, meta, g)
    zones_json = str(tmp_path / "zones.json")
    with open(zones_json, "w") as f:
        json.dump(
            [{"zone_id": 0, "xs": [-0.25, 1.75, 1.75, -0.25],
              "ys": [9.75, 9.75, 11.75, 11.75]}], f
        )
    dst = str(tmp_path / "out.parquet")
    main(["raster-poly", tif, zones_json, dst])
    rows = duckdb.sql(f"SELECT * FROM '{dst}/*.parquet'").fetchall()
    # value 0 is nodata-excluded by the aggregate (reference semantics)
    assert rows == [(0, float(sum(range(1, 16))))]
