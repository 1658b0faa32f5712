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
    # find tag 259 (compression) in the IFD and flip its value to 7
    # (JPEG — a codec this parser deliberately does not attempt; DEFLATE,
    # LZW and PackBits are supported as of r5)
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        base = 10 + i * 12
        if struct.unpack_from("<H", buf, base)[0] == 259:
            struct.pack_into("<H", buf, base + 8, 7)
    bad = tmp_path / "jpeg.tif"
    bad.write_bytes(bytes(buf))
    with pytest.raises(NotImplementedError, match="compression"):
        read_geotiff(str(bad))
    notif = tmp_path / "no.tif"
    notif.write_bytes(b"PK\x03\x04 definitely not a tiff")
    with pytest.raises(ValueError, match="byte-order"):
        read_geotiff(str(notif))


# ------------------------------------------- compressed / tiled profiles (r5)


@pytest.mark.parametrize("compress", ["deflate", "lzw"])
def test_geotiff_compressed_roundtrip(tmp_path, compress):
    """DEFLATE and TIFF-LZW strips roundtrip bit-exactly (the common
    profiles GDAL writes for downloaded rasters)."""
    p = str(tmp_path / f"{compress}.tif")
    write_geotiff(p, META, _grid(), compress=compress)
    meta, grid = read_geotiff(p)
    assert meta == META
    assert np.array_equal(grid, _grid())


@pytest.mark.parametrize("compress", [None, "deflate", "lzw"])
def test_geotiff_tiled_roundtrip(tmp_path, compress):
    """Tiled layout (with edge-tile padding) roundtrips for a grid whose
    dimensions are NOT tile multiples, compressed or not."""
    h, w = 37, 23
    meta = RasterMeta(width=w, height=h, origin_x=1.0, origin_y=50.0,
                      pixel=0.125, crs="EPSG:4326", nodata=-1.0)
    g = (np.arange(h * w, dtype=np.float64).reshape(h, w) % 97) * 0.5 - 7.0
    p = str(tmp_path / f"tiled_{compress}.tif")
    write_geotiff(p, meta, g, compress=compress, tile=16)
    m2, g2 = read_geotiff(p)
    assert m2 == meta
    assert np.array_equal(g2, g)


def test_geotiff_compressed_multi_strip_integer(tmp_path):
    """Multiple LZW strips of integer data (strip reassembly must happen
    after per-strip decompression)."""
    h, w = 20000, 3
    meta = RasterMeta(width=w, height=h, origin_x=0.0, origin_y=100.0,
                      pixel=0.01, crs="EPSG:4326", nodata=0.0)
    g = (np.arange(h * w).reshape(h, w) % 251).astype(np.float64)
    p = str(tmp_path / "mstrips.tif")
    write_geotiff(p, meta, g, dtype="u2", compress="lzw")
    m2, g2 = read_geotiff(p)
    assert m2 == meta and np.array_equal(g2, g)


def test_lzw_known_vector():
    """Pin the TIFF-LZW bit layout against a hand-computed stream (the
    encoder/decoder pair must not merely agree with each other).  Input
    b'AAAB': codes CLEAR(256), 'A'(65), 258(=AA, the KwKwK entry),
    'B'(66), EOI(257) at 9 bits MSB-first:
      100000000 001000001 100000010 001000010 100000001 + 000 pad
      = 0x80 0x10 0x60 0x44 0x28 0x08"""
    from gregor_spark.sources.geotiff import _lzw_decode, _lzw_encode

    expected = bytes([0x80, 0x10, 0x60, 0x44, 0x28, 0x08])
    assert _lzw_encode(b"AAAB") == expected
    assert _lzw_decode(expected) == b"AAAB"


def test_lzw_width_change_roundtrip():
    """Force the 9→10→11 bit early width changes (needs > 1023 distinct
    table entries) and the KwKwK path, then roundtrip."""
    from gregor_spark.sources.geotiff import _lzw_decode, _lzw_encode

    rng = np.random.RandomState(3)
    data = rng.randint(0, 256, 60000).astype(np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data)) == data
    run = b"\xab" * 5000  # long single-byte run = repeated KwKwK
    assert _lzw_decode(_lzw_encode(run)) == run


def _patch_ifd_short(buf: bytearray, tag: int, value: int) -> None:
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        base = 10 + i * 12
        if struct.unpack_from("<H", buf, base)[0] == tag:
            struct.pack_into("<H", buf, base + 8, value)
            return
    raise AssertionError(f"tag {tag} not found")


def test_geotiff_predictor2_horizontal_differencing(tmp_path):
    """Predictor=2: rewrite an uncompressed u2 file's pixel data as
    row-wise deltas + set the predictor tag; the reader must restore the
    original values via modular cumsum."""
    g = (np.arange(20, dtype=np.float64).reshape(4, 5) * 13) % 700
    meta = RasterMeta(width=5, height=4, origin_x=0.0, origin_y=2.0,
                      pixel=0.5, crs="EPSG:4326", nodata=0.0)
    p = tmp_path / "plain.tif"
    write_geotiff(str(p), meta, g, dtype="u2")
    buf = bytearray(p.read_bytes())
    # pixel data is the trailing h*w*2 bytes (single strip, written last)
    raw = np.frombuffer(bytes(buf[-40:]), dtype="<u2").reshape(4, 5).copy()
    deltas = raw.copy()
    deltas[:, 1:] = (raw[:, 1:].astype(np.int64) - raw[:, :-1]).astype(np.uint16)
    buf[-40:] = deltas.astype("<u2").tobytes()
    # no predictor tag in the writer's IFD: repurpose tag 284 (chunky
    # planar config, value 1 = default) as 317 to keep offsets intact
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        base = 10 + i * 12
        if struct.unpack_from("<H", buf, base)[0] == 284:
            struct.pack_into("<H", buf, base, 317)  # tag id -> Predictor
            struct.pack_into("<H", buf, base + 8, 2)
    pred = tmp_path / "pred.tif"
    pred.write_bytes(bytes(buf))
    m2, g2 = read_geotiff(str(pred))
    assert np.array_equal(g2, g)
    # predictor 2 on float data must raise, not misread
    q = tmp_path / "plain_f.tif"
    write_geotiff(str(q), meta, g, dtype="f4")
    fb = bytearray(q.read_bytes())
    for i in range(struct.unpack_from("<H", fb, 8)[0]):
        base = 10 + i * 12
        if struct.unpack_from("<H", fb, base)[0] == 284:
            struct.pack_into("<H", fb, base, 317)
            struct.pack_into("<H", fb, base + 8, 2)
    badp = tmp_path / "pred_f.tif"
    badp.write_bytes(bytes(fb))
    with pytest.raises(NotImplementedError, match="Predictor"):
        read_geotiff(str(badp))


def test_packbits_decode_known_vector():
    """PackBits vector from the TIFF 6.0 spec appendix."""
    from gregor_spark.sources.geotiff import _packbits_decode

    enc = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03,
                 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
    dec = bytes([0xAA] * 3 + [0x80, 0x00, 0x2A] + [0xAA] * 4
                + [0x80, 0x00, 0x2A, 0x22] + [0xAA] * 10)
    assert _packbits_decode(enc) == dec


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


# ------------------------------------------------------- multi-band (r5 cont.)

from gregor_spark.sources.geotiff import read_geotiff_bands  # noqa: E402

MB_META = RasterMeta(width=7, height=5, origin_x=-1.0, origin_y=10.0,
                     pixel=0.5, crs="EPSG:3035", nodata=-1.0)


def _bands(n=3, h=5, w=7):
    return ((np.arange(n * h * w).reshape(n, h, w) * 29) % 251).astype(np.float64)


@pytest.mark.parametrize("planar", ["chunky", "planar"])
@pytest.mark.parametrize("compress,tile", [(None, None), ("deflate", None),
                                           ("lzw", None), (None, 4), ("deflate", 4)])
def test_geotiff_multiband_roundtrip(tmp_path, planar, compress, tile):
    """3-band grids roundtrip bit-exactly through both sample layouts
    (chunky = interleaved per pixel, planar = one segment set per band),
    strips and padded tiles, compressed or not."""
    g = _bands()
    p = str(tmp_path / f"mb_{planar}_{compress}_{tile}.tif")
    write_geotiff(p, MB_META, g, dtype="u1", compress=compress, tile=tile,
                  planar=planar)
    m2, b = read_geotiff_bands(p)
    assert m2 == MB_META
    assert b.shape == (3, 5, 7)
    assert np.array_equal(b, g)


def test_geotiff_multiband_band_selection(tmp_path):
    """read_geotiff on a multi-band file: band= extracts one band,
    omitting it raises (silent band-0 would misread RGB), out-of-range
    raises."""
    g = _bands()
    p = str(tmp_path / "mb.tif")
    write_geotiff(p, MB_META, g, dtype="u1")
    for k in range(3):
        m2, one = read_geotiff(p, band=k)
        assert m2 == MB_META and np.array_equal(one, g[k])
    with pytest.raises(ValueError, match="3 bands"):
        read_geotiff(p)
    with pytest.raises(ValueError, match="out of range"):
        read_geotiff(p, band=3)
    # single-band files keep the no-band-argument surface
    q = str(tmp_path / "sb.tif")
    write_geotiff(q, MB_META, g[0], dtype="u1")
    _, flat = read_geotiff(q)
    assert flat.ndim == 2 and np.array_equal(flat, g[0])


@pytest.mark.parametrize("planar", ["chunky", "planar"])
def test_geotiff_multiband_multi_strip(tmp_path, planar):
    """2 bands x 20000 rows forces multiple strips per plane; planar
    order is all of band 0's strips then band 1's."""
    h, w = 20000, 2
    meta = RasterMeta(width=w, height=h, origin_x=0.0, origin_y=100.0,
                      pixel=0.01, crs="EPSG:4326", nodata=0.0)
    g = ((np.arange(2 * h * w).reshape(2, h, w) * 7) % 509).astype(np.float64)
    p = str(tmp_path / f"mbs_{planar}.tif")
    write_geotiff(p, meta, g, dtype="u2", planar=planar)
    m2, b = read_geotiff_bands(p)
    assert m2 == meta and np.array_equal(b, g)


def test_geotiff_multiband_predictor2_chunky(tmp_path):
    """Predictor=2 with interleaved samples differences each band's
    samples against the SAME band of the previous pixel (spec: per
    sample channel) — rewrite a chunky 2-band u2 file's single strip as
    per-channel deltas and check the reader restores both bands."""
    h, w = 3, 4
    g = ((np.arange(2 * h * w).reshape(2, h, w) * 131) % 60000).astype(np.float64)
    meta = RasterMeta(width=w, height=h, origin_x=0.0, origin_y=2.0,
                      pixel=0.5, crs="EPSG:4326", nodata=0.0)
    p = tmp_path / "mb_plain.tif"
    write_geotiff(str(p), meta, g, dtype="u2")
    buf = bytearray(p.read_bytes())
    nbytes = 2 * h * w * 2
    raw = np.frombuffer(bytes(buf[-nbytes:]), dtype="<u2").reshape(h, w, 2).copy()
    deltas = raw.copy()
    deltas[:, 1:, :] = (raw[:, 1:, :].astype(np.int64)
                        - raw[:, :-1, :]).astype(np.uint16)
    buf[-nbytes:] = deltas.astype("<u2").tobytes()
    # repurpose tag 284 (chunky = the default) as 317/Predictor=2, as in
    # test_geotiff_predictor2_horizontal_differencing
    n = struct.unpack_from("<H", buf, 8)[0]
    for i in range(n):
        base = 10 + i * 12
        if struct.unpack_from("<H", buf, base)[0] == 284:
            struct.pack_into("<H", buf, base, 317)
            struct.pack_into("<H", buf, base + 8, 2)
    pred = tmp_path / "mb_pred.tif"
    pred.write_bytes(bytes(buf))
    m2, b = read_geotiff_bands(str(pred))
    assert np.array_equal(b, g)

def test_cli_geotiff_raster_poly_multiband(spark, tmp_path):
    """raster-poly on a multi-band .tif: --band selects the band; without
    it the reader's descriptive multi-band error surfaces."""
    import json

    import duckdb

    from gregor_spark.cli import main

    meta = RasterMeta(width=4, height=4, origin_x=-0.25, origin_y=11.75,
                      pixel=0.5, crs="EPSG:4326", nodata=0.0)
    g = np.stack([np.arange(16, dtype=np.float64).reshape(4, 4),
                  np.arange(16, 32, dtype=np.float64).reshape(4, 4)])
    tif = str(tmp_path / "mb_cells.tif")
    write_geotiff(tif, meta, g)
    zones_json = str(tmp_path / "zones.json")
    with open(zones_json, "w") as f:
        json.dump(
            [{"zone_id": 0, "xs": [-0.25, 1.75, 1.75, -0.25],
              "ys": [9.75, 9.75, 11.75, 11.75]}], f
        )
    dst = str(tmp_path / "out_b1.parquet")
    main(["raster-poly", tif, zones_json, dst, "--band", "1"])
    rows = duckdb.sql(f"SELECT * FROM '{dst}/*.parquet'").fetchall()
    assert rows == [(0, float(sum(range(16, 32))))]
    with pytest.raises(ValueError, match="2 bands"):
        main(["raster-poly", tif, zones_json, str(tmp_path / "nope.parquet")])


# ----------------------------------------------------- r7: predictor 3


@pytest.mark.parametrize("dtype", ["f4", "f8"])
@pytest.mark.parametrize("compress", [None, "deflate", "lzw"])
def test_geotiff_predictor3_roundtrip(tmp_path, dtype, compress):
    """Float predictor (TechNote 3 byte-plane differencing): writer
    encode + reader fpAcc must roundtrip bit-exactly for f4/f8 under
    every codec."""
    g = _grid(6, 7) * 1.7 + 0.125
    meta = RasterMeta(width=7, height=6, origin_x=0.0, origin_y=3.0,
                      pixel=0.5, crs="EPSG:4326", nodata=-1.0)
    p = str(tmp_path / f"p3_{dtype}_{compress}.tif")
    write_geotiff(p, meta, g, dtype=dtype, compress=compress, predictor=3)
    m2, g2 = read_geotiff(p)
    assert np.array_equal(g2, g.astype(np.dtype(dtype)).astype(np.float64))


@pytest.mark.parametrize("planar", ["chunky", "planar"])
@pytest.mark.parametrize("tile", [None, 4])
def test_geotiff_predictor3_multiband(tmp_path, planar, tile):
    """Multi-band predictor 3: chunky interleaves samples, so the byte
    differencing runs at stride = samples-per-pixel — the subtle path."""
    bands = np.stack([_grid(5, 6) * k - 0.5 for k in (1.0, -2.0, 3.25)])
    meta = RasterMeta(width=6, height=5, origin_x=0.0, origin_y=9.0,
                      pixel=1.0, crs="EPSG:4326", nodata=0.0)
    p = str(tmp_path / f"p3mb_{planar}_{tile}.tif")
    write_geotiff(p, meta, bands, dtype="f4", compress="deflate",
                  tile=tile, planar=planar, predictor=3)
    m2, b = read_geotiff_bands(p)
    assert np.array_equal(b, bands.astype(np.float32).astype(np.float64))


def test_geotiff_predictor3_non_float_raises(tmp_path):
    meta = RasterMeta(width=5, height=4, origin_x=0.0, origin_y=2.0,
                      pixel=0.5, crs="EPSG:4326", nodata=0.0)
    with pytest.raises(NotImplementedError, match="float"):
        write_geotiff(str(tmp_path / "x.tif"), meta,
                      np.abs(_grid()), dtype="u2", predictor=3)


def test_geotiff_writer_predictor2_roundtrip(tmp_path):
    """The writer-side integer predictor (new in r7; the reader-side
    undo was already pinned by the tag-rewrite test above)."""
    g = (np.abs(_grid(8, 9)) * 31).astype(np.int64) % 4096
    meta = RasterMeta(width=9, height=8, origin_x=0.0, origin_y=4.0,
                      pixel=0.5, crs="EPSG:4326", nodata=0.0)
    p = str(tmp_path / "p2.tif")
    write_geotiff(p, meta, g.astype(np.float64), dtype="u2",
                  compress="lzw", predictor=2)
    m2, g2 = read_geotiff(p)
    assert np.array_equal(g2, g.astype(np.float64))
