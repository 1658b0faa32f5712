"""GeoTIFF raster I/O — pure numpy, no GDAL/rasterio.

The reference reads and writes rasters as GeoTIFF through rioxarray
(reference cli.py:19, raster.py:62-74).  GDAL is unavailable in this
environment, but an UNCOMPRESSED single-band GeoTIFF is just a TIFF
container (byte-order header + IFD tag walk + strip reads) plus three
geo tags — all parseable in numpy, exactly like the BMP codec in
ops/media.py and the GeoJSON parser in sources/geojson.py:

* baseline TIFF 6.0: II/MM byte order, IFD chain, strips (RowsPerStrip /
  StripOffsets / StripByteCounts), SampleFormat × BitsPerSample →
  uint8/16/32, int8/16/32, float32/64;
* GeoTIFF 1.1: ModelPixelScaleTag (33550) + ModelTiepointTag (33922)
  give the north-up affine; GeoKeyDirectoryTag (34735) keys 2048
  (geographic CS) / 3072 (projected CS) give the EPSG code;
* GDAL_NODATA (42113) carries the nodata value as ASCII.

Limits (raise, never silently misread): single band, no compression, no
tiles (strips only), no palette.  The writer emits exactly that profile
— little-endian, one strip per ≤ 8K rows, float64 by default — which
GDAL/QGIS/rasterio open directly.

Scale note: like zone layers, GeoTIFF is the driver-side INTERCHANGE
format at the pipeline edge; at 100 TB rasters live as Morton-
partitioned parquet cell tables (model/raster.py, sources/iceberg_like).
``read_geotiff_cells`` turns one file into the engine's long-form cell
DataFrame; ``write_geotiff_cells`` collects a driver-sized result grid
back (the reference's rioxarray surface is equally driver-sized).
"""

from __future__ import annotations

import struct

import numpy as np

from ..model.raster import RasterMeta

# (SampleFormat, BitsPerSample) -> numpy dtype char (endian prefix added)
_FORMATS = {
    (1, 8): "u1",
    (1, 16): "u2",
    (1, 32): "u4",
    (2, 8): "i1",
    (2, 16): "i2",
    (2, 32): "i4",
    (3, 32): "f4",
    (3, 64): "f8",
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 8: 2, 9: 4, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_tag_values(buf: bytes, endian: str, ttype: int, count: int, value_field: bytes):
    size = _TYPE_SIZES.get(ttype)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (offset,) = struct.unpack(endian + "I", value_field)
        raw = buf[offset : offset + total]
    if ttype in (1, 6):
        return list(raw)
    if ttype == 2:  # ASCII, NUL-terminated
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    fmt = _TYPE_FMT[ttype]
    return list(struct.unpack(endian + fmt * count, raw))


def _parse_ifd(buf: bytes, endian: str, offset: int) -> dict[int, object]:
    (n,) = struct.unpack_from(endian + "H", buf, offset)
    tags: dict[int, object] = {}
    for i in range(n):
        base = offset + 2 + i * 12
        tag, ttype, count = struct.unpack_from(endian + "HHI", buf, base)
        vals = _read_tag_values(buf, endian, ttype, count, buf[base + 8 : base + 12])
        if vals is not None:
            tags[tag] = vals
    return tags


def _epsg_from_geokeys(keys: list[int]) -> str | None:
    """GeoKeyDirectoryTag: header (version, rev, minor, n_keys) then
    4-short key entries (key_id, tag_location, count, value).  Location 0
    means the value is inline — where the EPSG codes live."""
    if len(keys) < 4:
        return None
    n = keys[3]
    code = None
    for k in range(n):
        key_id, loc, _cnt, val = keys[4 + 4 * k : 8 + 4 * k]
        if loc != 0:
            continue
        if key_id == 3072 and 1024 <= val < 32767:  # ProjectedCSType
            return f"EPSG:{val}"
        if key_id == 2048 and 1024 <= val < 32767:  # GeographicType
            code = f"EPSG:{val}"
    return code


def read_geotiff(path: str) -> tuple[RasterMeta, np.ndarray]:
    """Parse an uncompressed single-band GeoTIFF into (RasterMeta,
    (height, width) float64 grid).  Raises on any profile this parser
    cannot decode faithfully."""
    with open(path, "rb") as f:
        buf = f.read()
    order = buf[:2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        raise ValueError(f"{path}: not a TIFF (byte-order mark {order!r})")
    magic, ifd_off = struct.unpack_from(endian + "HI", buf, 2)
    if magic != 42:
        raise ValueError(f"{path}: bad TIFF magic {magic}")
    tags = _parse_ifd(buf, endian, ifd_off)

    width = int(tags[256][0])
    height = int(tags[257][0])
    compression = int(tags.get(259, [1])[0])
    if compression != 1:
        raise NotImplementedError(
            f"{path}: compression {compression} needs codec libraries; "
            "only uncompressed GeoTIFF decodable here"
        )
    if 322 in tags or 323 in tags:
        raise NotImplementedError(f"{path}: tiled TIFF not supported (strips only)")
    spp = int(tags.get(277, [1])[0])
    if spp != 1:
        raise NotImplementedError(f"{path}: {spp} samples/pixel (single band only)")
    bits = int(tags.get(258, [1])[0])
    fmt = int(tags.get(339, [1])[0])
    dtype = _FORMATS.get((fmt, bits))
    if dtype is None:
        raise NotImplementedError(f"{path}: SampleFormat={fmt} BitsPerSample={bits}")
    dt = np.dtype(endian + dtype)

    offsets = [int(v) for v in tags[273]]
    counts = [int(v) for v in tags[279]]
    rows_per_strip = int(tags.get(278, [height])[0])
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        strip = np.frombuffer(buf, dtype=dt, count=n_rows * width, offset=off)
        if strip.nbytes > cnt:
            raise ValueError(f"{path}: strip {si} shorter than its row span")
        rows.append(strip.reshape(n_rows, width))
    grid = np.concatenate(rows, axis=0).astype(np.float64)

    scale = tags.get(33550)
    tie = tags.get(33922)
    if scale is None or tie is None:
        raise ValueError(f"{path}: missing ModelPixelScale/ModelTiepoint (not a GeoTIFF)")
    px, py = float(scale[0]), float(scale[1])
    if abs(px - py) > 1e-12 * max(abs(px), abs(py)):
        raise NotImplementedError(f"{path}: non-square pixels {px}x{py}")
    # tiepoint (i, j, k, x, y, z): raster (i, j) pinned to model (x, y);
    # standard north-up files pin (0,0) to the top-left corner
    i, j = float(tie[0]), float(tie[1])
    tx, ty = float(tie[3]), float(tie[4])
    origin_x = tx - i * px
    origin_y = ty + j * py
    crs = _epsg_from_geokeys([int(v) for v in tags.get(34735, [])]) or "EPSG:4326"
    nodata = 0.0
    if 42113 in tags:
        try:
            nodata = float(str(tags[42113]).strip())
        except ValueError:
            pass
    meta = RasterMeta(
        width=width, height=height, origin_x=origin_x, origin_y=origin_y,
        pixel=px, crs=crs, nodata=nodata,
    )
    return meta, grid


def write_geotiff(
    path: str, meta: RasterMeta, grid: np.ndarray, dtype: str = "f8"
) -> None:
    """Write a (height, width) grid as an uncompressed single-band
    little-endian GeoTIFF (pixel scale + tiepoint + EPSG geokeys +
    GDAL_NODATA) — the exact profile ``read_geotiff`` parses, and one any
    GDAL-based tool opens."""
    grid = np.ascontiguousarray(np.asarray(grid), dtype=np.dtype("<" + dtype))
    height, width = grid.shape
    fmt_code = {"u": 1, "i": 2, "f": 3}[np.dtype(dtype).kind]
    bits = grid.dtype.itemsize * 8
    rows_per_strip = max(1, min(height, 8192))
    n_strips = (height + rows_per_strip - 1) // rows_per_strip

    if not meta.crs.upper().startswith("EPSG:"):
        # raise, never silently misread/mislabel (module contract): a
        # non-EPSG crs stamped as 4326 would hand GDAL/QGIS consumers a
        # wrong georeference with no warning
        raise ValueError(
            f"write_geotiff needs an 'EPSG:*' crs to stamp geokeys, got "
            f"{meta.crs!r} — reproject first or write parquet instead"
        )
    epsg = int(meta.crs.split(":")[1])
    geographic = epsg == 4326 or 4000 <= epsg < 5000
    geo_keys = [1, 1, 1, 2,
                1024, 0, 1, 2 if geographic else 1,
                (2048 if geographic else 3072), 0, 1, epsg]
    nodata_ascii = (f"{meta.nodata:g}").encode() + b"\x00"

    entries: list[tuple[int, int, int, object]] = []  # tag, type, count, values

    def add(tag, ttype, values):
        entries.append((tag, ttype, len(values), values))

    add(256, 4, [width])
    add(257, 4, [height])
    add(258, 3, [bits])
    add(259, 3, [1])            # uncompressed
    add(262, 3, [1])            # BlackIsZero
    add(277, 3, [1])            # one band
    add(278, 4, [rows_per_strip])
    add(284, 3, [1])            # chunky
    add(339, 3, [fmt_code])
    add(33550, 12, [meta.pixel, meta.pixel, 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, meta.origin_x, meta.origin_y, 0.0])
    add(34735, 3, geo_keys)
    add(42113, 2, list(nodata_ascii))
    strip_rows = [
        grid[s * rows_per_strip : (s + 1) * rows_per_strip] for s in range(n_strips)
    ]
    byte_counts = [s.nbytes for s in strip_rows]
    add(273, 4, [0] * n_strips)  # offsets patched below
    add(279, 4, byte_counts)
    entries.sort(key=lambda e: e[0])

    header = struct.pack("<2sHI", b"II", 42, 8)
    n = len(entries)
    ifd_size = 2 + n * 12 + 4
    # out-of-line value area follows the IFD
    data_off = 8 + ifd_size
    out_of_line: list[bytes] = []
    packed_entries = []
    for tag, ttype, count, values in entries:
        if ttype == 2:
            raw = bytes(values)
        elif ttype == 12:
            raw = struct.pack("<" + "d" * count, *values)
        else:
            raw = struct.pack("<" + _TYPE_FMT[ttype] * count, *values)
        if len(raw) <= 4:
            packed_entries.append((tag, ttype, count, raw.ljust(4, b"\x00"), None))
        else:
            packed_entries.append((tag, ttype, count, None, raw))
    # lay out out-of-line blobs (word-aligned), then strips — the 273
    # placeholder already has its final SIZE (n_strips uint32s), so one
    # layout pass is exact and the patch below never shifts offsets
    blob_offsets = []
    off = data_off
    for _tag, _t, _c, inline, blob in packed_entries:
        if blob is None:
            blob_offsets.append(None)
        else:
            off += off % 2
            blob_offsets.append(off)
            off += len(blob)
    off += off % 2
    strip_offsets = []
    for s in strip_rows:
        strip_offsets.append(off)
        off += s.nbytes
    # patch StripOffsets (tag 273) with the real positions
    for idx, (tag, ttype, count, inline, blob) in enumerate(packed_entries):
        if tag == 273:
            raw = struct.pack("<" + "I" * n_strips, *strip_offsets)
            if len(raw) <= 4:
                packed_entries[idx] = (tag, ttype, count, raw.ljust(4, b"\x00"), None)
            else:
                packed_entries[idx] = (tag, ttype, count, None, raw)

    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack("<H", n))
        for (tag, ttype, count, inline, blob), boff in zip(packed_entries, blob_offsets):
            if blob is None:
                f.write(struct.pack("<HHI", tag, ttype, count) + inline)
            else:
                f.write(struct.pack("<HHII", tag, ttype, count, boff))
        f.write(struct.pack("<I", 0))  # no next IFD
        pos = 8 + ifd_size
        for (tag, ttype, count, inline, blob), boff in zip(packed_entries, blob_offsets):
            if blob is not None:
                if pos % 2:
                    f.write(b"\x00")
                    pos += 1
                assert pos == boff, (tag, pos, boff)
                f.write(blob)
                pos += len(blob)
        if pos % 2:
            f.write(b"\x00")
            pos += 1
        for s, soff in zip(strip_rows, strip_offsets):
            assert pos == soff
            f.write(s.tobytes())
            pos += s.nbytes


def read_geotiff_cells(spark, path: str):
    """GeoTIFF → the engine's long-form cell DataFrame (row, col, x, y,
    value) + its RasterMeta."""
    from ..model.raster import raster_df

    meta, grid = read_geotiff(path)
    return raster_df(spark, meta, grid), meta


def write_geotiff_cells(
    df, meta: RasterMeta, path: str, column: str = "value", dtype: str = "f8"
) -> None:
    """Collect a driver-sized long-form raster result back into a dense
    grid and write it as GeoTIFF (missing cells = nodata)."""
    from ..model.raster import collect_to_grid

    grid = collect_to_grid(df, meta, column)
    grid = np.where(np.isnan(grid), meta.nodata, grid)
    write_geotiff(path, meta, grid, dtype=dtype)
