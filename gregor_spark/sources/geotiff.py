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
* compression (r5): DEFLATE (8 / legacy 32946, stdlib zlib), TIFF-LZW
  (5, MSB-first variable-width codes with early change — the GDAL
  default for downloaded rasters), PackBits (32773), plus horizontal
  differencing (Predictor=2) for integer samples;
* tiled layout (r5): TileWidth/TileLength/TileOffsets/TileByteCounts
  (322/323/324/325) — edge tiles padded per spec, cropped on read;
* GeoTIFF 1.1: ModelPixelScaleTag (33550) + ModelTiepointTag (33922)
  give the north-up affine; GeoKeyDirectoryTag (34735) keys 2048
  (geographic CS) / 3072 (projected CS) give the EPSG code;
* GDAL_NODATA (42113) carries the nodata value as ASCII.

* multi-band (r5 cont.): SamplesPerPixel > 1 in both chunky
  (PlanarConfiguration=1, samples interleaved per pixel) and planar
  (PlanarConfiguration=2, one segment set per band) layouts;
  Predictor=2 differences per sample channel, so the unfilter runs on
  a (rows, cols, bands) view.

Limits (raise, never silently misread): no palette, no JPEG/CCITT
codecs, one BitsPerSample/SampleFormat across bands.  Predictors 1/2/3
are all supported (3 = TechNote-3 floating-point byte-plane
differencing, r7).  The writer emits little-endian files — strips (one
per ≤ 8K rows) or square tiles, optional ``compress="deflate"|"lzw"``
and ``predictor=2|3``, and 2-D ``(h, w)`` or 3-D ``(bands, h, w)``
grids in either planar layout — which GDAL/QGIS/rasterio open directly.

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


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, 9→12-bit
    variable-width codes, ClearCode=256 / EOI=257, and the "early change"
    quirk — the code width bumps when the NEXT table slot is 2^width−1,
    one entry earlier than vanilla LZW.  Pure Python: runs driver-side on
    interchange-sized files (module scale note)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    prev = b""
    bitbuf = nbits = 0
    width = 9
    pos, n = 0, len(data)

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = b""

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # stream ended without EOI (GDAL tolerates)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            return bytes(out)
        if not prev:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table {len(table)}")
        out += entry
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by exactly one entry (the entry completed by the NEXT
        # code), so it widens at 2^w−2 where the encoder widens at 2^w−1
        # — libtiff's maxcode=(1<<n)-2 convention
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (writer twin of ``_lzw_decode``; emits
    CLEAR, codes with early width change, EOI)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = nbits = 0

    def put(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        elif next_code == (1 << 12) - 1:  # table full: restart
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        put(table[prev], width)
    put(EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


def _decompress(raw: bytes, compression: int, path: str) -> bytes:
    import zlib

    if compression in (8, 32946):  # DEFLATE (+ legacy code)
        return zlib.decompress(raw)
    if compression == 5:
        return _lzw_decode(raw)
    if compression == 32773:
        return _packbits_decode(raw)
    raise NotImplementedError(
        f"{path}: compression {compression} not supported "
        "(uncompressed, DEFLATE, LZW, PackBits are)"
    )


def _undo_predictor(arr: np.ndarray, predictor: int, dt: np.dtype, path: str) -> np.ndarray:
    """Predictor=2 (horizontal differencing): samples are stored as
    row-wise deltas per sample channel; cumulative sum with same-width
    modular arithmetic restores them (the spec defines the deltas mod
    2^bits).  ``arr`` is (rows, cols) or (rows, cols, bands) — axis 1 is
    the pixel axis either way, so the same cumsum differences each band
    independently, matching the spec's per-channel deltas."""
    if predictor == 1:
        return arr
    if predictor == 2:
        if dt.kind not in "iu":
            raise NotImplementedError(
                f"{path}: Predictor=2 with non-integer samples"
            )
        u = np.dtype(f"u{dt.itemsize}")
        acc = np.cumsum(arr.astype(u, copy=False), axis=1, dtype=u)
        return acc.view(np.dtype(f"{dt.kind}{dt.itemsize}"))
    raise NotImplementedError(f"{path}: Predictor={predictor} (1, 2 or 3 only)")


def _undo_predictor3(
    raw: bytes, n_rows: int, n_cols: int, seg_spp: int, dt: np.dtype, path: str
) -> np.ndarray:
    """Predictor=3 (TIFF TechNote 3 floating-point horizontal
    differencing, libtiff ``fpAcc`` semantics): each scanline stores its
    samples' bytes split into byte PLANES — all most-significant bytes
    first, then the next byte, … (big-endian plane order regardless of
    file endianness) — with horizontal byte differencing at stride =
    samples-per-pixel applied over the planed row.  Decode = per-row
    modular byte accumulation, then de-interleave the planes and
    reassemble big-endian floats."""
    if dt.kind != "f":
        raise NotImplementedError(f"{path}: Predictor=3 with non-float samples")
    bps = dt.itemsize
    n = n_cols * seg_spp
    want = n_rows * n * bps
    if len(raw) < want:
        raise ValueError(
            f"{path}: predictor-3 segment has {len(raw)} bytes, expected {want}"
        )
    b = np.frombuffer(raw, dtype=np.uint8, count=want).reshape(n_rows, n * bps)
    # undo byte differencing: independent chains at indices ≡ k (mod
    # stride) → reshape groups each chain contiguously in axis 1
    chains = b.reshape(n_rows, (n * bps) // seg_spp, seg_spp)
    b = np.cumsum(chains, axis=1, dtype=np.uint8).reshape(n_rows, bps, n)
    be = np.ascontiguousarray(b.transpose(0, 2, 1))  # (rows, samples, bytes)
    flo = np.frombuffer(be.tobytes(), dtype=np.dtype(f">f{bps}"), count=n_rows * n)
    return flo.reshape(n_rows, n_cols, seg_spp).astype(dt)


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


def _read_geotiff_impl(path: str) -> tuple[RasterMeta, np.ndarray]:
    """Parse a GeoTIFF into (RasterMeta, (bands, height, width) float64
    array).  Raises on any profile this parser cannot decode faithfully."""
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
    predictor = int(tags.get(317, [1])[0])
    spp = int(tags.get(277, [1])[0])
    planar = int(tags.get(284, [1])[0])
    if planar not in (1, 2):
        raise NotImplementedError(f"{path}: PlanarConfiguration={planar}")
    bits_all = [int(v) for v in tags.get(258, [1])]
    fmt_all = [int(v) for v in tags.get(339, [1] * len(bits_all))]
    if len(set(bits_all)) > 1 or len(set(fmt_all)) > 1:
        raise NotImplementedError(
            f"{path}: mixed per-band BitsPerSample={bits_all} / "
            f"SampleFormat={fmt_all}"
        )
    bits, fmt = bits_all[0], fmt_all[0]
    dtype = _FORMATS.get((fmt, bits))
    if dtype is None:
        raise NotImplementedError(f"{path}: SampleFormat={fmt} BitsPerSample={bits}")
    dt = np.dtype(endian + dtype)
    # samples interleaved per pixel in each segment row (chunky) vs one
    # band per segment (planar)
    seg_spp = spp if planar == 1 else 1

    def segment(off: int, cnt: int, n_rows: int, n_cols: int, label: str) -> np.ndarray:
        """One strip or tile as an (n_rows, n_cols, seg_spp) array:
        slice → decompress → dtype view → per-channel predictor undo."""
        n_samples = n_rows * n_cols * seg_spp
        if predictor == 3:
            # float predictor works on the raw BYTE stream (byte planes),
            # before any dtype view
            if compression == 1:
                raw = bytes(buf[off : off + cnt])
            else:
                raw = _decompress(bytes(buf[off : off + cnt]), compression, path)
            return _undo_predictor3(raw, n_rows, n_cols, seg_spp, dt, path)
        if compression == 1:
            arr = np.frombuffer(buf, dtype=dt, count=n_samples, offset=off)
            if arr.nbytes > cnt:
                raise ValueError(f"{path}: {label} shorter than its pixel span")
        else:
            raw = _decompress(bytes(buf[off : off + cnt]), compression, path)
            want = n_samples * dt.itemsize
            if len(raw) < want:
                raise ValueError(
                    f"{path}: {label} decompressed to {len(raw)} bytes, "
                    f"expected {want}"
                )
            arr = np.frombuffer(raw, dtype=dt, count=n_samples)
        return _undo_predictor(
            arr.reshape(n_rows, n_cols, seg_spp), predictor, dt, path
        )

    n_planes = 1 if planar == 1 else spp
    tiled = 322 in tags or 323 in tags
    if tiled:
        tw = int(tags[322][0])
        th = int(tags[323][0])
        offsets = [int(v) for v in tags[324]]
        counts = [int(v) for v in tags[325]]
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        per_plane = across * down
        if len(offsets) != per_plane * n_planes:
            raise ValueError(
                f"{path}: {len(offsets)} tiles for a {across}x{down} tile "
                f"grid x {n_planes} plane(s)"
            )
        # tiles are padded to full (th, tw) at the right/bottom edges
        # (spec: tile data is always tile-sized); decode all, then crop.
        # planar layout stores all of plane 0's tiles, then plane 1's, …
        planes = []
        for p in range(n_planes):
            full = np.empty(
                (down * th, across * tw, seg_spp), dtype=dt.newbyteorder("=")
            )
            for ti in range(per_plane):
                off = offsets[p * per_plane + ti]
                cnt = counts[p * per_plane + ti]
                ty, tx = divmod(ti, across)
                full[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = segment(
                    off, cnt, th, tw, f"plane {p} tile {ti}"
                )
            planes.append(full[:height, :width])
        stacked = np.concatenate(planes, axis=2)  # (h, w, spp)
    else:
        offsets = [int(v) for v in tags[273]]
        counts = [int(v) for v in tags[279]]
        rows_per_strip = int(tags.get(278, [height])[0])
        per_plane = (height + rows_per_strip - 1) // rows_per_strip
        if len(offsets) != per_plane * n_planes:
            raise ValueError(
                f"{path}: {len(offsets)} strips for {per_plane} rows-chunks "
                f"x {n_planes} plane(s)"
            )
        planes = []
        for p in range(n_planes):
            rows = []
            for si in range(per_plane):
                off = offsets[p * per_plane + si]
                cnt = counts[p * per_plane + si]
                n_rows = min(rows_per_strip, height - si * rows_per_strip)
                rows.append(segment(off, cnt, n_rows, width, f"plane {p} strip {si}"))
            planes.append(np.concatenate(rows, axis=0))
        stacked = np.concatenate(planes, axis=2)  # (h, w, spp)
    grid = np.moveaxis(stacked, 2, 0).astype(np.float64)  # (spp, h, w)

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


def read_geotiff(path: str, band: int | None = None) -> tuple[RasterMeta, np.ndarray]:
    """Parse a GeoTIFF into (RasterMeta, (height, width) float64 grid).

    Single-band files need no ``band``; for a multi-band file pass the
    0-based band index (or use ``read_geotiff_bands`` for all of them) —
    silently returning band 0 of an RGB raster would misread the file,
    so the default raises instead."""
    meta, bands_arr = _read_geotiff_impl(path)
    n = bands_arr.shape[0]
    if band is None:
        if n != 1:
            raise ValueError(
                f"{path}: {n} bands — pass band=<0..{n - 1}> or use "
                "read_geotiff_bands"
            )
        return meta, bands_arr[0]
    if not 0 <= band < n:
        raise ValueError(f"{path}: band {band} out of range (file has {n})")
    return meta, bands_arr[band]


def read_geotiff_bands(path: str) -> tuple[RasterMeta, np.ndarray]:
    """Parse a GeoTIFF into (RasterMeta, (bands, height, width) float64
    array) — the multi-band surface; chunky and planar layouts both land
    in band-major order."""
    return _read_geotiff_impl(path)


def _predict_encode(seg: np.ndarray, predictor: int, stride: int) -> bytes:
    """Writer-side predictor application to one segment (rows first
    axis; samples flattened row-major within a row).  Predictor 2:
    per-channel modular sample differencing.  Predictor 3: the exact
    inverse of ``_undo_predictor3`` — big-endian byte-plane split per
    row, then byte differencing at ``stride``."""
    a = np.ascontiguousarray(seg)
    rows = a.shape[0]
    n = a.size // rows if rows else 0
    if predictor == 2:
        if a.dtype.kind not in "iu":
            raise NotImplementedError("Predictor=2 needs integer samples")
        u = a.reshape(rows, n).astype(np.dtype(f"u{a.dtype.itemsize}"), copy=True)
        ch = u.reshape(rows, n // stride, stride)
        out = ch.copy()
        out[:, 1:, :] = ch[:, 1:, :] - ch[:, :-1, :]
        return out.view(a.dtype).tobytes()
    if predictor == 3:
        if a.dtype.kind != "f":
            raise NotImplementedError("Predictor=3 needs float samples")
        bps = a.dtype.itemsize
        be = a.reshape(rows, n).astype(np.dtype(f">f{bps}"))
        b = np.frombuffer(be.tobytes(), np.uint8).reshape(rows, n, bps)
        planes = np.ascontiguousarray(b.transpose(0, 2, 1)).reshape(rows, n * bps)
        ch = planes.reshape(rows, (n * bps) // stride, stride)
        out = ch.copy()
        out[:, 1:, :] = ch[:, 1:, :] - ch[:, :-1, :]
        return out.tobytes()
    raise ValueError(f"predictor={predictor}")


def write_geotiff(
    path: str,
    meta: RasterMeta,
    grid: np.ndarray,
    dtype: str = "f8",
    compress: str | None = None,
    tile: int | None = None,
    planar: str = "chunky",
    predictor: int = 1,
) -> None:
    """Write a (height, width) or (bands, height, width) grid as a
    little-endian GeoTIFF (pixel scale + tiepoint + EPSG geokeys +
    GDAL_NODATA) — a profile ``read_geotiff``/``read_geotiff_bands``
    parses and any GDAL-based tool opens.

    ``compress``: None (default), ``"deflate"`` (zlib) or ``"lzw"``
    (TIFF-variant codes, see ``_lzw_encode``).  ``tile``: side length to
    write a tiled layout instead of strips (edge tiles padded with
    ``meta.nodata`` per spec).  ``planar``: multi-band sample layout —
    ``"chunky"`` interleaves samples per pixel (PlanarConfiguration=1,
    the GDAL default), ``"planar"`` writes one segment set per band."""
    grid = np.ascontiguousarray(np.asarray(grid), dtype=np.dtype("<" + dtype))
    if grid.ndim == 2:
        grid = grid[None]
    spp, height, width = grid.shape
    if planar not in ("chunky", "planar"):
        raise ValueError(f"planar={planar!r} (chunky or planar)")
    planar_code = 1 if planar == "chunky" else 2
    fmt_code = {"u": 1, "i": 2, "f": 3}[np.dtype(dtype).kind]
    bits = grid.dtype.itemsize * 8
    comp_code = {None: 1, "deflate": 8, "lzw": 5}[compress]

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
    add(258, 3, [bits] * spp)
    add(259, 3, [comp_code])
    add(262, 3, [1])            # BlackIsZero
    add(277, 3, [spp])
    add(284, 3, [planar_code])
    add(339, 3, [fmt_code] * spp)
    if spp > 1:
        # extra bands beyond the photometric one are "unspecified data"
        # (spec tag 338) — what GDAL writes for generic multi-band rasters
        add(338, 3, [0] * (spp - 1))
    add(33550, 12, [meta.pixel, meta.pixel, 0.0])
    add(33922, 12, [0.0, 0.0, 0.0, meta.origin_x, meta.origin_y, 0.0])
    add(34735, 3, geo_keys)
    add(42113, 2, list(nodata_ascii))

    # chunky: ONE plane with samples interleaved on a trailing axis;
    # planar: one (h, w) plane per band, segments concatenated band-major
    # (the same order the reader's plane loop expects)
    if planar_code == 1:
        plane_arrays = [np.moveaxis(grid, 0, 2)]
    else:
        plane_arrays = [grid[b] for b in range(spp)]

    if tile is None:
        rows_per_strip = max(1, min(height, 8192))
        per_plane = (height + rows_per_strip - 1) // rows_per_strip
        seg_arrays = [
            pa[s * rows_per_strip : (s + 1) * rows_per_strip]
            for pa in plane_arrays
            for s in range(per_plane)
        ]
        n_segs = len(seg_arrays)
        add(278, 4, [rows_per_strip])
        off_tag, cnt_tag = 273, 279
    else:
        th = tw = int(tile)
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        seg_arrays = []
        for pa in plane_arrays:
            padded = np.full(
                (down * th, across * tw) + pa.shape[2:], meta.nodata,
                dtype=grid.dtype,
            )
            padded[:height, :width] = pa
            seg_arrays.extend(
                padded[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
                for ty in range(down)
                for tx in range(across)
            )
        n_segs = len(seg_arrays)
        add(322, 4, [tw])
        add(323, 4, [th])
        off_tag, cnt_tag = 324, 325

    if predictor not in (1, 2, 3):
        raise ValueError(f"predictor={predictor} (1, 2 or 3)")
    if predictor != 1:
        add(317, 3, [predictor])
        pred_stride = spp if planar_code == 1 else 1
        seg_bytes = [_predict_encode(s, predictor, pred_stride) for s in seg_arrays]
    else:
        seg_bytes = [np.ascontiguousarray(s).tobytes() for s in seg_arrays]
    if compress == "deflate":
        import zlib

        segments = [zlib.compress(b) for b in seg_bytes]
    elif compress == "lzw":
        segments = [_lzw_encode(b) for b in seg_bytes]
    else:
        segments = seg_bytes
    byte_counts = [len(s) for s in segments]
    add(off_tag, 4, [0] * n_segs)  # offsets patched below
    add(cnt_tag, 4, byte_counts)
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
    # lay out out-of-line blobs (word-aligned), then the data segments —
    # the offsets placeholder already has its final SIZE (n_segs
    # uint32s), so one layout pass is exact and the patch below never
    # shifts offsets
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
    seg_offsets = []
    for s in segments:
        seg_offsets.append(off)
        off += len(s)
    # patch StripOffsets/TileOffsets with the real positions
    for idx, (tag, ttype, count, inline, blob) in enumerate(packed_entries):
        if tag == off_tag:
            raw = struct.pack("<" + "I" * n_segs, *seg_offsets)
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
        for s, soff in zip(segments, seg_offsets):
            assert pos == soff
            f.write(s)
            pos += len(s)


def read_geotiff_cells(spark, path: str, band: int | None = None):
    """GeoTIFF → the engine's long-form cell DataFrame (row, col, x, y,
    value) + its RasterMeta.  ``band`` selects one band of a multi-band
    file (the engine's raster model is one value column per cell)."""
    from ..model.raster import raster_df

    meta, grid = read_geotiff(path, band=band)
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
