"""Hierarchical Morton (Z-order) cell index — the engine's H3/S2 stand-in.

Pure numpy, fully vectorized.  A cell id packs (resolution, morton code)
into one positive int64:

    cell_id = (res << 56) | interleave_bits(ix, iy)      res in [0, 26]

At resolution r the world bbox (default the whole lon/lat plane) is a
2^r x 2^r grid.  Morton codes are hierarchical: ``parent`` truncates two
bits, ``children`` appends them, so coarser covers are prefix ranges —
exactly the property the spatial hash join and the Iceberg-style layout
partitioning rely on.  Z-order also gives 1-D spatial locality, so
range-partitioning by cell_id co-locates neighboring tiles.

API mirrors H3 (cell/parent/children/polyfill/disk) per SURVEY.md §2.2;
correctness does not depend on hexagons, only on a consistent
hierarchical cover (SURVEY.md §7 hard-part (b)).
"""

from __future__ import annotations

import numpy as np

from . import kernels as K

MAX_RES = 26
_RES_SHIFT = 56

# Default world bounds (lon/lat).  All cell functions accept an explicit
# bounds for planar/test grids.
WORLD = (-180.0, -90.0, 180.0, 90.0)


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits of the low 32 bits (classic magic masks)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return (_part1by1(np.asarray(ix)) | (_part1by1(np.asarray(iy)) << np.uint64(1))).astype(
        np.int64
    )


def morton_decode(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(m).astype(np.uint64)
    return (
        _compact1by1(m).astype(np.int64),
        _compact1by1(m >> np.uint64(1)).astype(np.int64),
    )


def xy_to_tile(
    x: np.ndarray, y: np.ndarray, res: int, bounds: tuple[float, float, float, float] = WORLD
) -> tuple[np.ndarray, np.ndarray]:
    """Integer tile coords (ix, iy) at resolution ``res`` (iy 0 at miny)."""
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    fx = (np.asarray(x, dtype=np.float64) - minx) / (maxx - minx)
    fy = (np.asarray(y, dtype=np.float64) - miny) / (maxy - miny)
    ix = np.clip(np.floor(fx * n).astype(np.int64), 0, n - 1)
    iy = np.clip(np.floor(fy * n).astype(np.int64), 0, n - 1)
    return ix, iy


def cell(
    x: np.ndarray, y: np.ndarray, res: int, bounds: tuple[float, float, float, float] = WORLD
) -> np.ndarray:
    """Point -> cell_id at resolution ``res`` (H3 ``latlng_to_cell`` analog)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    ix, iy = xy_to_tile(x, y, res, bounds)
    return (np.int64(res) << np.int64(_RES_SHIFT)) | morton_encode(ix, iy)


def cell_res(cell_id: np.ndarray) -> np.ndarray:
    return (np.asarray(cell_id, dtype=np.int64) >> np.int64(_RES_SHIFT)).astype(np.int64)


def cell_tile(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = np.asarray(cell_id, dtype=np.int64) & ((np.int64(1) << np.int64(_RES_SHIFT)) - 1)
    return morton_decode(m)


def parent(cell_id: np.ndarray, parent_res: int | None = None) -> np.ndarray:
    """Truncate to a coarser resolution (H3 ``cell_to_parent`` analog)."""
    cid = np.asarray(cell_id, dtype=np.int64)
    res = cell_res(cid)
    pres = np.asarray(res - 1 if parent_res is None else parent_res, dtype=np.int64)
    m = cid & ((np.int64(1) << np.int64(_RES_SHIFT)) - 1)
    shift = np.asarray(2 * (res - pres), dtype=np.int64)
    return (pres << np.int64(_RES_SHIFT)) | (m >> shift)


def children(cell_id: int) -> np.ndarray:
    """The four child cells one resolution finer."""
    cid = np.int64(cell_id)
    res = int(cell_res(cid))
    m = cid & ((np.int64(1) << np.int64(_RES_SHIFT)) - 1)
    base = (np.int64(res + 1) << np.int64(_RES_SHIFT)) | (m << np.int64(2))
    return base + np.arange(4, dtype=np.int64)


def cell_bounds(
    cell_id: np.ndarray, bounds: tuple[float, float, float, float] = WORLD
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(minx, miny, maxx, maxy) arrays for each cell."""
    cid = np.asarray(cell_id, dtype=np.int64)
    res = cell_res(cid)
    ix, iy = cell_tile(cid)
    minx, miny, maxx, maxy = bounds
    n = (np.int64(1) << res).astype(np.float64)
    w = (maxx - minx) / n
    h = (maxy - miny) / n
    return minx + ix * w, miny + iy * h, minx + (ix + 1) * w, miny + (iy + 1) * h


def neighbors(cell_id: np.ndarray, ring: int = 1) -> np.ndarray:
    """All cells within a (2*ring+1)^2 Moore neighborhood, clipped to the
    grid — the kNN ring-expansion primitive.  Returns unique ids."""
    cid = np.asarray(cell_id, dtype=np.int64).ravel()
    res = cell_res(cid)
    n = np.int64(1) << res
    ix, iy = cell_tile(cid)
    offs = np.arange(-ring, ring + 1, dtype=np.int64)
    dx, dy = np.meshgrid(offs, offs)
    nx = ix[:, None] + dx.ravel()[None, :]
    ny = iy[:, None] + dy.ravel()[None, :]
    valid = (nx >= 0) & (ny >= 0) & (nx < n[:, None]) & (ny < n[:, None])
    res_b = np.broadcast_to(res[:, None], nx.shape)
    out = (res_b << np.int64(_RES_SHIFT)) | morton_encode(
        np.where(valid, nx, 0), np.where(valid, ny, 0)
    )
    return np.unique(out[valid])


def polyfill(
    xs: np.ndarray,
    ys: np.ndarray,
    res: int,
    bounds: tuple[float, float, float, float] = WORLD,
    classify: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Cells at resolution ``res`` whose tile rectangle intersects the
    polygon (conservative cover; refined later by exact PIP).

    With ``classify=True`` also returns a boolean ``full`` mask: cells
    wholly inside the polygon (intersection area == cell area).  Facts in
    a full cell are strictly interior, so the exact PIP refine — the only
    Python in the join — can skip them entirely; only the boundary band
    (perimeter·cellsize / area, a few %) pays the Arrow round trip.

    Driver-side: polygons (zones) are small and broadcastable
    (SURVEY.md §2.2).  Cost is O(bbox tiles); resolution choice bounds it.
    """
    return polyfill_rings([(xs, ys, False)], res, bounds, classify)


def _single_rect(rings) -> tuple[float, float, float, float] | None:
    """(minx, miny, maxx, maxy) when ``rings`` is exactly one non-hole
    ring whose vertices are the four corners of an axis-aligned
    rectangle (closing vertex optional); else None."""
    if len(rings) != 1 or rings[0][2]:
        return None
    xs = np.asarray(rings[0][0], dtype=np.float64)
    ys = np.asarray(rings[0][1], dtype=np.float64)
    if xs.size > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    if xs.size != 4:
        return None
    ux, uy = np.unique(xs), np.unique(ys)
    if ux.size != 2 or uy.size != 2:
        return None
    corners = {(x, y) for x, y in zip(xs.tolist(), ys.tolist())}
    want = {(x, y) for x in ux.tolist() for y in uy.tolist()}
    if corners != want:
        return None
    return float(ux[0]), float(uy[0]), float(ux[1]), float(uy[1])


def polyfill_rings(
    rings: list,
    res: int,
    bounds: tuple[float, float, float, float] = WORLD,
    classify: bool = False,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """``polyfill`` over ring-list geometry (exterior parts + holes): a
    cell is covered when its intersection area with the holed multi-part
    polygon is positive, and ``full`` when that area equals the cell area
    (strictly interior to an exterior part AND outside every hole)."""
    minx, miny, maxx, maxy = bounds
    n = 1 << res
    w = (maxx - minx) / n
    h = (maxy - miny) / n
    ext_bbs = [K.polygon_bbox(rx, ry) for rx, ry, hole in rings if not hole]
    if not ext_bbs:
        empty = np.empty(0, dtype=np.int64)
        return (empty, np.empty(0, dtype=bool)) if classify else empty
    bb = np.asarray(ext_bbs)
    bxmin, bymin = bb[:, 0].min(), bb[:, 1].min()
    bxmax, bymax = bb[:, 2].max(), bb[:, 3].max()
    ix0 = max(0, int(np.floor((bxmin - minx) / w)))
    iy0 = max(0, int(np.floor((bymin - miny) / h)))
    ix1 = min(n - 1, int(np.floor((bxmax - minx) / w + 1e-12)))
    iy1 = min(n - 1, int(np.floor((bymax - miny) / h + 1e-12)))
    # full-cell test uses an EXPANDED cell: if cell+δ is contained in the
    # closed polygon, every point of the closed cell (incl. its edges) is
    # strictly interior — so boundary-rule semantics (west-wall exclusion,
    # shared-edge ties) can never apply there and the refine skip is safe
    delta = 1e-9 * max(w, h)
    exp_area = (w + 2 * delta) * (h + 2 * delta)

    # r8 fast path for the overwhelmingly common single axis-aligned
    # rectangle ring: classify the whole candidate grid with vectorized
    # strict-margin compares — cells strictly inside are covered+full,
    # cells with no expanded-bbox overlap are uncovered, and ONLY the
    # boundary band (O(perimeter) cells) runs the exact clip kernel.
    # Decisions are identical to the kernel loop by construction: the
    # margins are strict, so every cell the compares cannot prove is
    # handed to the same kernel, and a strictly-interior cell's kernel
    # area equals exp_area to ~1e-16 relative — far inside the 1e-12
    # full-test slack.  (Profiled: zones.cover(res=8) on the 2×2 box
    # fixture was 2.9 s of per-cell Python; the band is ~3% of cells.)
    rect = _single_rect(rings)
    if rect is not None:
        rx0, ry0, rx1, ry1 = rect
        ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
        iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
        cminx = minx + ixs * w
        cminy = miny + iys * h
        gx = np.broadcast_to(cminx[None, :], (iys.size, ixs.size))
        gy = np.broadcast_to(cminy[:, None], (iys.size, ixs.size))
        inner = (
            (gx - delta > rx0)
            & (gx + w + delta < rx1)
            & (gy - delta > ry0)
            & (gy + h + delta < ry1)
        )
        outer = (
            (gx - delta >= rx1)
            | (gx + w + delta <= rx0)
            | (gy - delta >= ry1)
            | (gy + h + delta <= ry0)
        )
        band = ~(inner | outer)
        covered = inner.copy()
        full = inner.copy()
        for biy, bix in zip(*np.nonzero(band)):
            cx0 = minx + ixs[bix] * w
            cy0 = miny + iys[biy] * h
            a_exp = K.intersection_area_rect_rings(
                rings, cx0 - delta, cy0 - delta, cx0 + w + delta, cy0 + h + delta
            )
            if a_exp > 0.0:
                covered[biy, bix] = True
                full[biy, bix] = a_exp >= exp_area * (1.0 - 1e-12)
        # np.nonzero is row-major — identical emission order to the loop
        sel_iy, sel_ix = np.nonzero(covered)
        out_ix = ixs[sel_ix].tolist()
        out_iy = iys[sel_iy].tolist()
        out_full = full[sel_iy, sel_ix].tolist()
    else:
        out_ix, out_iy, out_full = [], [], []
        for iy in range(iy0, iy1 + 1):
            cminy = miny + iy * h
            for ix in range(ix0, ix1 + 1):
                cminx = minx + ix * w
                a_exp = K.intersection_area_rect_rings(
                    rings,
                    cminx - delta,
                    cminy - delta,
                    cminx + w + delta,
                    cminy + h + delta,
                )
                if a_exp > 0.0:
                    out_ix.append(ix)
                    out_iy.append(iy)
                    out_full.append(a_exp >= exp_area * (1.0 - 1e-12))
    if not out_ix:
        empty = np.empty(0, dtype=np.int64)
        return (empty, np.empty(0, dtype=bool)) if classify else empty
    cells = (np.int64(res) << np.int64(_RES_SHIFT)) | morton_encode(
        np.asarray(out_ix, dtype=np.int64), np.asarray(out_iy, dtype=np.int64)
    )
    if classify:
        return cells, np.asarray(out_full, dtype=bool)
    return cells
