"""Z-order file clustering: bbox reads match full-scan-and-filter
exactly while the manifest prunes most data files unopened."""

import os

from pyspark.sql import functions as F

from gregor_spark.sources.iceberg_like import (
    _bbox_z_intervals,
    read_zordered,
    zorder_skip_report,
    zorder_table,
)

BOUNDS = (0.0, 0.0, 16.0, 16.0)


def _pts(spark, n=4000):
    m1 = (F.col("id") * F.lit(1103515245) + F.lit(12345)) % F.lit(100003)
    m2 = (F.col("id") * F.lit(69069) + F.lit(54321)) % F.lit(100003)
    return spark.range(n).select(
        F.col("id").alias("pid"),
        (F.lit(16.0) * (m1 / F.lit(100003.0))).alias("x"),
        (F.lit(16.0) * (m2 / F.lit(100003.0))).alias("y"),
    )


def test_zorder_bbox_read_matches_full_filter(spark, tmp_path):
    path = str(tmp_path / "zt")
    df = _pts(spark)
    m = zorder_table(df, path, res=8, bounds=BOUNDS, n_files=16)
    assert m["total_rows"] == 4000 and len(m["files"]) > 4
    bbox = (2.0, 3.0, 5.0, 6.5)
    got = sorted(
        (r.pid, r.x, r.y) for r in read_zordered(spark, path, bbox).collect()
    )
    want = sorted(
        (r.pid, r.x, r.y)
        for r in spark.read.parquet(path)
        .where(
            (F.col("x") >= bbox[0]) & (F.col("x") <= bbox[2])
            & (F.col("y") >= bbox[1]) & (F.col("y") <= bbox[3])
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_zorder_skips_files(spark, tmp_path):
    path = str(tmp_path / "zt2")
    zorder_table(_pts(spark), path, res=8, bounds=BOUNDS, n_files=16)
    rep = zorder_skip_report(path, (1.0, 1.0, 2.5, 2.5))
    # a ~1% box over a z-clustered layout must skip almost everything
    # (r6 BigMin-style quadtree cover: was <1/2 with the coarse-prefix
    # cover, now 1 file of 16 on this layout — assert the <1/3 bar)
    assert rep["files_total"] >= 8
    assert rep["files_read"] < rep["files_total"] / 3
    assert rep["rows_in_read_files"] < rep["rows_total"] / 3
    # ...and reading it still yields exactly the right rows
    got = read_zordered(spark, path, (1.0, 1.0, 2.5, 2.5)).count()
    want = (
        spark.read.parquet(path)
        .where(
            (F.col("x") >= 1.0) & (F.col("x") <= 2.5)
            & (F.col("y") >= 1.0) & (F.col("y") <= 2.5)
        )
        .count()
    )
    assert got == want


def test_zorder_empty_bbox_region(spark, tmp_path):
    path = str(tmp_path / "zt3")
    zorder_table(_pts(spark, 500), path, res=8, bounds=BOUNDS, n_files=4)
    # a sliver between points can legitimately be empty; rows must match
    bbox = (15.99, 15.99, 16.0, 16.0)
    got = read_zordered(spark, path, bbox).count()
    want = (
        spark.read.parquet(path)
        .where((F.col("x") >= 15.99) & (F.col("y") >= 15.99))
        .count()
    )
    assert got == want


def test_bbox_z_intervals_exact_coverage():
    """The cover must contain EVERY cell intersecting the rect (missing
    one would silently drop rows at read time) — checked cell-by-cell
    against the raw Morton encoder across box shapes and resolutions."""
    import numpy as np

    from gregor_spark.geo import cells as C

    boxes = [
        (1.0, 1.0, 2.5, 2.5),      # compact
        (0.3, 7.9, 15.7, 8.1),     # full-width thin strip
        (15.9, 0.1, 16.0, 15.9),   # full-height sliver
        (0.0, 0.0, 16.0, 16.0),    # whole domain
        (7.99, 7.99, 8.01, 8.01),  # quadrant-corner crossing
    ]
    for bbox in boxes:
        for res in (4, 6, 8):
            ivs = _bbox_z_intervals(bbox, res, BOUNDS)
            assert 1 <= len(ivs) <= 64
            for (l1, h1), (l2, h2) in zip(ivs, ivs[1:]):
                assert h1 < l2  # sorted + disjoint
            ix0, iy0 = (
                int(v[0])
                for v in C.xy_to_tile(
                    np.array([bbox[0]]), np.array([bbox[1]]), res, BOUNDS
                )
            )
            ix1, iy1 = (
                int(v[0])
                for v in C.xy_to_tile(
                    np.array([bbox[2]]), np.array([bbox[3]]), res, BOUNDS
                )
            )
            tag = res << 56
            for iy in range(iy0, iy1 + 1):
                for ix in range(ix0, ix1 + 1):
                    m = tag | int(
                        C.morton_encode(np.array([ix]), np.array([iy]))[0]
                    )
                    assert any(lo <= m <= hi for lo, hi in ivs), (
                        bbox,
                        res,
                        (ix, iy),
                    )


def test_bbox_z_intervals_tight_on_elongated_boxes():
    """Elongated boxes are where the quadtree cover beats the old
    coarse-prefix cover: the summed interval span must stay within a
    small multiple of the rect's own cell area, not blow up to the
    enclosing square's."""
    cases = [
        ((0.3, 7.9, 15.7, 8.1), 8),   # 247×4-cell strip
        ((15.9, 0.1, 16.0, 15.9), 8),  # 2×253-cell sliver
    ]
    for bbox, res in cases:
        import numpy as np

        from gregor_spark.geo import cells as C

        ix0, iy0 = (
            int(v[0])
            for v in C.xy_to_tile(
                np.array([bbox[0]]), np.array([bbox[1]]), res, BOUNDS
            )
        )
        ix1, iy1 = (
            int(v[0])
            for v in C.xy_to_tile(
                np.array([bbox[2]]), np.array([bbox[3]]), res, BOUNDS
            )
        )
        area = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
        span = sum(hi - lo + 1 for lo, hi in _bbox_z_intervals(bbox, res, BOUNDS))
        assert span <= 3 * area, (bbox, res, span, area)


def test_zorder_elongated_bbox_read_parity(spark, tmp_path):
    path = str(tmp_path / "zt4")
    zorder_table(_pts(spark), path, res=8, bounds=BOUNDS, n_files=16)
    bbox = (0.3, 7.9, 15.7, 8.1)
    got = sorted(
        (r.pid,) for r in read_zordered(spark, path, bbox).collect()
    )
    want = sorted(
        (r.pid,)
        for r in spark.read.parquet(path)
        .where(
            (F.col("x") >= bbox[0]) & (F.col("x") <= bbox[2])
            & (F.col("y") >= bbox[1]) & (F.col("y") <= bbox[3])
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_bbox_z_intervals_cover_and_cap(spark):
    ivs = _bbox_z_intervals((2.0, 3.0, 5.0, 6.5), 8, BOUNDS, max_tiles=64)
    assert 1 <= len(ivs) <= 64
    assert ivs == sorted(ivs)
    for lo, hi in ivs:
        assert lo <= hi and (lo >> 56) == 8 and (hi >> 56) == 8
    # intervals are disjoint
    for (l1, h1), (l2, h2) in zip(ivs, ivs[1:]):
        assert h1 < l2


# ------------------------------------------------- r7: Hilbert layout


def test_hilbert_curve_bbox_read_matches_full_filter(spark, tmp_path):
    path = str(tmp_path / "ht")
    m = zorder_table(
        _pts(spark), path, res=8, bounds=BOUNDS, n_files=16, curve="hilbert"
    )
    assert m["layout"]["curve"] == "hilbert"
    assert all("min_ix" in f and "min_iy" in f for f in m["files"])
    for bbox in ((2.0, 3.0, 5.0, 6.5), (0.0, 15.0, 16.0, 16.0), (9.0, 9.0, 9.1, 9.1)):
        got = sorted(
            (r.pid, r.x, r.y) for r in read_zordered(spark, path, bbox).collect()
        )
        want = sorted(
            (r.pid, r.x, r.y)
            for r in spark.read.parquet(path)
            .where(
                (F.col("x") >= bbox[0]) & (F.col("x") <= bbox[2])
                & (F.col("y") >= bbox[1]) & (F.col("y") <= bbox[3])
            )
            .collect()
        )
        assert got == want


def test_hilbert_curve_skips_files(spark, tmp_path):
    path = str(tmp_path / "ht2")
    zorder_table(
        _pts(spark), path, res=8, bounds=BOUNDS, n_files=16, curve="hilbert"
    )
    rep = zorder_skip_report(path, (1.0, 1.0, 2.5, 2.5))
    assert rep["files_total"] >= 8
    # Hilbert locality: a ~1% box touches a small corner of the layout
    assert rep["files_read"] < rep["files_total"] / 3
    got = read_zordered(spark, path, (1.0, 1.0, 2.5, 2.5)).count()
    assert got > 0


def test_hilbert_vs_morton_layout_locality(spark, tmp_path):
    """The apples-to-apples layout comparison (same per-file
    tile-RECTANGLE predicate on both — morton's production path keeps
    the stronger exact z-interval decomposition, which out-prunes any
    rectangle test and is NOT the layout-locality claim): under the
    same pruning mechanism, the Hilbert layout must touch no more
    files over a sweep of query boxes than the Morton layout."""
    pm = str(tmp_path / "cm")
    ph = str(tmp_path / "ch")
    df = _pts(spark, 20000)
    zorder_table(df, pm, res=8, bounds=BOUNDS, n_files=32)
    zorder_table(df, ph, res=8, bounds=BOUNDS, n_files=32, curve="hilbert")
    boxes = [
        (x0, y0, x0 + 2.0, y0 + 2.0)
        for x0 in (0.5, 4.5, 8.5, 12.5)
        for y0 in (1.0, 5.0, 9.0, 13.0)
    ]
    fm = sum(zorder_skip_report(pm, b, method="rect")["files_read"] for b in boxes)
    fh = sum(zorder_skip_report(ph, b, method="rect")["files_read"] for b in boxes)
    assert fh <= fm, (fh, fm)


def test_zorder_rejects_unknown_curve(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="curve"):
        zorder_table(_pts(spark, 10), str(tmp_path / "xx"), res=4,
                     bounds=BOUNDS, curve="peano")
