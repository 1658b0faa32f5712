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
    # a ~1% box over a z-clustered layout must skip most files
    assert rep["files_total"] >= 8
    assert rep["files_read"] < rep["files_total"] / 2
    assert rep["rows_in_read_files"] < rep["rows_total"] / 2
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


def test_bbox_z_intervals_cover_and_cap(spark):
    ivs = _bbox_z_intervals((2.0, 3.0, 5.0, 6.5), 8, BOUNDS, max_tiles=64)
    assert 1 <= len(ivs) <= 64
    assert ivs == sorted(ivs)
    for lo, hi in ivs:
        assert lo <= hi and (lo >> 56) == 8 and (hi >> 56) == 8
    # intervals are disjoint
    for (l1, h1), (l2, h2) in zip(ivs, ivs[1:]):
        assert h1 < l2
