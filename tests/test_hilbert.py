"""Hilbert curve: bijectivity, the exact step-1 adjacency property,
roundtrip, and the measured locality advantage over Morton that
justifies offering it next to Z-order clustering."""

import numpy as np
import pytest

from gregor_spark.geo.cells import morton_encode
from gregor_spark.geo.hilbert import hilbert_decode, hilbert_encode


def _full_grid(res):
    n = 1 << res
    iy, ix = np.mgrid[0:n, 0:n]
    return ix.ravel().astype(np.int64), iy.ravel().astype(np.int64)


@pytest.mark.parametrize("res", [1, 2, 3, 6])
def test_hilbert_bijective_and_step1(res):
    ix, iy = _full_grid(res)
    d = hilbert_encode(ix, iy, res)
    n2 = (1 << res) ** 2
    assert sorted(d.tolist()) == list(range(n2))
    # walk the curve: EVERY consecutive pair of ranks is Manhattan-adjacent
    order = np.argsort(d)
    dx = np.abs(np.diff(ix[order]))
    dy = np.abs(np.diff(iy[order]))
    assert ((dx + dy) == 1).all()


@pytest.mark.parametrize("res", [1, 4, 10, 16])
def test_hilbert_roundtrip(res):
    rng = np.random.RandomState(7)
    n = 1 << res
    ix = rng.randint(0, n, size=500).astype(np.int64)
    iy = rng.randint(0, n, size=500).astype(np.int64)
    d = hilbert_encode(ix, iy, res)
    rx, ry = hilbert_decode(d, res)
    assert (rx == ix).all() and (ry == iy).all()
    assert (d >= 0).all() and (d < np.int64(n) * n).all()


def test_hilbert_beats_morton_range_fragmentation():
    """The clustering metric that matters for file-skipping: a square
    query box should decompose into FEWER contiguous rank runs under
    Hilbert than under Morton (mean-rank-gap is a red herring — Morton
    actually wins that one; its losses are the huge seam jumps, which
    show up as run fragmentation).  Measured at res 6: ~3.8 vs ~5.9
    runs for 4×4 boxes, ~8.2 vs ~14.4 for 8×8."""
    res = 6
    n = 1 << res
    ix, iy = _full_grid(res)
    h = hilbert_encode(ix, iy, res).reshape(n, n)
    m = morton_encode(ix, iy).reshape(n, n)
    rng = np.random.RandomState(3)

    def mean_runs(g, q, trials=200):
        tot = 0
        for _ in range(trials):
            x0, y0 = rng.randint(0, n - q), rng.randint(0, n - q)
            r = np.sort(g[y0 : y0 + q, x0 : x0 + q].ravel())
            tot += 1 + int((np.diff(r) > 1).sum())
        return tot / trials

    for q in (4, 8):
        assert mean_runs(h, q) < mean_runs(m, q)


def test_hilbert_known_order_res1():
    # the canonical res-1 curve: (0,0) -> (0,1) -> (1,1) -> (1,0)
    ix = np.array([0, 0, 1, 1])
    iy = np.array([0, 1, 1, 0])
    assert hilbert_encode(ix, iy, 1).tolist() == [0, 1, 2, 3]


def test_hilbert_out_of_range_raises():
    with pytest.raises(ValueError, match="out of range"):
        hilbert_encode(np.array([4]), np.array([0]), 2)
    with pytest.raises(ValueError, match="res must be"):
        hilbert_encode(np.array([0]), np.array([0]), 0)


def test_hilbert_spark_column_and_sql_twin(spark):
    """The pandas-UDF column and the generated DuckDB CTE chain agree on
    random coords — the machinery the contract oracle reuses."""
    import duckdb

    from gregor_spark.geo.hilbert import hilbert_col, hilbert_sql_cte
    from pyspark.sql import functions as F

    res = 8
    df = spark.range(2000).select(
        F.col("id"),
        ((F.col("id") * 48271 + 7) % 100003 % 256).alias("ix"),
        ((F.col("id") * 16807 + 11) % 100003 % 256).alias("iy"),
    )
    got = {
        r.id: r.hd
        for r in df.select(
            "id", hilbert_col(F.col("ix"), F.col("iy"), res).alias("hd")
        ).collect()
    }
    sql = f"""
    WITH src AS (
      SELECT range AS id, (range * 48271 + 7) % 100003 % 256 AS ix,
             (range * 16807 + 11) % 100003 % 256 AS iy
      FROM range(2000)),
    {hilbert_sql_cte('src', res)}
    SELECT id, hd FROM hfinal
    """
    want = dict(duckdb.sql(sql).fetchall())
    assert got == want
