"""Quantiles: exact (vs numpy linear interpolation) and histogram
(bounded-state scale path, one-bin-width error bound)."""

import numpy as np
from pyspark.sql import functions as F

from gregor_spark.ops.stats import quantiles_exact, quantiles_histogram

QS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]


def _vals(spark, n=500):
    return spark.range(n).select(
        (((F.col("id") * 37) % 1009) * F.lit(0.37)).alias("v"),
        (F.col("id") % 3).cast("int").alias("g"),
    )


def test_exact_matches_numpy(spark):
    df = _vals(spark)
    arr = np.array([r.v for r in df.select("v").collect()])
    got = {r.q: r.value_r for r in quantiles_exact(df, "v", QS).collect()}
    for q in QS:
        want = round(float(np.percentile(arr, q * 100, method="linear")), 6)
        assert abs(got[q] - want) < 1e-6, (q, got[q], want)


def test_histogram_within_error_bound(spark):
    df = _vals(spark)
    arr = np.sort(np.array([r.v for r in df.select("v").collect()]))
    width = (arr.max() - arr.min()) / 1000
    # bound: bin width + the largest gap between consecutive order
    # statistics (the ceil-rank neighbor can sit past empty bins)
    bound = width + float(np.diff(arr).max()) + 1e-9
    got = {r.q: r.value_r for r in quantiles_histogram(df, "v", QS).collect()}
    for q in QS:
        want = float(np.percentile(arr, q * 100, method="linear"))
        assert abs(got[q] - want) <= bound, (q, got[q], want)
    # and with dense integer-grid data at coarse bins, within one width
    dense = spark.range(2000).select((F.col("id") % 97).cast("double").alias("v"))
    darr = np.array([r.v for r in dense.collect()])
    dwidth = (darr.max() - darr.min()) / 1000
    dgot = {
        r.q: r.value_r
        for r in quantiles_histogram(dense, "v", [0.5, 0.9], n_bins=96).collect()
    }
    for q in [0.5, 0.9]:
        want = float(np.percentile(darr, q * 100, method="linear"))
        assert abs(dgot[q] - want) <= (darr.max() - darr.min()) / 96 + 1e-9


def test_histogram_grouped_and_partition_invariant(spark):
    df = _vals(spark)
    a = sorted(
        map(tuple, quantiles_histogram(df, "v", [0.5, 0.9], by=["g"]).collect())
    )
    b = sorted(
        map(
            tuple,
            quantiles_histogram(
                df.repartition(17, "v"), "v", [0.5, 0.9], by=["g"]
            ).collect(),
        )
    )
    assert a == b and len(a) == 6
    # grouped result matches filtering each group
    for g in range(3):
        solo = {
            r.q: r.value_r
            for r in quantiles_histogram(
                df.where(F.col("g") == g), "v", [0.5, 0.9]
            ).collect()
        }
        for q, vr in [(x[1], x[2]) for x in a if x[0] == g]:
            assert vr == solo[q], (g, q)


def test_degenerate_group_returns_constant(spark):
    df = spark.range(10).select(F.lit(7.5).alias("v"))
    for fn in (quantiles_exact, quantiles_histogram):
        got = {r.q: r.value_r for r in fn(df, "v", [0.0, 0.5, 1.0]).collect()}
        assert got == {0.0: 7.5, 0.5: 7.5, 1.0: 7.5}, (fn.__name__, got)


# ------------------------------------------------- robust outliers (r6)


def test_mad_outlier_golden(spark):
    from gregor_spark.ops.stats import robust_outliers

    # group a: tight cluster + one wild value; med=10, MAD=1
    rows = [("a", float(v)) for v in (8, 9, 10, 11, 12, 100)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["x"]: (r["med_r"], r["mad_r"], r["z_u6"], r["outlier"])
           for r in robust_outliers(df, "x", by=["g"]).collect()}
    med, mad = got[10.0][0], got[10.0][1]
    assert med == 10.5 and mad == 1.5  # R-7 even-count interpolation
    assert got[100.0][3] is True
    for v in (8.0, 9.0, 10.0, 11.0, 12.0):
        assert got[v][3] is False
    # hand-check one micro-z: floor(0.6745*(100-10.5)/1.5 * 1e6)
    import math
    assert got[100.0][2] == math.floor(0.6745 * 89.5 / 1.5 * 1e6)


def test_mad_zero_falls_back_to_neq_median(spark):
    from gregor_spark.ops.stats import robust_outliers

    rows = [("a", 1.0)] * 5 + [("a", 50.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {(r["x"], r["outlier"]) for r in
           robust_outliers(df, "x", by=["g"]).collect()}
    assert (50.0, True) in got and (1.0, False) in got
    z = {r["x"]: r["z_u6"] for r in robust_outliers(df, "x", by=["g"]).collect()}
    assert z[1.0] is None and z[50.0] is None  # MAD = 0: no scale


def test_mad_groups_isolated_and_partition_invariant(spark):
    from gregor_spark.ops.stats import robust_outliers

    rows = ([("a", float(v)) for v in range(20)]
            + [("b", float(v * 1000)) for v in range(20)])
    df = spark.createDataFrame(rows, "g string, x double")
    out = robust_outliers(df, "x", by=["g"])
    # b's huge scale must not leak into a's threshold: no flags anywhere
    assert out.where("outlier").count() == 0
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple,
                   robust_outliers(df.repartition(9), "x", by=["g"]).collect()))
    assert a == b
