"""Quota / temperature mixture sampling (ops/sampling.py::sample_quota):
target-share sizing, rate capping, temperature flattening, determinism
and partition invariance."""

import pytest
from pyspark.sql import functions as F

from gregor_spark.ops.sampling import sample_quota


def _df(spark, sizes):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, src string")


def test_quota_mode_sizes_and_cap(spark):
    df = _df(spark, {"web": 4000, "books": 400, "code": 50})
    out = sample_quota(
        df, "src", "doc_id", quotas={"web": 400, "books": 200, "code": 500}
    )
    got = {r["src"]: r["cnt"] for r in
           out.groupBy("src").agg(F.count("*").alias("cnt")).collect()}
    # binomial-tolerance around the targets; over-quota group keeps ALL
    assert abs(got["web"] - 400) < 80
    assert abs(got["books"] - 200) < 60
    assert got["code"] == 50  # quota 500 > group size: rate capped at 1
    # unknown groups (no quota entry) are dropped entirely
    out2 = sample_quota(df, "src", "doc_id", quotas={"web": 100})
    assert out2.where("src != 'web'").count() == 0


def test_temperature_flattens_toward_uniform(spark):
    df = _df(spark, {"big": 6400, "small": 100})
    def shares(alpha):
        out = sample_quota(df, "src", "doc_id", total=400, temperature=alpha)
        c = {r["src"]: r["n"] for r in
             out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        tot = sum(c.values())
        return c.get("small", 0) / tot
    # natural share of 'small' is 100/6500 ~ 1.5%; sqrt-temperature
    # lifts it (sqrt ratio 10/90 ~ 11%), alpha=0 pushes toward 50%
    assert shares(1.0) < 0.05
    assert 0.06 < shares(0.5) < 0.2
    assert shares(0.0) > 0.3


def test_quota_deterministic_and_partition_invariant(spark):
    df = _df(spark, {"a": 900, "b": 300})
    a1 = sorted(r["doc_id"] for r in
                sample_quota(df, "src", "doc_id", total=300,
                             temperature=0.5).collect())
    a2 = sorted(r["doc_id"] for r in
                sample_quota(df.repartition(13), "src", "doc_id", total=300,
                             temperature=0.5).collect())
    assert a1 == a2 and len(a1) > 0
    # different salt decorrelates
    b = sorted(r["doc_id"] for r in
               sample_quota(df, "src", "doc_id", total=300, temperature=0.5,
                            salt="other").collect())
    assert b != a1


def test_quota_mode_validation(spark):
    df = _df(spark, {"a": 10})
    with pytest.raises(ValueError, match="exactly one"):
        sample_quota(df, "src", "doc_id")
    with pytest.raises(ValueError, match="exactly one"):
        sample_quota(df, "src", "doc_id", quotas={"a": 5}, total=3,
                     temperature=1.0)
    with pytest.raises(ValueError, match="both"):
        sample_quota(df, "src", "doc_id", total=5)
