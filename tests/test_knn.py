"""kNN: broadcast path vs distributed cell-join path vs numpy brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gregor_spark.operators.knn import knn_broadcast, knn_cell_join

BOUNDS = (-0.25, 9.75, 1.75, 11.75)


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(5)
    facts = [
        (int(i), float(x), float(y))
        for i, (x, y) in enumerate(
            zip(rng.uniform(-0.25, 1.75, 400), rng.uniform(9.75, 11.75, 400))
        )
    ]
    proxies = [
        (int(i), float(x), float(y))
        for i, (x, y) in enumerate(
            zip(rng.uniform(-0.25, 1.75, 30), rng.uniform(9.75, 11.75, 30))
        )
    ]
    fdf = spark.createDataFrame(facts, "point_id long, x double, y double").cache()
    pdf = spark.createDataFrame(proxies, "proxy_id long, x double, y double").cache()
    return facts, proxies, fdf, pdf


def _brute(facts, proxies, k):
    fa = np.array([[f[1], f[2]] for f in facts])
    pa = np.array([[p[1], p[2]] for p in proxies])
    pid = np.array([p[0] for p in proxies])
    want = {}
    for i, f in enumerate(facts):
        d2 = ((fa[i] - pa) ** 2).sum(axis=1)
        order = np.lexsort((pid, d2))[:k]
        want[f[0]] = [(int(pid[j]), float(d2[j])) for j in order]
    return want


def _collect(df, key="point_id"):
    got = {}
    for r in df.orderBy(key, "rank").collect():
        got.setdefault(r[key], []).append((r["proxy_id"], r["d2"]))
    return got


def test_knn_broadcast_exact(spark, data):
    facts, proxies, fdf, _ = data
    got = _collect(knn_broadcast(fdf, proxies, k=3))
    want = _brute(facts, proxies, 3)
    assert got.keys() == want.keys()
    for key in want:
        assert [g[0] for g in got[key]] == [w[0] for w in want[key]]
        np.testing.assert_allclose(
            [g[1] for g in got[key]], [w[1] for w in want[key]], rtol=1e-12
        )


def test_knn_cell_join_matches_broadcast(spark, data):
    facts, proxies, fdf, pdf = data
    a = _collect(knn_broadcast(fdf, proxies, k=3))
    b = _collect(
        knn_cell_join(fdf, pdf, k=3, bounds=BOUNDS, fact_key="point_id")
    )
    assert a == b


def test_knn_k_exceeds_proxies(spark, data):
    _, proxies, fdf, pdf = data
    small = proxies[:2]
    sdf = fdf.sparkSession.createDataFrame(small, "proxy_id long, x double, y double")
    out = knn_cell_join(fdf, sdf, k=5, bounds=BOUNDS)
    # every fact ends with exactly the 2 existing proxies
    cnt = out.groupBy("point_id").count().select(F.min("count"), F.max("count")).collect()[0]
    assert (cnt[0], cnt[1]) == (2, 2)
