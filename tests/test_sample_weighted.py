"""A-ES weighted reservoir sampling: determinism, nesting, weight bias."""

from pyspark.sql import functions as F

from gregor_spark.ops.sampling import sample_weighted


def _items(spark, n_heavy=50, n_light=5000):
    return spark.range(n_heavy + n_light).select(
        F.col("id").alias("item"),
        F.when(F.col("id") < n_heavy, F.lit(1000.0)).otherwise(F.lit(1.0)).alias("w"),
    )


def test_partitioning_invariance(spark):
    df = _items(spark)
    a = {r.item for r in sample_weighted(df, 30, "w", "item").collect()}
    b = {
        r.item
        for r in sample_weighted(df.repartition(13, "item"), 30, "w", "item").collect()
    }
    c = {r.item for r in sample_weighted(df.coalesce(1), 30, "w", "item").collect()}
    assert a == b == c and len(a) == 30


def test_heavy_weights_dominate(spark):
    # 50 items at weight 1000 vs 5000 at weight 1 (heavy weight share
    # 10/11): expected lights in the top-50 ~ 5; under UNWEIGHTED
    # sampling heavy would be ~0.5 of 50.  The deterministic draw for
    # this salt lands 41 heavy — assert the weighted regime, well clear
    # of both the uniform null and the exact expectation's variance.
    got = sample_weighted(_items(spark), 50, "w", "item").collect()
    heavy = sum(1 for r in got if r.item < 50)
    assert heavy >= 35, heavy


def test_topk_is_nested(spark):
    df = _items(spark, 20, 500)
    small = {r.item for r in sample_weighted(df, 10, "w", "item").collect()}
    big = {r.item for r in sample_weighted(df, 25, "w", "item").collect()}
    assert small < big


def test_nonpositive_weights_never_sampled(spark):
    df = spark.range(100).select(
        F.col("id").alias("item"),
        F.when(F.col("id") % 2 == 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    got = sample_weighted(df, 100, "w", "item").collect()
    assert len(got) == 50 and all(r.item % 2 == 1 for r in got)


def test_grouped_ranks_dense_per_group(spark):
    df = _items(spark, 10, 200).withColumn("g", (F.col("item") % 3).cast("int"))
    got = sample_weighted(df, 5, "w", "item", by=["g"]).collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append(r.rn)
    assert set(by_g) == {0, 1, 2}
    for rns in by_g.values():
        assert sorted(rns) == [1, 2, 3, 4, 5]
