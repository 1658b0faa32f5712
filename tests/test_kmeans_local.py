"""r8 parity: the one-task kmeans_fit trainer must produce the exact
same centroid list (and therefore identical assignments) as the
distributed per-iteration loop it replaces."""

from __future__ import annotations

from pyspark.sql import functions as F

from gregor_spark.ops.similarity import kmeans_fit


def _emb(spark, n=300, dim=16):
    def comp(j):
        x = F.sin(F.col("id") * F.lit(12.9898) + F.lit(j * 78.233)) * F.lit(
            43758.5453
        )
        return (x - F.floor(x)) * F.lit(2.0) - F.lit(1.0)

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(j).alias(f"x{j}") for j in range(dim)]).alias(
            "embedding"
        ),
    )


def test_kmeans_fit_local_parity(spark, monkeypatch):
    emb = _emb(spark).cache()
    monkeypatch.delenv("SPARK_GRAFT_SMALL_GRAPH", raising=False)
    a_fast, c_fast = kmeans_fit(emb, k=5, iters=2)
    rows_fast = sorted(tuple(r) for r in a_fast.collect())
    monkeypatch.setenv("SPARK_GRAFT_SMALL_GRAPH", "0")
    a_slow, c_slow = kmeans_fit(emb, k=5, iters=2)
    rows_slow = sorted(tuple(r) for r in a_slow.collect())
    monkeypatch.delenv("SPARK_GRAFT_SMALL_GRAPH", raising=False)
    assert c_fast == c_slow
    assert rows_fast == rows_slow
    assert len(rows_fast) == 300


def test_pq_train_fused_parity(spark, monkeypatch):
    """The fused one-task PQ trainer must return the exact codebooks the
    per-subspace kmeans_fit loops produce (one shared md5 init ordering
    drives every subspace on both paths)."""
    from gregor_spark.ops.similarity import pq_train

    emb = _emb(spark, n=200, dim=16).cache()
    monkeypatch.delenv("SPARK_GRAFT_SMALL_GRAPH", raising=False)
    fused = pq_train(emb, m=4, k=5, iters=2)
    monkeypatch.setenv("SPARK_GRAFT_SMALL_GRAPH", "0")
    looped = pq_train(emb, m=4, k=5, iters=2)
    monkeypatch.delenv("SPARK_GRAFT_SMALL_GRAPH", raising=False)
    assert fused == looped
    assert len(fused) == 4 and all(len(b) == 5 for b in fused)
