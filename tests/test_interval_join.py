"""Interval (range) joins: bucketized equi-join vs the naive
cross-join-filter oracle, closure variants, dedup guarantees, and the
explode guard.  TF-IDF top-terms golden lives here too (same r5 batch).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gregor_spark.ops.temporal import interval_join, overlap_join


def _points_num(spark, n=200):
    # deterministic scatter over [0, 1000)
    return spark.range(n).select(
        F.col("id").alias("pid"),
        ((F.col("id") * 37 + 11) % 1000).cast("double").alias("ts"),
    )


def _intervals_num(spark, n=40):
    # deterministic lo/width mix: widths 0..~120, some empty under open
    # closures (width 0), overlapping heavily
    return spark.range(n).select(
        F.col("id").alias("ivl_id"),
        ((F.col("id") * 53) % 970).cast("double").alias("lo"),
        (((F.col("id") * 53) % 970) + (F.col("id") * 7) % 121).cast("double").alias(
            "hi"
        ),
    )


def _naive(points, intervals, closed):
    lo, hi, ts = F.col("lo"), F.col("hi"), F.col("ts")
    pred = {
        "both": (lo <= ts) & (ts <= hi),
        "left": (lo <= ts) & (ts < hi),
        "right": (lo < ts) & (ts <= hi),
        "neither": (lo < ts) & (ts < hi),
    }[closed]
    return (
        points.crossJoin(intervals)
        .filter(pred)
        .select("pid", "ivl_id")
    )


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
@pytest.mark.parametrize("bucket", [16.0, 250.0])
def test_interval_join_matches_naive(spark, closed, bucket):
    pts, ivl = _points_num(spark, 200), _intervals_num(spark, 40)
    got = sorted(
        (r["pid"], r["i_ivl_id"])
        for r in interval_join(
            pts, ivl, ts="ts", bucket=bucket, closed=closed
        ).collect()
    )
    want = sorted((r["pid"], r["ivl_id"]) for r in _naive(pts, ivl, closed).collect())
    assert got == want and len(got) > 50  # non-trivial match set


def test_interval_join_timestamps_and_key(spark):
    base = dt.datetime(2026, 1, 1)
    pts = spark.createDataFrame(
        [
            (i, i % 3, base + dt.timedelta(minutes=17 * i % 300))
            for i in range(60)
        ],
        "pid long, k long, ts timestamp",
    )
    ivl = spark.createDataFrame(
        [
            (j, j % 3, base + dt.timedelta(minutes=30 * j), base + dt.timedelta(minutes=30 * j + 45))
            for j in range(10)
        ],
        "ivl_id long, k long, lo timestamp, hi timestamp",
    )
    got = sorted(
        (r["pid"], r["i_ivl_id"])
        for r in interval_join(
            pts, ivl, on="k", ts="ts", bucket=600.0, closed="both"
        ).collect()
    )
    want = sorted(
        (r["pid"], r["ivl_id"])
        for r in pts.join(ivl, "k")
        .filter((F.col("lo") <= F.col("ts")) & (F.col("ts") <= F.col("hi")))
        .select("pid", "ivl_id")
        .collect()
    )
    assert got == want and len(got) > 10
    # each (point, interval) pair appears exactly once despite multi-bucket spans
    assert len(got) == len(set(got))


def test_interval_join_guard_raises(spark):
    pts = _points_num(spark, 10)
    wide = spark.createDataFrame([(0, 0.0, 1e9)], "ivl_id long, lo double, hi double")
    with pytest.raises(Exception, match="spans >= "):
        interval_join(pts, wide, ts="ts", bucket=1.0, max_buckets=100).collect()


def test_overlap_join_matches_naive(spark):
    a = _intervals_num(spark, 35).withColumnRenamed("ivl_id", "aid")
    b = spark.range(25).select(
        F.col("id").alias("bid"),
        ((F.col("id") * 91 + 5) % 950).cast("double").alias("lo"),
        (((F.col("id") * 91 + 5) % 950) + (F.col("id") * 13) % 97).cast("double").alias(
            "hi"
        ),
    )
    got = sorted(
        (r["a_aid"], r["b_bid"])
        for r in overlap_join(a, b, bucket=64.0).collect()
    )
    want = sorted(
        (r["aid"], r["bid"])
        for r in a.crossJoin(b.withColumnRenamed("lo", "l2").withColumnRenamed("hi", "h2"))
        .filter((F.col("lo") <= F.col("h2")) & (F.col("l2") <= F.col("hi")))
        .collect()
    )
    assert got == want and len(got) > 20
    assert len(got) == len(set(got))  # exactly-once per overlapping pair


def test_tfidf_top_terms_golden(spark):
    from gregor_spark.ops.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple cherry"),
            (1, "banana banana durian"),
            (2, "cherry durian elderberry elderberry elderberry"),
        ],
        "doc_id long, text string",
    )
    import math

    rows = {
        (r["doc_id"], r["rn"]): (r["term"], r["tfidf"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    ln = math.log
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana/cherry tf=1 df=2 -> ln(1.5)
    assert rows[(0, 1)] == ("apple", round(2 * ln(3.0), 6))
    assert rows[(0, 2)] == ("banana", round(ln(1.5), 6))  # tie with cherry -> term asc
    # doc 2: elderberry tf=3 df=1 -> 3*ln(3) beats cherry/durian ln(1.5)
    assert rows[(2, 1)] == ("elderberry", round(3 * ln(3.0), 6))
    assert rows[(2, 2)] == ("cherry", round(ln(1.5), 6))
    assert len(rows) == 6


# ---------------------- within-distance pair join + bigram LM (r5 cont.)


def _scatter(spark, n=300):
    # deterministic scatter over [0, 10) x [0, 10)
    return spark.range(n).select(
        F.col("id").alias("point_id"),
        (((F.col("id") * 7919) % 1000) / 100.0).alias("x"),
        (((F.col("id") * 104729 + 3) % 1000) / 100.0).alias("y"),
    )


@pytest.mark.parametrize("cell", [None, 0.5, 0.11])  # default=r, r<cell, ring=3
def test_within_distance_join_matches_naive(spark, cell):
    from gregor_spark.operators.knn import within_distance_join

    pts = _scatter(spark)
    r = 0.3
    got = sorted(
        (row["a_point_id"], row["b_point_id"])
        for row in within_distance_join(
            pts, radius=r, id_col="point_id", cell=cell
        ).collect()
    )
    b = (
        pts.withColumnRenamed("point_id", "bid")
        .withColumnRenamed("x", "bx")
        .withColumnRenamed("y", "by")
    )
    d2 = (F.col("x") - F.col("bx")) ** 2 + (F.col("y") - F.col("by")) ** 2
    want = sorted(
        (row["point_id"], row["bid"])
        for row in pts.crossJoin(b)
        .filter((F.col("point_id") < F.col("bid")) & (d2 <= r * r))
        .collect()
    )
    assert got == want and len(got) > 10
    assert len(got) == len(set(got))  # exactly-once, no dedup pass needed


def test_lm_score_golden(spark):
    import math

    from gregor_spark.ops.text import lm_score

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b a"), (2, ""), (3, "a")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert 2 not in rows  # empty text contributes nothing, scores nothing
    # corpus counts: cb {(<s>,a):2,(a,b):1,(b,a):2,(<s>,b):1}; cp {<s>:3,a:1,b:2}; V=2
    p_sa = (2 + 0.1) / (3 + 0.2)
    p_ab = (1 + 0.1) / (1 + 0.2)
    p_ba = (2 + 0.1) / (2 + 0.2)
    p_sb = (1 + 0.1) / (3 + 0.2)
    bits0 = -(math.log2(p_sa) + math.log2(p_ab) + math.log2(p_ba)) / 3
    bits1 = -(math.log2(p_sb) + math.log2(p_ba)) / 2
    bits3 = -math.log2(p_sa)
    assert rows[0]["n_bigrams"] == 3
    assert rows[0]["bits_per_token"] == round(bits0, 6)
    assert rows[0]["ppl"] == round(2 ** bits0, 6)
    assert rows[1]["bits_per_token"] == round(bits1, 6)
    assert rows[3]["n_bigrams"] == 1 and rows[3]["bits_per_token"] == round(bits3, 6)


def test_lm_score_separate_train_corpus(spark):
    """Unseen bigrams/prefixes get the smoothed floor, never a crash."""
    from gregor_spark.ops.text import lm_score

    train = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    score = spark.createDataFrame([(9, "z q")], "doc_id long, text string")
    row = lm_score(score, train_docs=train).collect()[0]
    # V=2; p(<s>,z) = 0.1/(1+0.2); p(z,q) = 0.1/(0+0.2)
    import math

    bits = -(math.log2(0.1 / 1.2) + math.log2(0.1 / 0.2)) / 2
    assert row["n_bigrams"] == 2 and row["bits_per_token"] == round(bits, 6)


# ---------------------------------------- k-means IVF training (r5 cont.)


def _clustered_emb(spark, n=120, dim=8):
    """4 well-separated clusters at corners of a hypercube scaled x10."""
    import numpy as np

    rng_free = [
        (
            i,
            [
                float(10.0 * ((i % 4) >> b & 1) + 0.01 * ((i * 31 + b * 7) % 17))
                for b in range(dim)
            ],
            i % 4,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rng_free, "vec_id long, embedding array<double>, label long"
    )


def test_kmeans_recovers_separated_clusters(spark):
    from gregor_spark.ops.similarity import kmeans_fit

    emb = _clustered_emb(spark)
    assigned, cents = kmeans_fit(emb, k=4, iters=3, method="expr")
    rows = assigned.join(
        emb.select("vec_id", "label"), "vec_id"
    ).collect()
    # every k-means cluster maps to exactly one ground-truth label
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["cid"], set()).add(r["label"])
    assert all(len(labels) == 1 for labels in by_cid.values())
    assert len(cents) == 4 and all(len(c) == 8 for c in cents)


def test_kmeans_expr_matmul_parity_and_partition_invariance(spark):
    from gregor_spark.ops.similarity import kmeans_assign, kmeans_fit

    emb = _clustered_emb(spark)
    _, cents = kmeans_fit(emb, k=4, iters=2, method="expr")
    _, cents_m = kmeans_fit(emb.repartition(13), k=4, iters=2, method="matmul")
    # quantized centroids are BIT-identical across assignment method AND
    # partitioning (the determinism claim in the docstring)
    assert cents == cents_m
    a = sorted(
        (r["vec_id"], r["cid"])
        for r in kmeans_assign(emb, cents, method="expr").collect()
    )
    b = sorted(
        (r["vec_id"], r["cid"])
        for r in kmeans_assign(emb.repartition(7), cents, method="matmul").collect()
    )
    assert a == b
