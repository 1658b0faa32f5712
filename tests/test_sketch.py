"""HyperLogLog sketch: accuracy, mergeability, grouped parity."""

import math

from pyspark.sql import functions as F

from gregor_spark.ops.sketch import (
    hll_distinct,
    hll_estimate_from_registers,
    hll_registers,
)


def _vals(spark, n, tag=""):
    return spark.range(n).select(
        F.concat(F.lit(f"v{tag}_"), F.col("id").cast("string")).alias("v")
    )


def test_estimate_within_hll_error(spark):
    n = 20_000
    est = hll_distinct(_vals(spark, n), "v").collect()[0]
    # m=512 -> relative sigma ~ 1.04/sqrt(512) ~ 4.6%; 3 sigma bound
    assert abs(est.est_r - n) / n < 0.14, est
    assert est.occupied == 512 and est.zeros == 0


def test_small_range_linear_counting(spark):
    n = 60  # well under 2.5m: the m*ln(m/zeros) branch
    est = hll_distinct(_vals(spark, n), "v").collect()[0]
    assert est.zeros > 0
    assert abs(est.est_r - n) / n < 0.1, est
    # linear counting formula replayed independently
    want = 512 * math.log(512 / est.zeros)
    assert abs(est.est_r - want) < 1e-5


def test_duplicates_do_not_move_registers(spark):
    a = _vals(spark, 5000)
    dup = a.unionAll(a).unionAll(a)
    ra = {(r.bucket, r.rho) for r in hll_registers(a, "v").collect()}
    rd = {(r.bucket, r.rho) for r in hll_registers(dup, "v").collect()}
    assert ra == rd


def test_shard_merge_equals_whole(spark):
    whole = _vals(spark, 8000)
    s1 = whole.filter(F.col("v").substr(-1, 1).isin("0", "1", "2", "3"))
    s2 = whole.filter(~F.col("v").substr(-1, 1).isin("0", "1", "2", "3"))
    r1, r2 = hll_registers(s1, "v"), hll_registers(s2, "v")
    # sketch merge = same groupBy-max over the unioned register tables
    merged = r1.unionAll(r2).groupBy("bucket").agg(F.max("rho").alias("rho"))
    got = hll_estimate_from_registers(merged).collect()[0]
    want = hll_distinct(whole, "v").collect()[0]
    assert (got.occupied, got.zeros, got.s_int, got.est_r) == (
        want.occupied,
        want.zeros,
        want.s_int,
        want.est_r,
    )


def test_grouped_matches_per_group(spark):
    a = _vals(spark, 3000, "a").withColumn("g", F.lit("a"))
    b = _vals(spark, 700, "b").withColumn("g", F.lit("b"))
    both = {
        r.g: (r.occupied, r.s_int, r.est_r)
        for r in hll_distinct(a.unionAll(b), "v", by=["g"]).collect()
    }
    for df, g in ((a, "a"), (b, "b")):
        r = hll_distinct(df, "v").collect()[0]
        assert both[g] == (r.occupied, r.s_int, r.est_r)


def test_tpch_q1_golden(spark):
    """Direct pytest coverage for the tpch_q1 contract query (window-tail
    candidate per COVERAGE.md rotation protocol)."""
    from gregor_spark.entry_queries import REGISTRY

    rows = REGISTRY["tpch_q1"][0](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) in (4, 6)  # sf0.001 may not populate all flag pairs
    by_key = {(r[0], r[1]): r for r in rows}
    assert ("A", "F") in by_key and ("N", "O") in by_key
    for r in rows:
        assert r["sum_qty"] > 0 and r["cnt"] > 0 and r["sum_disc"] <= r["sum_base"]


# ------------------------------------------------------------ count-min


def test_cms_upper_bounds_and_exact_when_sparse(spark):
    from gregor_spark.ops.sketch import cms_build, cms_lookup

    # 100 distinct tokens, known counts (token i appears i+1 times)
    items = spark.range(100).select(
        F.col("id").alias("t"), (F.col("id") + 1).alias("n")
    )
    toks = items.select(F.explode(F.expr("array_repeat(t, CAST(n AS INT))")).alias("t"))
    true = {r.t: r.n for r in items.collect()}
    # w=4096 >> 100 distinct: collisions near-impossible -> est == true
    est = cms_lookup(
        cms_build(toks, "t", w=4096), items.select("t"), "t", w=4096
    ).collect()
    assert {r.t: r.est_cnt for r in est} == true
    # tight sketch (w=32): still an upper bound everywhere
    est2 = cms_lookup(cms_build(toks, "t", w=32), items.select("t"), "t", w=32)
    for r in est2.collect():
        assert r.est_cnt >= true[r.t]


def test_cms_merge_is_cellwise_sum(spark):
    from gregor_spark.ops.sketch import cms_build

    a = spark.range(500).select((F.col("id") % 40).cast("string").alias("t"))
    b = spark.range(300).select((F.col("id") % 25).cast("string").alias("t"))
    sa, sb = cms_build(a, "t"), cms_build(b, "t")
    merged = (
        sa.unionByName(sb)
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(a.unionByName(b), "t")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_weighted(spark):
    from gregor_spark.ops.sketch import cms_build, cms_lookup

    df = spark.range(10).select(F.col("id").alias("t"), (F.col("id") * 10).alias("wt"))
    est = cms_lookup(
        cms_build(df, "t", w=4096, weight="wt"), df.select("t"), "t", w=4096
    )
    got = {r.t: r.est_cnt for r in est.collect()}
    assert got == {i: i * 10 for i in range(10)}


def test_events_window_golden(spark):
    """Direct pytest coverage for the events_window contract query
    (window-tail candidate per COVERAGE.md rotation protocol)."""
    from gregor_spark.entry_queries import REGISTRY

    rows = REGISTRY["events_window"][0](spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert len(rows) == ev.count()  # one output row per event
    for user, rs in by_user.items():
        # rn is a dense 1..n permutation within each user
        assert sorted(x.rn for x in rs) == list(range(1, len(rs) + 1))
    # running sum at the last rank equals the user's rounded total value
    totals = {
        r.user_id: round(r.s, 6)
        for r in ev.groupBy("user_id").agg(F.sum("value").alias("s")).collect()
    }
    for user, rs in by_user.items():
        last = max(rs, key=lambda x: x.rn)
        assert abs(last.running_r - totals[user]) < 1e-6, user


# ------------------------------------------------------------ bloom


def test_bloom_no_false_negatives_and_low_fp(spark):
    from gregor_spark.ops.sketch import bloom_build, bloom_contains

    ins = spark.range(500).select(F.concat(F.lit("in_"), F.col("id")).alias("t"))
    out = spark.range(2000).select(F.concat(F.lit("out_"), F.col("id")).alias("t"))
    sk = bloom_build(ins, "t")
    got_in = bloom_contains(sk, ins, "t").collect()
    assert all(r.maybe_present for r in got_in)  # NO false negatives, ever
    fps = sum(1 for r in bloom_contains(sk, out, "t").collect() if r.maybe_present)
    # m=16384, k=4, n=500 -> fp rate ~1.7e-4; 2000 probes -> expect ~0
    assert fps <= 5, fps


def test_bloom_merge_is_bitwise_or(spark):
    from gregor_spark.ops.sketch import bloom_build

    a = spark.range(300).select(F.concat(F.lit("a"), F.col("id")).alias("t"))
    b = spark.range(200).select(F.concat(F.lit("b"), F.col("id")).alias("t"))
    merged = (
        bloom_build(a, "t")
        .unionByName(bloom_build(b, "t"))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    whole = bloom_build(a.unionByName(b), "t")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_minhash_sig_golden(spark):
    """Direct pytest coverage for the minhash_sig contract query
    (window-tail rotation): per-doc signature shape, partitioning
    determinism, and near-dup signature agreement."""
    from gregor_spark.entry_queries import REGISTRY

    df = REGISTRY["minhash_sig"][0](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r[0], []).append(tuple(r))
    sizes = {len(v) for v in per_doc.values()}
    assert len(sizes) == 1  # same signature length for every doc
    # identical text -> identical signature (determinism across runs)
    again = {tuple(r) for r in REGISTRY["minhash_sig"][0](
        spark, "/root/testdata/sf0.001"
    ).collect()}
    assert again == {tuple(r) for r in rows}


# ------------------------------------------------- theta (KMV bottom-k)


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "uid long")


def test_theta_exact_below_k(spark):
    from gregor_spark.ops.sketch import theta_set_estimates

    a = _ids(spark, range(10))
    b = _ids(spark, range(5, 15))
    r = theta_set_estimates(a, b, "uid", k=32).collect()[0]
    # sketches never filled: every estimate is EXACT set cardinality
    assert (r.ka, r.kb) == (10, 10)
    assert r.n_a_est == 10.0 and r.n_b_est == 10.0
    assert r.union_est == 15.0 and r.inter_est == 5.0 and r.rho == 5


def test_theta_disjoint_and_identical(spark):
    from gregor_spark.ops.sketch import theta_set_estimates

    a = _ids(spark, range(0, 400))
    dis = theta_set_estimates(a, _ids(spark, range(1000, 1400)), "uid", k=32)
    assert dis.collect()[0].inter_est == 0.0
    same = theta_set_estimates(a, _ids(spark, range(0, 400)), "uid", k=32).collect()[0]
    assert same.n_a_est == same.n_b_est == same.union_est == same.inter_est


def test_theta_estimator_error_bounds(spark):
    from gregor_spark.ops.sketch import theta_set_estimates

    # 600 vs 600 with 300 shared; KMV stderr ~ n/sqrt(k-2) => be generous
    a = _ids(spark, range(0, 600))
    b = _ids(spark, range(300, 900))
    r = theta_set_estimates(a, b, "uid", k=64).collect()[0]
    assert abs(r.n_a_est - 600) / 600 < 0.5
    assert abs(r.union_est - 900) / 900 < 0.5
    assert abs(r.inter_est - 300) / 300 < 0.7  # intersection is noisier


def test_theta_union_matches_sketch_of_union(spark):
    """Mergeability, exactly: the bottom-k merge of two sketches must
    equal the sketch built from the unioned data — same hashes, so the
    union ESTIMATE is bit-identical, not just close."""
    from gregor_spark.ops.sketch import theta_set_estimates, theta_sketch, theta_estimate
    from pyspark.sql import functions as F

    a, b = _ids(spark, range(0, 500)), _ids(spark, range(250, 750))
    est_merged = theta_set_estimates(a, b, "uid", k=32).collect()[0].union_est
    direct = theta_sketch(a.unionByName(b), "uid", k=32).select(
        F.round(theta_estimate(F.col("hs"), 32), 6).alias("e")
    ).collect()[0].e
    assert est_merged == direct


def test_theta_partition_invariance(spark):
    from gregor_spark.ops.sketch import theta_sketch

    df = _ids(spark, range(0, 777))
    h1 = theta_sketch(df, "uid", k=48).collect()[0]
    h2 = theta_sketch(df.repartition(17), "uid", k=48).collect()[0]
    assert h1.hs == h2.hs and h1.nd == h2.nd


def test_theta_grouped(spark):
    from gregor_spark.ops.sketch import theta_sketch

    df = spark.createDataFrame(
        [(g, v) for g in (0, 1) for v in range(g * 3, g * 3 + 40)],
        "g int, uid long",
    )
    rows = {r.g: r for r in theta_sketch(df, "uid", k=16, by=["g"]).collect()}
    assert set(rows) == {0, 1}
    assert all(r.nd == 16 and len(r.hs) == 16 for r in rows.values())
    assert rows[0].hs != rows[1].hs


def test_theta_rejects_bad_k(spark):
    import pytest as _pytest

    from gregor_spark.ops.sketch import theta_sketch

    with _pytest.raises(ValueError):
        theta_sketch(_ids(spark, [1]), "uid", k=1)
