"""Alternating large-star/small-star connected components: parity with
the min-label propagation on adversarial graph shapes, star-forest
fixpoint property, and round counts that beat propagation on chains."""

import pytest
from pyspark.sql import functions as F

from gregor_spark.ops.dedup import connected_components_twostar, dedup_clusters


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc_a long, doc_b long"
    )


def _both(spark, n, pairs, **kw):
    # small_graph_edges=0 pins the star LOOP (the at-scale path) — the
    # r7 single-task fast path is parity-tested against it separately
    ids, e = _ids(spark, n), _edges(spark, pairs)
    kw.setdefault("small_graph_edges", 0)
    ts = {r.doc_id: r.cluster_id
          for r in connected_components_twostar(ids, e, **kw).collect()}
    pr = {r.doc_id: r.cluster_id for r in dedup_clusters(ids, e).collect()}
    return ts, pr


def test_twostar_chain_clique_singletons(spark):
    # chain 0-1-...-19, clique 30..34, singletons elsewhere
    pairs = [(i, i + 1) for i in range(19)]
    pairs += [(i, j) for i in range(30, 35) for j in range(i + 1, 35)]
    ts, pr = _both(spark, 40, pairs)
    assert ts == pr
    assert ts[19] == 0 and ts[34] == 30 and ts[25] == 25


def test_twostar_random_graphs_parity(spark):
    for seed in (1, 2, 3):
        n = 120
        pairs = {(min(a, b), max(a, b))
                 for k in range(170)
                 for a, b in [(((k * 48271 + seed) % n), ((k * 16807 + 7 * seed) % n))]
                 if a != b}
        ts, pr = _both(spark, n, sorted(pairs))
        assert ts == pr, f"seed {seed}"


def test_twostar_adversarial_id_order(spark):
    # a path whose ids ALTERNATE high/low — the layout where min-label
    # propagation's path halving degrades to one hop per round
    order = []
    lo, hi = 0, 59
    while lo <= hi:
        order.append(lo)
        if lo != hi:
            order.append(hi)
        lo, hi = lo + 1, hi - 1
    pairs = list(zip(order, order[1:]))
    rounds = []
    ids, e = _ids(spark, 60), _edges(spark, pairs)
    out = connected_components_twostar(
        ids, e, round_hook=lambda i, s, c: rounds.append(i),
        small_graph_edges=0,  # pin the loop: this test measures rounds
    )
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert set(got.values()) == {0} and len(got) == 60
    assert len(rounds) <= 8  # log-ish, not O(n)


def test_twostar_empty_edges(spark):
    ids = _ids(spark, 5)
    e = _edges(spark, [])
    got = {r.doc_id: r.cluster_id
           for r in connected_components_twostar(ids, e).collect()}
    assert got == {i: i for i in range(5)}


def test_twostar_st_fixture_parity(spark):
    # the 80-point spatio-temporal edge graph from test_dbscan
    import datetime as dt

    from gregor_spark.ops.dbscan import st_edges

    rows = [
        (i,
         -0.25 + 2.0 * (((i * 48271) % 997) / 997.0) * 0.03,
         9.75 + 2.0 * (((i * 16807) % 997) / 997.0) * 0.03,
         ((i * 69621) % 97) * 600)
        for i in range(80)
    ]
    df = spark.createDataFrame(
        [(i, lon, lat, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
         for i, lon, lat, s in rows],
        "point_id long, lon double, lat double, ts timestamp",
    )
    e = st_edges(df, 1.5, 7200.0).select(
        F.col("a_point_id").alias("doc_a"), F.col("b_point_id").alias("doc_b")
    )
    ids = df.select(F.col("point_id").alias("doc_id"))
    ts = {r.doc_id: r.cluster_id
          for r in connected_components_twostar(ids, e).collect()}
    pr = {r.doc_id: r.cluster_id for r in dedup_clusters(ids, e).collect()}
    assert ts == pr


def test_dedup_clusters_escalates_on_high_diameter(spark):
    """A 200-node path with adversarial id order: propagation alone
    needs ~dozens of rounds; with the default escalate_after the loop
    hands off to two-star and still returns exact component minima."""
    n = 200
    order = []
    lo, hi = 0, n - 1
    while lo <= hi:
        order.append(lo)
        if lo != hi:
            order.append(hi)
        lo, hi = lo + 1, hi - 1
    pairs = list(zip(order, order[1:]))
    ids, e = _ids(spark, n), _edges(spark, pairs)
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(ids, e).collect()}
    assert set(got.values()) == {0} and len(got) == n


def test_dedup_clusters_escalation_disabled_raises(spark):
    n = 200
    order = []
    lo, hi = 0, n - 1
    while lo <= hi:
        order.append(lo)
        if lo != hi:
            order.append(hi)
        lo, hi = lo + 1, hi - 1
    pairs = list(zip(order, order[1:]))
    ids, e = _ids(spark, n), _edges(spark, pairs)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(ids, e, max_iters=10, escalate_after=None,
                       pointer_jumping=False)


def test_small_graph_fast_path_parity_with_star_loop(spark):
    """r7 single-task union-find fast path == the distributed star loop,
    label-for-label, on random graphs, chains, cliques, and string keys."""
    for seed in (1, 2):
        n = 150
        pairs = sorted({
            (min(a, b), max(a, b))
            for k in range(200)
            for a, b in [((k * 48271 + seed) % n, (k * 16807 + 3 * seed) % n)]
            if a != b
        })
        ids, e = _ids(spark, n), _edges(spark, pairs)
        fast = {r.doc_id: r.cluster_id
                for r in connected_components_twostar(ids, e).collect()}
        loop = {r.doc_id: r.cluster_id
                for r in connected_components_twostar(
                    ids, e, small_graph_edges=0).collect()}
        assert fast == loop, f"seed {seed}"


def test_dedup_clusters_small_graph_opt_in_parity(spark):
    """dedup_clusters(small_graph_edges=N) == the propagation loop,
    label-for-label; default (0) keeps the loop engaged."""
    n = 120
    pairs = sorted({
        (min(a, b), max(a, b))
        for k in range(160)
        for a, b in [((k * 40503 + 7) % n, (k * 69621 + 11) % n)]
        if a != b
    })
    ids, e = _ids(spark, n), _edges(spark, pairs)
    fast = {r.doc_id: r.cluster_id
            for r in dedup_clusters(ids, e, small_graph_edges=10**6).collect()}
    loop = {r.doc_id: r.cluster_id for r in dedup_clusters(ids, e).collect()}
    assert fast == loop


def test_small_graph_fast_path_string_keys(spark):
    ids = spark.createDataFrame(
        [(f"d{i:03d}",) for i in range(10)], "doc_id string"
    )
    e = spark.createDataFrame(
        [("d003", "d001"), ("d001", "d002"), ("d007", "d008")],
        "doc_a string, doc_b string",
    )
    got = {r.doc_id: r.cluster_id
           for r in connected_components_twostar(ids, e).collect()}
    assert got["d001"] == got["d002"] == got["d003"] == "d001"
    assert got["d007"] == got["d008"] == "d007"
    assert got["d005"] == "d005"
