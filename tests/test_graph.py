"""Graph analytics: triangle counts vs brute force, clustering
coefficients, quantized PageRank mass conservation and invariances."""

import itertools

import pytest
from pyspark.sql import functions as F

from gregor_spark.ops.graph import PR_SCALE, pagerank_quantized, triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc_a long, doc_b long"
    )


def _ids(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_triangles_k4_and_star(spark):
    k4 = list(itertools.combinations(range(4), 2))
    got = {r.id: (r.degree, r.n_tri, r.lcc)
           for r in triangle_counts(_edges(spark, k4)).collect()}
    assert got == {i: (3, 3, 1.0) for i in range(4)}  # K4: 3 triangles/node
    star = [(0, i) for i in range(1, 6)]
    got = {r.id: (r.n_tri, r.lcc)
           for r in triangle_counts(_edges(spark, star)).collect()}
    assert got[0] == (0, 0.0)
    assert all(got[i] == (0, None) for i in range(1, 6))  # leaves: deg 1


def test_triangles_brute_parity(spark):
    import hashlib

    def h(k, salt):
        return int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16)

    pairs = sorted({(min(a, b), max(a, b))
                    for k in range(300)
                    for a, b in [(h(k, "a") % 40, h(k, "b") % 40)]
                    if a != b})
    got = {r.id: r.n_tri for r in triangle_counts(_edges(spark, pairs)).collect()}
    nbr = {}
    for a, b in pairs:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    want = {
        v: sum(1 for x, y in itertools.combinations(sorted(nbr[v]), 2)
               if y in nbr[x])
        for v in nbr
    }
    assert got == want and sum(want.values()) > 0


def test_triangles_hub_graph_exact(spark):
    """A 40-leaf hub plus one closing edge: the degree-ordered wedge
    method must count exactly 1 triangle (and never enumerate the
    hub's deg^2 wedges — shape property, asserted by correctness)."""
    pairs = [(0, i) for i in range(1, 41)] + [(1, 2)]
    got = {r.id: r.n_tri for r in triangle_counts(_edges(spark, pairs)).collect()}
    assert got[0] == 1 and got[1] == 1 and got[2] == 1
    assert all(got[i] == 0 for i in range(3, 41))


def test_pagerank_conserves_mass_exactly(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3)]
    out = pagerank_quantized(_ids(spark, 6), _edges(spark, pairs), iters=4)
    rows = out.collect()
    assert sum(r.rank_q for r in rows) == 6 * PR_SCALE  # exact, every round
    got = {r.doc_id: r.rank_q for r in rows}
    assert got[4] == PR_SCALE and got[5] == PR_SCALE  # isolated keep all
    # node 1 and 3 have degree 3; 0 and 2 degree 2 — rank follows degree
    assert got[3] > got[0] and got[1] > got[2]


def test_pagerank_regular_graph_uniform(spark):
    # a 6-cycle: perfectly regular, so every node's rank stays identical
    pairs = [(i, (i + 1) % 6) for i in range(5)] + [(0, 5)]
    out = pagerank_quantized(_ids(spark, 6), _edges(spark, pairs), iters=3)
    ranks = {r.rank_q for r in out.collect()}
    assert len(ranks) == 1


def test_pagerank_partition_invariance(spark):
    pairs = sorted({(min(a, b), max(a, b))
                    for k in range(120)
                    for a, b in [((k * 48271) % 40, (k * 16807 + 3) % 40)]
                    if a != b})
    ids, e = _ids(spark, 40), _edges(spark, pairs)
    a1 = sorted(map(tuple, pagerank_quantized(ids, e, iters=3).collect()))
    a2 = sorted(
        map(
            tuple,
            pagerank_quantized(
                ids.repartition(7), e.repartition(11), iters=3
            ).collect(),
        )
    )
    assert a1 == a2


def test_pagerank_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        pagerank_quantized(_ids(spark, 2), _edges(spark, []), iters=-1)
    with pytest.raises(ValueError):
        pagerank_quantized(_ids(spark, 2), _edges(spark, []), damping_pct=101)


def test_link_prediction_golden(spark):
    from gregor_spark.ops.graph import link_prediction

    # square 0-1-2-3-0: diagonals (0,2) and (1,3) are the non-edges,
    # each with 2 common neighbors and jaccard 2/(2+2-2) = 1.0
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got = {(r.x, r.y): (r.common, r.jaccard)
           for r in link_prediction(_edges(spark, pairs)).collect()}
    assert got == {(0, 2): (2, 1.0), (1, 3): (2, 1.0)}


def test_link_prediction_excludes_existing_edges(spark):
    from gregor_spark.ops.graph import link_prediction

    # triangle + pendant: (0,1),(1,2),(0,2),(2,3) — candidate 2-hop
    # pairs through shared neighbors: (0,3),(1,3) via 2; every pair
    # among {0,1,2} is an EDGE and must not appear
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = {(r.x, r.y): r.common
           for r in link_prediction(_edges(spark, pairs)).collect()}
    assert got == {(0, 3): 1, (1, 3): 1}


def test_link_prediction_brute_parity(spark):
    import hashlib
    import itertools

    from gregor_spark.ops.graph import link_prediction

    def h(k, salt):
        return int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16)

    pairs = sorted({(min(a, b), max(a, b))
                    for k in range(200)
                    for a, b in [(h(k, "p") % 30, h(k, "q") % 30)]
                    if a != b})
    got = {(r.x, r.y): (r.common, round(r.jaccard, 9))
           for r in link_prediction(_edges(spark, pairs), min_common=1).collect()}
    nbr = {}
    for a, b in pairs:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    want = {}
    es = set(pairs)
    for x, y in itertools.combinations(sorted(nbr), 2):
        if (x, y) in es:
            continue
        c = len(nbr[x] & nbr[y])
        if c >= 1:
            want[(x, y)] = (c, round(c / (len(nbr[x]) + len(nbr[y]) - c), 9))
    assert got == want and len(want) > 5


def test_graph_summary_k4(spark):
    import itertools

    from gregor_spark.ops.graph import graph_summary

    k4 = list(itertools.combinations(range(4), 2))
    r = graph_summary(_edges(spark, k4)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.max_degree) == (4, 6, 3)
    assert r.avg_degree == 3.0
    assert (r.n_wedges, r.n_triangles) == (12, 4)
    assert r.global_cc == 1.0  # complete graph: perfectly transitive


def test_graph_summary_star_zero_cc(spark):
    from gregor_spark.ops.graph import graph_summary

    r = graph_summary(_edges(spark, [(0, i) for i in range(1, 5)])).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (5, 4, 6, 0)
    assert r.global_cc == 0.0


def test_bfs_hops_chain_and_cap(spark):
    from gregor_spark.ops.graph import bfs_hops

    # a 0-1-2-...-7 path seeded at 0, capped at 3 hops
    pairs = [(i, i + 1) for i in range(7)]
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    got = {r.doc_id: r.hops
           for r in bfs_hops(_ids(spark, 8), _edges(spark, pairs), seeds,
                             max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: None, 5: None, 6: None, 7: None}


def test_bfs_hops_multi_source_min(spark):
    from gregor_spark.ops.graph import bfs_hops

    pairs = [(i, i + 1) for i in range(9)]
    seeds = spark.createDataFrame([(0,), (9,)], "doc_id long")
    got = {r.doc_id: r.hops
           for r in bfs_hops(_ids(spark, 10), _edges(spark, pairs), seeds,
                             max_hops=9).collect()}
    # distance to the NEARER seed
    assert got == {i: min(i, 9 - i) for i in range(10)}


def test_bfs_hops_partition_invariance(spark):
    import hashlib

    from gregor_spark.ops.graph import bfs_hops

    def h(k, salt):
        return int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16)

    pairs = sorted({(min(a, b), max(a, b))
                    for k in range(150)
                    for a, b in [(h(k, "p") % 35, h(k, "q") % 35)]
                    if a != b})
    ids, e = _ids(spark, 35), _edges(spark, pairs)
    seeds = spark.createDataFrame([(0,), (7,)], "doc_id long")
    a1 = sorted(map(tuple, bfs_hops(ids, e, seeds, 3).collect()))
    a2 = sorted(map(tuple, bfs_hops(ids.repartition(5), e.repartition(9),
                                    seeds, 3).collect()))
    assert a1 == a2


# ------------------------------------------------ k-core / coreness (r6)


def _brute_kcore(pairs, k):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        kill = [n for n, s in adj.items() if len(s) < k]
        if not kill:
            return {n: len(s) for n, s in adj.items()}
        for n in kill:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]


def _brute_coreness(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in adj.items()}
    core, seen = {}, set()
    cur = 0
    while len(seen) < len(adj):
        n = min((x for x in adj if x not in seen), key=lambda x: (deg[x], x))
        cur = max(cur, deg[n])
        core[n] = cur
        seen.add(n)
        for m in adj[n]:
            if m not in seen:
                deg[m] -= 1
        adj = {x: {y for y in s if y not in seen} for x, s in adj.items()}
    return core


def _md5_graph(n_nodes, n_draws, salt=""):
    import hashlib

    def h(k, s):
        return int(hashlib.md5(f"{salt}{s}:{k}".encode()).hexdigest()[:8], 16)

    return sorted({(min(a, b), max(a, b))
                   for k in range(n_draws)
                   for a, b in [(h(k, "a") % n_nodes, h(k, "b") % n_nodes)]
                   if a != b})


def test_kcore_k4_minus_edge(spark):
    """K4 is a 3-core; remove one edge and the 3-core collapses to the
    2-core (every node keeps degree >= 2)."""
    from gregor_spark.ops.graph import kcore_nodes

    k4 = list(itertools.combinations(range(4), 2))
    got = {r.id: r.core_deg for r in kcore_nodes(_edges(spark, k4), 3).collect()}
    assert got == {i: 3 for i in range(4)}
    broken = [p for p in k4 if p != (0, 1)]
    assert kcore_nodes(_edges(spark, broken), 3).count() == 0
    got2 = {r.id: r.core_deg
            for r in kcore_nodes(_edges(spark, broken), 2).collect()}
    assert got2 == {0: 2, 1: 2, 2: 3, 3: 3}


def test_kcore_peels_tendrils(spark):
    """A triangle with a pendant path: k=2 drops the whole tail (needs
    one peel round per path vertex — exercises the multi-round loop)."""
    from gregor_spark.ops.graph import kcore_nodes

    tri = [(0, 1), (0, 2), (1, 2)]
    tail = [(2, 10), (10, 11), (11, 12), (12, 13)]
    got = {r.id for r in kcore_nodes(_edges(spark, tri + tail), 2).collect()}
    assert got == {0, 1, 2}


def test_kcore_brute_parity(spark):
    from gregor_spark.ops.graph import kcore_nodes

    pairs = _md5_graph(40, 300)
    for k in (2, 3, 4):
        got = {r.id: r.core_deg
               for r in kcore_nodes(_edges(spark, pairs), k).collect()}
        assert got == _brute_kcore(pairs, k), f"k={k}"


def test_kcore_rejects_bad_k_and_caps_rounds(spark, monkeypatch):
    from gregor_spark.ops.graph import kcore_nodes

    with pytest.raises(ValueError):
        kcore_nodes(_edges(spark, [(0, 1)]), 0)
    # the round cap is the DISTRIBUTED peel's budget guard; the r8
    # single-task fast path converges exactly and has no cap, so force
    # the loop to pin the guard behavior
    monkeypatch.setenv("SPARK_GRAFT_SMALL_GRAPH", "0")
    chain = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError):
        kcore_nodes(_edges(spark, chain), 2, max_rounds=2)


def test_coreness_brute_parity(spark):
    from gregor_spark.ops.graph import coreness

    for salt, n, d in (("", 40, 300), ("x", 30, 120)):
        pairs = _md5_graph(n, d, salt)
        got = {r.id: r.coreness
               for r in coreness(_edges(spark, pairs)).collect()}
        assert got == _brute_coreness(pairs), salt


def test_coreness_matches_kcore_membership(spark):
    """coreness(v) >= k  <=>  v in k-core (definitional cross-check
    between the two implementations on a nontrivial graph)."""
    from gregor_spark.ops.graph import coreness, kcore_nodes

    pairs = _md5_graph(40, 300, "y")
    c = {r.id: r.coreness for r in coreness(_edges(spark, pairs)).collect()}
    for k in (2, 3):
        members = {r.id for r in kcore_nodes(_edges(spark, pairs), k).collect()}
        assert members == {v for v, cv in c.items() if cv >= k}


def test_kcore_partition_invariance(spark):
    from gregor_spark.ops.graph import coreness, kcore_nodes

    pairs = _md5_graph(35, 200, "z")
    base_k = sorted((r.id, r.core_deg)
                    for r in kcore_nodes(_edges(spark, pairs), 2).collect())
    base_c = sorted((r.id, r.coreness)
                    for r in coreness(_edges(spark, pairs)).collect())
    for parts in (1, 7):
        e = _edges(spark, pairs).repartition(parts)
        assert sorted((r.id, r.core_deg)
                      for r in kcore_nodes(e, 2).collect()) == base_k
        assert sorted((r.id, r.coreness)
                      for r in coreness(e).collect()) == base_c


# ------------------------------------------------------ bounded SSSP (r6)


def _wedges(spark, triples):
    return spark.createDataFrame(
        [(a, b, w) for a, b, w in triples], "doc_a long, doc_b long, w long"
    )


def _sssp_brute(n, triples, seeds, rounds):
    """Independent synchronous Bellman-Ford reference."""
    INF = float("inf")
    dist = {i: (0 if i in seeds else INF) for i in range(n)}
    adj = {}
    for a, b, w in triples:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    for _ in range(rounds):
        nxt = dict(dist)
        for u, d in dist.items():
            if d == INF:
                continue
            for v, w in adj.get(u, []):
                if d + w < nxt[v]:
                    nxt[v] = d + w
        dist = nxt
    return {i: (None if d == INF else d) for i, d in dist.items()}


def test_sssp_weighted_chain_and_cap(spark):
    from gregor_spark.ops.graph import sssp_bounded

    triples = [(0, 1, 5), (1, 2, 1), (2, 3, 10)]
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    got = {r.doc_id: r.dist
           for r in sssp_bounded(_ids(spark, 4), _wedges(spark, triples),
                                 seeds, max_rounds=2).collect()}
    assert got == {0: 0, 1: 5, 2: 6, 3: None}  # 3 needs a third edge
    got3 = {r.doc_id: r.dist
            for r in sssp_bounded(_ids(spark, 4), _wedges(spark, triples),
                                  seeds, max_rounds=3).collect()}
    assert got3[3] == 16


def test_sssp_prefers_cheap_long_path(spark):
    from gregor_spark.ops.graph import sssp_bounded

    triples = [(0, 1, 5), (1, 2, 1), (2, 3, 10), (0, 3, 100)]
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    one = {r.doc_id: r.dist
           for r in sssp_bounded(_ids(spark, 4), _wedges(spark, triples),
                                 seeds, max_rounds=1).collect()}
    assert one[3] == 100  # only the direct edge fits in 1 hop
    three = {r.doc_id: r.dist
             for r in sssp_bounded(_ids(spark, 4), _wedges(spark, triples),
                                   seeds, max_rounds=3).collect()}
    assert three[3] == 16  # the cheap 3-edge path wins once reachable


def test_sssp_uniform_weights_equal_bfs(spark):
    from gregor_spark.ops.graph import bfs_hops, sssp_bounded

    pairs = [(i, i + 1) for i in range(9)] + [(0, 5)]
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    hops = {r.doc_id: r.hops
            for r in bfs_hops(_ids(spark, 10), _edges(spark, pairs), seeds,
                              max_hops=4).collect()}
    dist = {r.doc_id: r.dist
            for r in sssp_bounded(
                _ids(spark, 10),
                _wedges(spark, [(a, b, 1) for a, b in pairs]),
                seeds, max_rounds=4).collect()}
    assert hops == dist


def test_sssp_brute_parity_and_partition_invariance(spark):
    import hashlib

    from gregor_spark.ops.graph import sssp_bounded

    def h(k, salt):
        return int(hashlib.md5(f"{salt}:{k}".encode()).hexdigest()[:8], 16)

    triples = sorted({
        (min(a, b), max(a, b), 1 + h(k, "w") % 20)
        for k in range(160)
        for a, b in [(h(k, "p") % 30, h(k, "q") % 30)]
        if a != b
    })
    # one weight per undirected pair (drop dup pairs w/ different weights)
    seen, uniq = set(), []
    for a, b, w in triples:
        if (a, b) not in seen:
            seen.add((a, b))
            uniq.append((a, b, w))
    ids, e = _ids(spark, 30), _wedges(spark, uniq)
    seeds = spark.createDataFrame([(0,), (13,)], "doc_id long")
    got = {r.doc_id: r.dist
           for r in sssp_bounded(ids, e, seeds, max_rounds=3).collect()}
    assert got == _sssp_brute(30, uniq, {0, 13}, 3)
    b2 = {r.doc_id: r.dist
          for r in sssp_bounded(ids.repartition(7), e.repartition(11),
                                seeds, max_rounds=3).collect()}
    assert got == b2


def test_sssp_rejects_negative_weights(spark):
    from gregor_spark.ops.graph import sssp_bounded

    seeds = spark.createDataFrame([(0,)], "doc_id long")
    with pytest.raises(ValueError, match="non-negative"):
        sssp_bounded(_ids(spark, 3), _wedges(spark, [(0, 1, -2)]), seeds, 2)


# --------------------------------------------------- r7: synchronous LPA


def _lpa(spark, n, pairs, rounds):
    from gregor_spark.ops.graph import lpa_communities

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    e = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {
        r.doc_id: r.label
        for r in lpa_communities(ids, e, rounds=rounds).collect()
    }


def _lpa_ref(n, pairs, rounds):
    """Independent reference: dict-based synchronous rounds."""
    nbrs = {i: [] for i in range(n)}
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    lab = {i: i for i in range(n)}
    for _ in range(rounds):
        new = {}
        for v in range(n):
            if not nbrs[v]:
                new[v] = lab[v]
                continue
            cnt = {}
            for u in nbrs[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda L: (-cnt[L], L))
        lab = new
    return lab


def test_lpa_two_cliques_bridge(spark):
    # two 4-cliques joined by one bridge edge: after 2 rounds each side
    # collapses to its clique minimum
    cl1 = list(itertools.combinations(range(4), 2))
    cl2 = list(itertools.combinations(range(4, 8), 2))
    pairs = cl1 + cl2 + [(3, 4)]
    got = _lpa(spark, 8, pairs, rounds=2)
    assert got == _lpa_ref(8, pairs, 2)
    assert len({got[i] for i in range(4)}) == 1


def test_lpa_reference_parity_random(spark):
    n = 60
    pairs = sorted({
        (min(a, b), max(a, b))
        for k in range(90)
        for a, b in [((k * 48271 + 3) % n, (k * 16807 + 5) % n)]
        if a != b
    })
    for rounds in (0, 1, 3):
        assert _lpa(spark, n, pairs, rounds) == _lpa_ref(n, pairs, rounds)


def test_lpa_parallelism_invariance(spark):
    from gregor_spark.ops.graph import lpa_communities

    n = 80
    pairs = [(i, (i * 7 + 3) % n) for i in range(n) if i != (i * 7 + 3) % n]
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    e = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    a = sorted(map(tuple, lpa_communities(ids, e, rounds=3).collect()))
    b = sorted(map(tuple, lpa_communities(
        ids.repartition(17), e.repartition(11), rounds=3).collect()))
    assert a == b
