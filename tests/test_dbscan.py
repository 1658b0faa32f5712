"""DBSCAN: hand-built blob goldens, an independent brute-force replay
(quadratic edges + BFS components + min-rule borders), degenerate
params, and partition invariance."""

import math

import pytest

from gregor_spark.ops.dbscan import dbscan


def _hav_km(lon1, lat1, lon2, lat2):
    dphi = math.radians(lat2 - lat1)
    dlmb = math.radians(lon2 - lon1)
    h = (
        math.sin(dphi / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlmb / 2) ** 2
    )
    return 12742.0176 * math.asin(min(1.0, math.sqrt(h)))


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, lon double, lat double")


def _brute(rows, eps_km, min_pts):
    """Independent DBSCAN: quadratic edge scan, BFS over core-core
    edges (labels = min core id), min-rule border assignment."""
    ids = [r[0] for r in rows]
    pos = {r[0]: (r[1], r[2]) for r in rows}
    nbr = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j and _hav_km(*pos[i], *pos[j]) <= eps_km:
                nbr[i].add(j)
                nbr[j].add(i)
    core = {i for i in ids if len(nbr[i]) + 1 >= min_pts}
    label = {}
    for seed in sorted(core):
        if seed in label:
            continue
        comp, stack = {seed}, [seed]
        while stack:
            v = stack.pop()
            for u in nbr[v]:
                if u in core and u not in comp:
                    comp.add(u)
                    stack.append(u)
        m = min(comp)
        for v in comp:
            label[v] = m
    out = {}
    for i in ids:
        if i in core:
            out[i] = (True, label[i])
        else:
            adj = [label[j] for j in nbr[i] if j in core]
            out[i] = (False, min(adj) if adj else None)
    return out


# ~0.009 deg lat = 1 km; blob points are ~1.1 km apart pairwise
def test_dbscan_two_blobs_golden(spark):
    km = 0.0090437  # ~1 km of latitude
    rows = [
        # blob A: 3 mutually-close cores (ids 1-3) + 1 border (4)
        (1, 0.0, 0.0), (2, 0.0, km), (3, km, 0.0), (4, 0.0, 2.6 * km),
        # blob B: 3 cores far away (ids 10-12)
        (10, 1.0, 1.0), (11, 1.0, 1.0 + km), (12, 1.0 + km, 1.0),
        # noise
        (99, 3.0, 3.0),
    ]
    got = {r.point_id: (r.is_core, r.cluster_id)
           for r in dbscan(_pts(spark, rows), eps_km=2.0, min_pts=3).collect()}
    assert got == _brute(rows, 2.0, 3)
    assert got[1] == (True, 1) and got[2] == (True, 1) and got[3] == (True, 1)
    assert got[4] == (False, 1)          # border of blob A
    assert got[10] == (True, 10) and got[11] == (True, 10) and got[12] == (True, 10)
    assert got[99] == (False, None)      # noise


def test_dbscan_border_takes_min_cluster(spark):
    """A border point within eps of cores from TWO clusters joins the
    one with the smaller cluster id — the documented deterministic
    tie-break."""
    km = 0.0090437
    # a 1-D street (km units of latitude): A = {1,2,3}, B = {5,6,7},
    # bridge 8 at 6 km — at eps=4.5 its only neighbors are cores 3 and
    # 5 (degree 2 < min_pts−1 = 3, so it can never become core or merge
    # the clusters)
    rows = [
        (1, 0.0, 0.0), (2, 0.0, km), (3, 0.0, 2 * km),
        (5, 0.0, 10 * km), (6, 0.0, 11 * km), (7, 0.0, 12 * km),
        (8, 0.0, 6 * km),
    ]
    got = {r.point_id: (r.is_core, r.cluster_id)
           for r in dbscan(_pts(spark, rows), eps_km=4.5, min_pts=4).collect()}
    assert got == _brute(rows, 4.5, 4)
    assert got[3] == (True, 3) and got[5] == (True, 5)  # the two cores
    assert got[8] == (False, 3)  # border of BOTH; takes min(3, 5)
    assert got[1] == (False, 3) and got[7] == (False, 5)
    assert got[3][1] != got[5][1]  # clusters NOT merged through 8


def test_dbscan_min_pts_one_all_singleton_cores(spark):
    rows = [(i, float(i), float(i)) for i in range(5)]
    got = {r.point_id: (r.is_core, r.cluster_id)
           for r in dbscan(_pts(spark, rows), eps_km=0.1, min_pts=1).collect()}
    assert got == {i: (True, i) for i in range(5)}


def test_dbscan_brute_parity_lcg(spark):
    """61-point LCG cloud (the contract fixture's generator, denser
    slice): full verdict parity with the independent quadratic replay."""
    rows = [
        (i,
         -0.25 + 2.0 * (((i * 1103515245 + 12345) % 100003) / 100003.0) * 0.05,
         9.75 + 2.0 * (((i * 69069 + 54321) % 100003) / 100003.0) * 0.05)
        for i in range(61)
    ]
    df = _pts(spark, rows)
    got = {r.point_id: (r.is_core, r.cluster_id)
           for r in dbscan(df, eps_km=1.2, min_pts=3).collect()}
    want = _brute(rows, 1.2, 3)
    assert got == want
    # the fixture must exercise all three roles
    kinds = {(c, cl is not None) for c, cl in want.values()}
    assert {(True, True), (False, True), (False, False)} <= kinds


def test_dbscan_partition_invariance(spark):
    rows = [
        (i,
         -0.25 + 2.0 * (((i * 1103515245 + 12345) % 100003) / 100003.0) * 0.05,
         9.75 + 2.0 * (((i * 69069 + 54321) % 100003) / 100003.0) * 0.05)
        for i in range(40)
    ]
    a = sorted(map(tuple, dbscan(_pts(spark, rows), 1.2, 3).collect()))
    b = sorted(map(tuple,
                   dbscan(_pts(spark, rows).repartition(11), 1.2, 3).collect()))
    assert a == b


def test_dbscan_rejects_bad_args(spark):
    df = _pts(spark, [(1, 0.0, 0.0)])
    with pytest.raises(ValueError):
        dbscan(df, eps_km=0.0, min_pts=3)
    with pytest.raises(ValueError):
        dbscan(df, eps_km=1.0, min_pts=0)


# -------------------------------------------------------------- ST-DBSCAN


def _st_pts(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [(i, lon, lat, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s))
         for i, lon, lat, s in rows],
        "point_id long, lon double, lat double, ts timestamp",
    )


def test_st_dbscan_time_separates_same_place(spark):
    """Two dense bursts at the SAME location, 10 days apart: plain
    DBSCAN merges them; ST-DBSCAN with a 1-day temporal radius keeps
    them distinct clusters — the operator's reason to exist."""
    from gregor_spark.ops.dbscan import dbscan, st_dbscan

    km = 0.0090437
    burst1 = [(i, 0.0, i * 0.2 * km, i * 600) for i in range(4)]
    burst2 = [(10 + i, 0.0, i * 0.2 * km, 10 * 86400 + i * 600) for i in range(4)]
    df = _st_pts(spark, burst1 + burst2)
    st = {r.point_id: r.cluster_id
          for r in st_dbscan(df, eps_km=2.0, eps_t_s=86400.0, min_pts=3).collect()}
    assert st[0] == st[3] == 0 and st[10] == st[13] == 10
    assert st[0] != st[10]
    plain = {r.point_id: r.cluster_id
             for r in dbscan(df.select("point_id", "lon", "lat"),
                             eps_km=2.0, min_pts=3).collect()}
    assert plain[0] == plain[10] == 0  # space-only view merges them


def test_st_edges_brute_parity(spark):
    import datetime as dt
    import math

    from gregor_spark.ops.dbscan import st_edges

    rows = [
        (i,
         -0.25 + 2.0 * (((i * 48271) % 997) / 997.0) * 0.03,
         9.75 + 2.0 * (((i * 16807) % 997) / 997.0) * 0.03,
         ((i * 69621) % 97) * 600)
        for i in range(80)
    ]
    df = _st_pts(spark, rows)
    got = {(r.a_point_id, r.b_point_id) for r in
           st_edges(df, eps_km=1.5, eps_t_s=7200.0).collect()}

    def hav(lo1, la1, lo2, la2):
        dphi = math.radians(la2 - la1)
        dl = math.radians(lo2 - lo1)
        h = (math.sin(dphi / 2) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(dl / 2) ** 2)
        return 12742.0176 * math.asin(min(1.0, math.sqrt(h)))

    want = set()
    for i, loi, lai, si in rows:
        for j, loj, laj, sj in rows:
            if i < j and abs(si - sj) <= 7200 and hav(loi, lai, loj, laj) <= 1.5:
                want.add((i, j))
    assert got == want and len(want) > 10


def test_st_dbscan_partition_invariance(spark):
    from gregor_spark.ops.dbscan import st_dbscan

    rows = [
        (i,
         -0.25 + 2.0 * (((i * 48271) % 997) / 997.0) * 0.03,
         9.75 + 2.0 * (((i * 16807) % 997) / 997.0) * 0.03,
         ((i * 69621) % 97) * 600)
        for i in range(60)
    ]
    df = _st_pts(spark, rows)
    a = sorted(map(tuple, st_dbscan(df, 1.5, 7200.0, 3).collect()))
    b = sorted(map(tuple, st_dbscan(df.repartition(11), 1.5, 7200.0, 3).collect()))
    assert a == b


def test_st_dbscan_rejects_bad_args(spark):
    from gregor_spark.ops.dbscan import st_edges

    df = _st_pts(spark, [(1, 0.0, 0.0, 0)])
    with pytest.raises(ValueError):
        st_edges(df, eps_km=0.0, eps_t_s=60.0)
    with pytest.raises(ValueError):
        st_edges(df, eps_km=1.0, eps_t_s=0.0)
