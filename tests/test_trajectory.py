"""Trajectory rollups: hand-computed goldens on a tiny track, invariance
properties, and the registry-query golden for the resample_nearest
window-tail rotation."""

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F

from gregor_spark.ops.trajectory import track_stats


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


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), i, lo, la)
         for i, (u, s, lo, la) in enumerate(rows)],
        "user_id long, ts timestamp, event_id long, lon double, lat double",
    )


def test_track_stats_golden_two_hops(spark):
    # user 1: equator walk 0->0.1->0.3 deg lon over 2h; user 2: one event
    df = _ev(spark, [(1, 0, 0.0, 0.0), (1, 3600, 0.1, 0.0),
                     (1, 7200, 0.3, 0.0), (2, 0, 5.0, 5.0)])
    out = {r.user: r for r in track_stats(df, tiebreak="event_id").collect()}

    s1, s2 = _hav_km(0.0, 0.0, 0.1, 0.0), _hav_km(0.1, 0.0, 0.3, 0.0)
    exp_tot = (round(s1 * 1e6) + round(s2 * 1e6)) / 1e6
    r1 = out[1]
    assert (r1.n_events, r1.n_steps) == (3, 2)
    assert abs(r1.total_km - exp_tot) < 1e-9
    assert abs(r1.max_step_km - round(s2 * 1e6) / 1e6) < 1e-9
    assert abs(r1.net_km - round(_hav_km(0, 0, 0.3, 0) * 1e6) / 1e6) < 1e-9
    # collinear equator track: straight line, so straightness ~ 1
    assert abs(r1.straightness - 1.0) < 1e-6
    assert abs(r1.avg_kmh - exp_tot / 2.0) < 1e-6

    r2 = out[2]
    assert (r2.n_events, r2.n_steps, r2.total_km, r2.net_km) == (1, 0, 0.0, 0.0)
    assert r2.straightness is None and r2.avg_kmh is None


def test_track_stats_out_and_back_zero_net(spark):
    df = _ev(spark, [(7, 0, 10.0, 50.0), (7, 60, 10.2, 50.1),
                     (7, 120, 10.0, 50.0)])
    r = track_stats(df, tiebreak="event_id").collect()[0]
    assert r.net_km == 0.0 and r.straightness == 0.0
    assert abs(r.total_km - 2 * r.max_step_km) < 1e-9  # symmetric hops


def test_track_stats_partition_invariance(spark):
    rows = [(u, 37 * i % 1000, (i * 7 % 13) / 10.0, (i * 11 % 17) / 10.0)
            for u in range(5) for i in range(40)]
    df = _ev(spark, rows)
    a = sorted(map(tuple, track_stats(df, tiebreak="event_id").collect()))
    b = sorted(map(tuple, track_stats(
        df.repartition(13), tiebreak="event_id").collect()))
    assert a == b  # integer-quantized sums: bit-exact at any parallelism



def test_track_interp_golden(spark):
    from gregor_spark.ops.trajectory import track_interp

    # entity 1: fixes at t=0s,100s — grid 30s: samples at 0,30,60,90 owned
    # by the segment, plus nothing at 100 (not on 30s grid)
    rows = [
        (1, "2024-01-01 00:00:00", 0.0, 0.0, 1),
        (1, "2024-01-01 00:01:40", 10.0, 20.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, lon double, lat double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        track_interp(df, 30, tiebreak="event_id").collect(),
        key=lambda r: r.sample_us,
    )
    base = out[0].sample_us
    assert [r.sample_us - base for r in out] == [0, 30_000_000, 60_000_000, 90_000_000]
    for r, f in zip(out, (0.0, 0.3, 0.6, 0.9)):
        assert abs(r.lon - 10.0 * f) < 1e-12 and abs(r.lat - 20.0 * f) < 1e-12


def test_track_interp_endpoint_and_exactly_once(spark):
    from gregor_spark.ops.trajectory import track_interp

    # fixes at 0s, 60s, 120s with grid 60s: instants 0,60,120 — 60 owned by
    # the SECOND segment ([60,120)), 120 by the final fix; no duplicates
    rows = [
        (1, "2024-01-01 00:00:00", 0.0, 0.0, 1),
        (1, "2024-01-01 00:01:00", 6.0, 6.0, 2),
        (1, "2024-01-01 00:02:00", 12.0, 0.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, lon double, lat double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        track_interp(df, 60, tiebreak="event_id").collect(),
        key=lambda r: r.sample_us,
    )
    assert len(out) == 3
    assert [r.lon for r in out] == [0.0, 6.0, 12.0]
    assert [r.lat for r in out] == [0.0, 6.0, 0.0]


def test_track_interp_dup_ts_and_single_fix(spark):
    from gregor_spark.ops.trajectory import track_interp

    rows = [
        # entity 1: duplicate final ts — endpoint coords come from the
        # higher event_id (deterministic tiebreak)
        (1, "2024-01-01 00:00:00", 0.0, 0.0, 1),
        (1, "2024-01-01 00:01:00", 5.0, 5.0, 2),
        (1, "2024-01-01 00:01:00", 7.0, 7.0, 3),
        # entity 2: single fix ON the grid -> one sample
        (2, "2024-01-01 00:05:00", 1.0, 2.0, 4),
        # entity 3: single fix OFF the grid -> no samples
        (3, "2024-01-01 00:05:07", 1.0, 2.0, 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, lon double, lat double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = track_interp(df, 60, tiebreak="event_id").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 2
    end = max(by_user[1], key=lambda r: r.sample_us)
    assert end.lon == 7.0 and end.lat == 7.0  # the event_id=3 row wins
    assert len(by_user[2]) == 1 and by_user[2][0].lon == 1.0
    assert 3 not in by_user


def test_track_interp_partition_invariance(spark):
    from gregor_spark.ops.trajectory import track_interp

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    m1 = (F.col("event_id") * F.lit(1103515245) + F.lit(12345)) % F.lit(100003)
    m2 = (F.col("event_id") * F.lit(69069) + F.lit(54321)) % F.lit(100003)
    pts = ev.select(
        "user_id", "ts", "event_id",
        (F.lit(-0.25) + F.lit(2.0) * (m1 / F.lit(100003.0))).alias("lon"),
        (F.lit(9.75) + F.lit(2.0) * (m2 / F.lit(100003.0))).alias("lat"),
    )
    a = sorted(map(tuple, track_interp(pts, 21600, tiebreak="event_id").collect()))
    b = sorted(
        map(
            tuple,
            track_interp(pts.repartition(17), 21600, tiebreak="event_id").collect(),
        )
    )
    assert a == b and len(a) > 0

def _rdp_ref(pts, tol):
    """Independent recursive reference implementation."""
    import numpy as np

    if len(pts) <= 2:
        return list(range(len(pts)))
    a, b = pts[0], pts[-1]
    dx, dy = b[0] - a[0], b[1] - a[1]
    seg2 = dx * dx + dy * dy
    best_i, best_d2 = None, tol * tol
    for i in range(1, len(pts) - 1):
        px, py = pts[i][0] - a[0], pts[i][1] - a[1]
        if seg2 == 0.0:
            d2 = px * px + py * py
        else:
            cr = px * dy - py * dx
            d2 = (cr * cr) / seg2
        if d2 > best_d2:
            best_i, best_d2 = i, d2
    if best_i is None:
        return [0, len(pts) - 1]
    left = _rdp_ref(pts[: best_i + 1], tol)
    right = _rdp_ref(pts[best_i:], tol)
    return left + [best_i + j for j in right[1:]]


def test_simplify_straight_line_collapses(spark):
    from gregor_spark.ops.trajectory import simplify_tracks

    rows = [(1, f"2024-01-01 00:0{i}:00", float(i), 2.0 * i, i) for i in range(8)]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, lon double, lat double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = simplify_tracks(df, 0.01, tiebreak="event_id").collect()
    assert len(out) == 2
    assert sorted(r.lon for r in out) == [0.0, 7.0]


def test_simplify_keeps_corner(spark):
    from gregor_spark.ops.trajectory import simplify_tracks

    # an L-shape: the corner deviates far from the chord and must survive
    rows = [
        (1, "2024-01-01 00:00:00", 0.0, 0.0, 1),
        (1, "2024-01-01 00:01:00", 1.0, 0.0, 2),
        (1, "2024-01-01 00:02:00", 1.0, 1.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, lon double, lat double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = simplify_tracks(df, 0.2, tiebreak="event_id").collect()
    assert len(out) == 3


def test_simplify_matches_reference(spark):
    from gregor_spark.ops.trajectory import simplify_tracks

    rows = []
    for u in (1, 2, 3):
        for i in range(40):
            x = i / 10.0
            y = ((i * u * 37) % 17 - 8) / 20.0
            rows.append((u, f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", x, y, i))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, lon double, lat double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for tol in (0.0, 0.05, 0.3):
        out = simplify_tracks(df, tol, tiebreak="event_id").collect()
        got = {}
        for r in out:
            got.setdefault(r.user_id, []).append((r.lon, r.lat))
        for u in (1, 2, 3):
            pts = [(r[2], r[3]) for r in rows if r[0] == u]
            want = [pts[i] for i in _rdp_ref(pts, tol)]
            assert sorted(got[u]) == sorted(want), (u, tol)


def test_simplify_partition_invariance(spark):
    from gregor_spark.ops.trajectory import simplify_tracks

    rows = [
        (u, f"2024-01-01 00:{i:02d}:00", (i * 13 % 29) / 7.0, (i * 7 % 31) / 9.0, i)
        for u in (1, 2)
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, lon double, lat double, event_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    a = sorted(map(tuple, simplify_tracks(df, 0.1, tiebreak="event_id").collect()))
    b = sorted(
        map(
            tuple,
            simplify_tracks(df.repartition(9), 0.1, tiebreak="event_id").collect(),
        )
    )
    assert a == b and len(a) > 4


# ------------------------------------------------------------- OD matrix


def test_od_matrix_golden(spark):
    from gregor_spark.ops.trajectory import od_matrix

    # grid: 4 tiles over [0, 4) in each axis (tile width 1.0)
    df = _ev(spark, [
        (1, 0, 0.5, 0.5), (1, 60, 2.5, 0.5), (1, 120, 3.5, 3.5),  # (0,0)->(3,3)
        (2, 0, 0.6, 0.4), (2, 60, 0.7, 0.3),                      # stays in (0,0)
        (3, 0, 3.2, 0.1),                                         # single fix
    ])
    rows = {(r.o_tx, r.o_ty, r.d_tx, r.d_ty): r
            for r in od_matrix(df, 0.0, 0.0, 4.0, 4, tiebreak="event_id").collect()}
    assert rows[(0, 0, 3, 3)].n_users == 1 and rows[(0, 0, 3, 3)].n_stationary == 0
    assert rows[(0, 0, 0, 0)].n_users == 1 and rows[(0, 0, 0, 0)].n_stationary == 1
    assert rows[(3, 0, 3, 0)].n_users == 1 and rows[(3, 0, 3, 0)].n_stationary == 1
    assert len(rows) == 3


def test_od_matrix_clamps_out_of_bounds(spark):
    from gregor_spark.ops.trajectory import od_matrix

    df = _ev(spark, [(1, 0, -5.0, 9.0), (1, 60, 1.0, 1.0)])
    (r,) = od_matrix(df, 0.0, 0.0, 4.0, 4, tiebreak="event_id").collect()
    assert (r.o_tx, r.o_ty, r.d_tx, r.d_ty) == (0, 3, 1, 1)


def test_od_matrix_tiebreak_on_duplicate_ts(spark):
    from gregor_spark.ops.trajectory import od_matrix

    # two fixes at the same ts: event_id orders them deterministically
    df = _ev(spark, [(1, 0, 0.5, 0.5), (1, 0, 2.5, 2.5), (1, 60, 3.5, 3.5)])
    (r,) = od_matrix(df, 0.0, 0.0, 4.0, 4, tiebreak="event_id").collect()
    assert (r.o_tx, r.o_ty) == (0, 0)  # lowest event_id wins the origin


def test_od_matrix_rejects_bad_args(spark):
    import pytest as _pytest

    from gregor_spark.ops.trajectory import od_matrix

    df = _ev(spark, [(1, 0, 0.5, 0.5)])
    with _pytest.raises(ValueError):
        od_matrix(df, 0.0, 0.0, 4.0, 0)
    with _pytest.raises(ValueError):
        od_matrix(df, 0.0, 0.0, -1.0, 4)


# ------------------------------------------------------------ staypoints


def test_staypoints_golden(spark):
    from gregor_spark.ops.trajectory import staypoints

    # user 1: dwell near (0, 0) for 3 fixes spanning 2 h (~55 m hops,
    # 0.055 km/h), then a 100+ km teleport, then a second 1-fix anchor.
    df = _ev(spark, [
        (1, 0, 0.0000, 0.0),
        (1, 3600, 0.0005, 0.0),
        (1, 7200, 0.0010, 0.0),
        (1, 10800, 1.0, 1.0),      # fast step -> breaks the island
        (2, 0, 5.0, 5.0),          # single fix, never a staypoint
    ])
    out = staypoints(df, max_speed_kmh=1.0, min_duration_s=3600.0,
                     tiebreak="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r.user == 1 and r.n_fixes == 3 and r.duration_s == 7200.0
    assert r.start_ts == dt.datetime(2024, 1, 1)
    assert r.end_ts == dt.datetime(2024, 1, 1, 2, 0)
    # centroid of integer micro-degree fixes: (0 + 500 + 1000)/3 µdeg
    assert r.lon_c == (0 + 500 + 1000) / 3 / 1e6 and r.lat_c == 0.0


def test_staypoints_duration_filter(spark):
    from gregor_spark.ops.trajectory import staypoints

    df = _ev(spark, [(1, 0, 0.0, 0.0), (1, 600, 0.0001, 0.0)])  # 10-minute dwell
    assert staypoints(df, 1.0, 3600.0, tiebreak="event_id").count() == 0
    assert staypoints(df, 1.0, 600.0, tiebreak="event_id").count() == 1


def test_staypoints_two_islands(spark):
    from gregor_spark.ops.trajectory import staypoints

    rows = [(1, 0, 0.0, 0.0), (1, 3600, 0.0001, 0.0),       # island A
            (1, 7200, 2.0, 2.0), (1, 10800, 2.0001, 2.0)]   # teleport, island B
    out = sorted(staypoints(_ev(spark, rows), 1.0, 1800.0,
                            tiebreak="event_id").collect(),
                 key=lambda r: r.stay_id)
    assert len(out) == 2
    assert out[0].n_fixes == 2 and abs(out[0].lon_c) < 1e-3
    assert out[1].n_fixes == 2 and abs(out[1].lon_c - 2.0) < 1e-3
    assert out[0].stay_id < out[1].stay_id


def test_staypoints_partition_invariance(spark):
    from gregor_spark.ops.trajectory import staypoints

    rows = [(u, s * 600, (u * 7 + s) % 5 * 0.0001, (u * 3 + s) % 7 * 0.0001)
            for u in range(4) for s in range(12)]
    df = _ev(spark, rows)
    a = sorted(map(tuple, staypoints(df, 1.0, 600.0, tiebreak="event_id").collect()))
    b = sorted(map(tuple,
                   staypoints(df.repartition(13), 1.0, 600.0,
                              tiebreak="event_id").collect()))
    assert a == b and len(a) > 0


# ------------------------------------------------------ track similarity


def _hav_np(lon1, lat1, lon2, lat2):
    import numpy as np

    dphi = np.radians(lat2 - lat1)
    dlmb = np.radians(lon2 - lon1)
    h = (np.sin(dphi / 2) ** 2
         + np.cos(np.radians(lat1)) * np.cos(np.radians(lat2))
         * np.sin(dlmb / 2) ** 2)
    return 12742.0176 * np.arcsin(min(1.0, np.sqrt(h)))


def _brute_frechet(ta, tb):
    """Independent plain-recursive Eiter-Mannila reference."""
    import functools

    @functools.lru_cache(maxsize=None)
    def c(i, j):
        d = _hav_np(ta[i][0], ta[i][1], tb[j][0], tb[j][1])
        if i == 0 and j == 0:
            return d
        if i == 0:
            return max(c(0, j - 1), d)
        if j == 0:
            return max(c(i - 1, 0), d)
        return max(min(c(i - 1, j), c(i - 1, j - 1), c(i, j - 1)), d)

    return c(len(ta) - 1, len(tb) - 1)


def _brute_dtw(ta, tb):
    import functools

    @functools.lru_cache(maxsize=None)
    def c(i, j):
        d = _hav_np(ta[i][0], ta[i][1], tb[j][0], tb[j][1])
        if i == 0 and j == 0:
            return d
        if i == 0:
            return c(0, j - 1) + d
        if j == 0:
            return c(i - 1, 0) + d
        return min(c(i - 1, j), c(i - 1, j - 1), c(i, j - 1)) + d

    return c(len(ta) - 1, len(tb) - 1)


def _md5_track(uid, n, scale=1.0):
    import hashlib

    def h(k, s):
        v = int(hashlib.md5(f"{uid}:{s}:{k}".encode()).hexdigest()[:8], 16)
        return v / 0xFFFFFFFF

    return [(h(k, "x") * scale, 9.0 + h(k, "y") * scale) for k in range(n)]


def _sim_fixture(spark, tracks):
    rows = [
        (uid, k, float(x), float(y))
        for uid, trk in tracks.items()
        for k, (x, y) in enumerate(trk)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts long, lon double, lat double"
    )


def _pairs(spark, ps):
    return spark.createDataFrame(ps, "user_a long, user_b long")


def test_track_similarity_identical_and_shifted(spark):
    """Identical tracks: Fréchet 0, DTW 0.  A constant 1-degree-east
    shift of a straight track: Fréchet = the pointwise offset, DTW >=
    n * small-step matches."""
    from gregor_spark.ops.trajectory import track_similarity

    base = [(float(k) / 10.0, 10.0) for k in range(8)]
    shifted = [(x + 1.0, y) for x, y in base]
    df = _sim_fixture(spark, {1: base, 2: list(base), 3: shifted})
    got = {(r.user_a, r.user_b): r.dist_km
           for r in track_similarity(df, _pairs(spark, [(1, 2), (1, 3)])).collect()}
    assert got[(1, 2)] == 0.0
    assert abs(got[(1, 3)] - _hav_np(0.0, 10.0, 1.0, 10.0)) < 1e-9


@pytest.mark.parametrize(
    "na,nb,scale",
    [(7, 7, 1.0), (13, 5, 0.1), (20, 20, 5.0)],  # equal/ragged/wide regimes
)
def test_track_similarity_brute_parity(spark, na, nb, scale):
    from gregor_spark.ops.trajectory import track_similarity

    ta, tb = _md5_track(1, na, scale), _md5_track(2, nb, scale)
    df = _sim_fixture(spark, {1: ta, 2: tb})
    p = _pairs(spark, [(1, 2)])
    fr = track_similarity(df, p, metric="frechet").collect()[0]
    dt = track_similarity(df, p, metric="dtw").collect()[0]
    assert (fr.n_a, fr.n_b) == (na, nb)
    assert abs(fr.dist_km - _brute_frechet(tuple(ta), tuple(tb))) < 1e-9
    assert abs(dt.dist_km - _brute_dtw(tuple(ta), tuple(tb))) < 1e-9
    assert fr.dist_km <= dt.dist_km  # max-leash <= summed alignment


def test_track_similarity_partition_invariance(spark):
    from gregor_spark.ops.trajectory import track_similarity

    tracks = {u: _md5_track(u, 9 + u) for u in range(6)}
    df = _sim_fixture(spark, tracks)
    ps = [(u, u + 1) for u in range(5)]
    base = sorted(map(tuple, track_similarity(df, _pairs(spark, ps)).collect()))
    rep = sorted(map(tuple, track_similarity(
        df.repartition(11), _pairs(spark, ps).repartition(3)).collect()))
    assert base == rep


def test_track_similarity_guards(spark):
    from gregor_spark.ops.trajectory import track_similarity

    df = _sim_fixture(spark, {1: _md5_track(1, 4), 2: _md5_track(2, 4)})
    p = _pairs(spark, [(1, 2)])
    with pytest.raises(ValueError):
        track_similarity(df, p, metric="euclid")
    with pytest.raises(Exception, match="max_len"):
        track_similarity(df, p, max_len=1).collect()


# ------------------------------------------------ r7: bounded VW


def _vw_df(spark, rows):
    return spark.createDataFrame(rows, "track_id long, seq long, x long, y long")


def test_simplify_vw_hand_golden(spark):
    from gregor_spark.ops.trajectory import simplify_tracks_vw

    # track 0: near-collinear middle vertices with doubled areas 2 and 8;
    # thr=10 removes seq=1 (area 2) round 1, then seq=2's area RECOMPUTES
    # against new neighbors — the iterative part a one-pass filter misses
    rows = [(0, 0, 0, 0), (0, 1, 10, 1), (0, 2, 20, 0), (0, 3, 40, 2)]
    out = sorted(
        (r.seq for r in simplify_tracks_vw(
            _vw_df(spark, rows), min_area2=25, rounds=1).collect())
    )
    assert out == [0, 2, 3]
    out2 = sorted(
        (r.seq for r in simplify_tracks_vw(
            _vw_df(spark, rows), min_area2=100, rounds=5).collect())
    )
    assert out2 == [0, 3]  # everything interior eventually qualifies


def test_simplify_vw_endpoints_and_caps(spark):
    from gregor_spark.ops.trajectory import simplify_tracks_vw

    rows = [(7, s, s * 10, (s * s) % 7) for s in range(12)]
    for rounds in (0, 3):
        out = simplify_tracks_vw(
            _vw_df(spark, rows), min_area2=10**9, rounds=rounds
        ).collect()
        seqs = sorted(r.seq for r in out)
        assert len(seqs) == 12 - rounds      # one removal per round
        assert 0 in seqs and 11 in seqs      # endpoints survive


def test_simplify_vw_parallelism_invariance(spark):
    from gregor_spark.ops.trajectory import simplify_tracks_vw

    rows = [
        (int(i % 5), int(i), int((i * 48271 + 7) % 997), int((i * 16807 + 11) % 991))
        for i in range(200)
    ]
    a = sorted(map(tuple, simplify_tracks_vw(
        _vw_df(spark, rows), 40_000, 4).collect()))
    b = sorted(map(tuple, simplify_tracks_vw(
        _vw_df(spark, rows).repartition(13), 40_000, 4).collect()))
    assert a == b and len(a) < 200
