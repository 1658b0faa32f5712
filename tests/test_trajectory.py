"""Trajectory rollups: hand-computed goldens on a tiny track, invariance
properties, and the registry-query golden for the resample_nearest
window-tail rotation."""

import datetime as dt
import math

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


