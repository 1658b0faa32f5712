"""asof_join edge semantics: backward-inclusive ties, missing-match NULLs,
per-key isolation, and the no-range-join plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_asof_join_semantics(spark):
    from gregor_spark.ops.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, _ts(5), 10),   # after r@3 -> matches 3
            (2, _ts(2), 10),   # before any right row -> NULL
            (3, _ts(3), 10),   # ties r@3 -> inclusive, matches 3
            (4, _ts(9), 10),   # after r@3 and r@7 -> matches 7
            (5, _ts(9), 20),   # other key: only r@8 exists -> matches 8
            (6, _ts(1), 30),   # key with no right rows at all -> NULL
        ],
        "event_id long, ts timestamp, user_id long",
    )
    right = spark.createDataFrame(
        [
            (101, _ts(3), 10, 0.3),
            (102, _ts(7), 10, 0.7),
            (103, _ts(8), 20, 0.8),
        ],
        "rid long, ts timestamp, user_id long, val double",
    )
    out = {
        r["event_id"]: (r["r_rid"], r["r_val"])
        for r in asof_join(left, right, on="user_id", ts="ts").collect()
    }
    assert out[1] == (101, 0.3)
    assert out[2] == (None, None)
    assert out[3] == (101, 0.3)   # equal ts counts (backward inclusive)
    assert out[4] == (102, 0.7)
    assert out[5] == (103, 0.8)
    assert out[6] == (None, None)
    assert len(out) == 6          # every left row exactly once


def test_asof_join_duplicate_right_ts_deterministic(spark):
    """Duplicate (key, ts) right rows: the GREATEST payload struct wins
    (field-order lexicographic — here the larger rid), identically at two
    parallelism levels, so the operator is fully defined without caller
    pre-dedup."""
    from gregor_spark.ops.temporal import asof_join

    left_rows = [(i, _ts(5 + (i % 3)), 10 + (i % 4)) for i in range(200)]
    # three right rows per (key, ts) — same ts, different payloads
    right_rows = [
        (rid, _ts(secs), key, rid * 0.1)
        for key in (10, 11, 12, 13)
        for secs in (3, 5, 6)
        for rid in (key * 100 + secs * 10 + d for d in (0, 1, 2))
    ]
    expected_rid = {
        (key, secs): max(key * 100 + secs * 10 + d for d in (0, 1, 2))
        for key in (10, 11, 12, 13)
        for secs in (3, 5, 6)
    }
    results = []
    for shuffle in ("3", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        left = spark.createDataFrame(
            left_rows, "event_id long, ts timestamp, user_id long"
        ).repartition(int(shuffle))
        right = spark.createDataFrame(
            right_rows, "rid long, ts timestamp, user_id long, val double"
        ).repartition(int(shuffle))
        got = {
            r["event_id"]: r["r_rid"]
            for r in asof_join(left, right, on="user_id", ts="ts").collect()
        }
        results.append(got)
    spark.conf.unset("spark.sql.shuffle.partitions")
    assert results[0] == results[1]  # parallelism-independent
    for event_id, ts, key in left_rows:
        secs = 5 + (event_id % 3)
        best = max(s for s in (3, 5, 6) if s <= secs)
        assert results[0][event_id] == expected_rid[(key, best)]


def test_asof_directions_match_pandas_merge_asof(spark):
    """forward / nearest / tolerance semantics against pandas
    merge_asof — an independent implementation — on 400 random rows
    (dup-free right ts per key, so both engines' tie rules coincide)."""
    import random

    import pandas as pd

    rng = random.Random(13)
    lrows = [
        (i, _ts(rng.randrange(0, 500)), rng.randrange(3)) for i in range(400)
    ]
    seen = set()
    rrows = []
    for j in range(200):
        k = rng.randrange(3)
        t = rng.randrange(0, 500)
        if (k, t) in seen:
            continue
        seen.add((k, t))
        rrows.append((1000 + j, _ts(t), k, j * 0.5))
    from gregor_spark.ops.temporal import asof_join

    left = spark.createDataFrame(lrows, "event_id long, ts timestamp, user_id long")
    right = spark.createDataFrame(rrows, "rid long, ts timestamp, user_id long, val double")
    lpd = pd.DataFrame(lrows, columns=["event_id", "ts", "user_id"]).sort_values("ts")
    rpd = pd.DataFrame(rrows, columns=["rid", "ts", "user_id", "val"]).sort_values("ts")
    for direction, tol in [
        ("backward", None), ("forward", None), ("nearest", None),
        ("backward", 30.0), ("nearest", 15.0),
    ]:
        got = {
            r["event_id"]: r["r_rid"]
            for r in asof_join(
                left, right, on="user_id", ts="ts",
                direction=direction, tolerance=tol,
            ).collect()
        }
        exp_df = pd.merge_asof(
            lpd, rpd, on="ts", by="user_id", direction=direction,
            tolerance=pd.Timedelta(seconds=tol) if tol is not None else None,
        )
        exp = {
            int(r.event_id): (None if pd.isna(r.rid) else int(r.rid))
            for r in exp_df.itertuples()
        }
        assert got == exp, f"direction={direction} tolerance={tol}"


def test_asof_join_rejects_bad_direction(spark):
    from gregor_spark.ops.temporal import asof_join

    left = spark.range(1).selectExpr("id AS event_id", "timestamp_seconds(id) AS ts", "id AS user_id")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, direction="sideways")


def test_asof_join_plan_has_no_range_join(spark):
    """The operator must plan as union + window — ONE shuffle on the key,
    no BroadcastNestedLoop/cartesian from a range predicate."""
    from gregor_spark.ops.temporal import asof_join

    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        (F.col("id") % 5).alias("user_id"),
    )
    right = spark.range(40).select(
        F.col("id").alias("rid"),
        F.timestamp_seconds(F.col("id") * 97).alias("ts"),
        (F.col("id") % 5).alias("user_id"),
    )
    plan = asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan
    assert plan.count("Exchange") <= 2  # the window's (+AQE coalesce at most)
