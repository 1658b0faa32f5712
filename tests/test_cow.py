"""Copy-on-write MERGE INTO / DELETE WHERE on the iceberg-like table
(sources/iceberg_like.py): file-granular rewrites, time travel across
the mutation, and untouched files surviving by identity."""

import pytest
from pyspark.sql import functions as F

from gregor_spark.sources.iceberg_like import (
    delete_where,
    merge_table,
    read_manifest,
    read_table,
    write_table,
)


def _mk(spark, path, n=200, n_buckets=8):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("u"), F.col("id") % 7).alias("tag"),
    )
    return write_table(df, path, bucket_by="k", n_buckets=n_buckets)


def _state(spark, path, **kw):
    return {
        r["k"]: (r["v"], r["tag"])
        for r in read_table(spark, path, **kw).collect()
    }


def test_merge_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "t")
    m0 = _mk(spark, path)
    pre_snap = m0["current_snapshot_id"]
    pre = _state(spark, path)

    src = spark.createDataFrame(
        [(5, 999, "upd"), (17, 888, "upd"), (1000, 1, "new"), (1001, 2, "new")],
        "k long, v long, tag string",
    )
    s = merge_table(spark, path, src, key="k")
    assert s["rows_updated"] == 2 and s["rows_inserted"] == 2
    assert s["files_rewritten"] >= 1

    got = _state(spark, path)
    want = dict(pre)
    want[5] = (999, "upd")
    want[17] = (888, "upd")
    want[1000] = (1, "new")
    want[1001] = (2, "new")
    assert got == want
    # time travel: the pre-merge snapshot is untouched
    assert _state(spark, path, snapshot_id=pre_snap) == pre


def test_merge_rewrites_only_hit_files(spark, tmp_path):
    path = str(tmp_path / "t2")
    m0 = _mk(spark, path)
    before = {f["path"] for f in m0["snapshots"][-1]["files"]}
    src = spark.createDataFrame([(5, 1, "x")], "k long, v long, tag string")
    merge_table(spark, path, src, key="k")
    m1 = read_manifest(path)
    after = {f["path"] for f in m1["snapshots"][-1]["files"]}
    survivors = before & after
    # one key lives in one bucket: every other file must survive by name
    assert len(before - after) >= 1
    assert len(survivors) >= len(before) - 2


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    path = str(tmp_path / "t3")
    _mk(spark, path, n=20)
    src = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "k long, v long, tag string"
    )
    with pytest.raises(ValueError, match="duplicate"):
        merge_table(spark, path, src, key="k")


def test_delete_where_predicate_and_null_safety(spark, tmp_path):
    path = str(tmp_path / "t4")
    df = spark.createDataFrame(
        [(0, 10, "a"), (1, None, "b"), (2, 30, "c"), (3, 40, "d")],
        "k long, v long, tag string",
    )
    write_table(df, path, bucket_by="k", n_buckets=4)
    pre_snap = read_manifest(path)["current_snapshot_id"]
    s = delete_where(spark, path, "v > 25")
    assert s["rows_deleted"] == 2
    got = _state(spark, path)
    # NULL predicate rows are KEPT (ANSI DELETE removes only WHERE=true)
    assert got == {0: (10, "a"), 1: (None, "b")}
    assert _state(spark, path, snapshot_id=pre_snap) == {
        0: (10, "a"), 1: (None, "b"), 2: (30, "c"), 3: (40, "d")
    }


def test_delete_no_match_is_noop(spark, tmp_path):
    path = str(tmp_path / "t5")
    _mk(spark, path, n=30)
    m0 = read_manifest(path)
    s = delete_where(spark, path, "v < 0")
    assert s["rows_deleted"] == 0 and s["files_rewritten"] == 0
    m1 = read_manifest(path)
    assert m1["current_snapshot_id"] == m0["current_snapshot_id"]
    assert len(m1["snapshots"]) == len(m0["snapshots"])


def test_merge_then_delete_history_chain(spark, tmp_path):
    path = str(tmp_path / "t6")
    _mk(spark, path, n=50)
    src = spark.createDataFrame([(500, 5, "n")], "k long, v long, tag string")
    merge_table(spark, path, src, key="k")
    delete_where(spark, path, "k % 2 = 1")
    m = read_manifest(path)
    assert [s["operation"] for s in m["snapshots"]] == [
        "overwrite", "merge", "delete",
    ]
    got = _state(spark, path)
    assert 500 in got and all(k % 2 == 0 for k in got)
    assert m["total_rows"] == len(got) == 26  # 25 evens + key 500
