"""Merge-on-read deletes on the iceberg-like table
(sources/iceberg_like.py): position + equality delete files, read-time
anti-joins, data-sequence scoping (later appends survive earlier
equality deletes), time travel across MoR snapshots, compaction folding
deletes back to clean files, and maintenance-action awareness."""

import os

import pytest
from pyspark.sql import functions as F

from gregor_spark.sources.iceberg_like import (
    compact_table,
    delete_keys_mor,
    delete_where,
    delete_where_mor,
    expire_snapshots,
    merge_table,
    read_manifest,
    read_table,
    remove_orphan_files,
    write_table,
)


def _mk(spark, path, n=200, n_buckets=8):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("u"), F.col("id") % 7).alias("tag"),
    )
    return write_table(df, path, bucket_by="k", n_buckets=n_buckets)


def _keys(spark, path, **kw):
    return {r["k"] for r in read_table(spark, path, **kw).collect()}


def test_position_delete_basic(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    s = delete_where_mor(spark, path, "v >= 1500")
    assert s["operation"] == "delete-mor"
    assert s["delete_rows"] == 50
    got = _keys(spark, path)
    assert got == set(range(150))
    # data files untouched: the new snapshot lists the same files
    m = read_manifest(path)
    s0, s1 = m["snapshots"][-2], m["snapshots"][-1]
    assert [f["path"] for f in s0["files"]] == [f["path"] for f in s1["files"]]
    assert len(s1["delete_files"]) == 1
    assert s1["delete_files"][0]["kind"] == "position"


def test_position_delete_no_match_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    m0 = _mk(spark, path)
    s = delete_where_mor(spark, path, "v > 99999")
    assert s["delete_rows"] == 0 and s["delete_file"] is None
    assert read_manifest(path)["current_snapshot_id"] == m0["current_snapshot_id"]
    assert len(_keys(spark, path)) == 200


def test_position_delete_null_predicate_keeps_row(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k long, v long"
    )
    write_table(df, path, bucket_by="k", n_buckets=2)
    delete_where_mor(spark, path, "v > 15")
    assert _keys(spark, path) == {1, 2}  # NULL comparison keeps the row


def test_stacked_position_deletes(spark, tmp_path):
    """Two MoR deletes stack; re-deleting already-deleted rows records
    nothing twice (the second scan reads through the first delete)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_where_mor(spark, path, "k % 2 = 0")
    s2 = delete_where_mor(spark, path, "k % 4 != 3")  # overlaps the first
    assert s2["delete_rows"] == 50  # only odd k % 4 == 1 rows remain to hit
    assert _keys(spark, path) == {k for k in range(200) if k % 4 == 3}
    m = read_manifest(path)
    assert len(m["snapshots"][-1]["delete_files"]) == 2


def test_equality_delete_and_seq_scoping(spark, tmp_path):
    """Equality deletes remove existing keys; the SAME key appended
    AFTER the delete survives (data sequence scoping)."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    ks = spark.createDataFrame([(3,), (7,), (9999,)], "k long")
    s = delete_keys_mor(spark, path, ks, "k")
    assert s["delete_rows"] == 3  # distinct keys incl the no-match one
    assert _keys(spark, path) == set(range(200)) - {3, 7}
    app = spark.createDataFrame([(3, 333, "re")], "k long, v long, tag string")
    write_table(app, path, bucket_by="k", n_buckets=8, mode="append")
    got = read_table(spark, path).where("k = 3").collect()
    assert len(got) == 1 and got[0]["v"] == 333
    assert 7 not in _keys(spark, path)


def test_equality_delete_null_keys_dropped(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n=20)
    ks = spark.createDataFrame([(None,), (5,)], "k long")
    s = delete_keys_mor(spark, path, ks, "k")
    assert s["delete_rows"] == 1
    assert _keys(spark, path) == set(range(20)) - {5}


def test_time_travel_across_mor_snapshots(spark, tmp_path):
    path = str(tmp_path / "t")
    m0 = _mk(spark, path)
    pre = m0["current_snapshot_id"]
    s1 = delete_where_mor(spark, path, "k < 50")
    s2 = delete_keys_mor(spark, path, spark.createDataFrame([(60,)], "k long"), "k")
    assert len(_keys(spark, path, snapshot_id=pre)) == 200
    assert len(_keys(spark, path, snapshot_id=s1["snapshot_id"])) == 150
    assert len(_keys(spark, path, snapshot_id=s2["snapshot_id"])) == 149


def test_compaction_folds_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_where_mor(spark, path, "k < 30")
    delete_keys_mor(spark, path, spark.createDataFrame([(40,)], "k long"), "k")
    c = compact_table(spark, path)
    assert c["rows"] == 169
    m = read_manifest(path)
    assert not m["snapshots"][-1].get("delete_files")
    assert _keys(spark, path) == set(range(200)) - set(range(30)) - {40}
    # post-compaction COW ops work again
    delete_where(spark, path, "k = 199")
    assert 199 not in _keys(spark, path)


def test_cow_ops_refuse_on_mor_table(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_where_mor(spark, path, "k = 0")
    with pytest.raises(ValueError, match="merge-on-read"):
        delete_where(spark, path, "k = 1")
    src = spark.createDataFrame([(1, 1, "x")], "k long, v long, tag string")
    with pytest.raises(ValueError, match="merge-on-read"):
        merge_table(spark, path, src, "k")


def test_expire_keeps_live_delete_files(spark, tmp_path):
    """Expiring pre-delete snapshots keeps the delete files referenced
    by the current snapshot; expiring the MoR snapshots after a
    compaction reclaims them."""
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_where_mor(spark, path, "k < 10")
    r = expire_snapshots(path, keep_last=1)
    m = read_manifest(path)
    rel = m["snapshots"][-1]["delete_files"][0]["path"]
    assert os.path.isdir(os.path.join(path, rel))
    assert len(_keys(spark, path)) == 190
    compact_table(spark, path)
    r2 = expire_snapshots(path, keep_last=1)
    assert rel in r2["deleted_files"]
    assert not os.path.exists(os.path.join(path, rel))
    assert len(_keys(spark, path)) == 190


def test_orphan_removal_spares_live_deletes(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path)
    delete_where_mor(spark, path, "k < 10")
    out = remove_orphan_files(path, grace_seconds=0.0)
    m = read_manifest(path)
    rel = m["snapshots"][-1]["delete_files"][0]["path"]
    assert os.path.isdir(os.path.join(path, rel))
    assert all(not d.startswith("_deletes") for d in out["deleted"])
    assert len(_keys(spark, path)) == 190
