"""Streaming theta/KMV: the foreachBatch bottom-k loop must equal batch
``theta_sketch`` on the union of all batches; state survives restart,
replay, compaction, and a first-batch crash."""

import os
import time

from pyspark.sql import functions as F

from gregor_spark.ops.sketch import theta_sketch
from gregor_spark.streaming.theta_stream import (
    compact_theta,
    read_theta,
    start_theta_stream,
    theta_stream_estimate,
)

SCHEMA = "doc_id long, text string"
K = 32


def _write_slice(df, src, seq):
    def listing():
        return {
            os.path.join(root, f)
            for root, _dirs, files in os.walk(src)
            for f in files
        }

    before = listing() if os.path.isdir(src) else set()
    df.coalesce(1).write.mode("append").parquet(src)
    stamp = time.time() + seq * 10
    for p in listing() - before:
        os.utime(p, (stamp, stamp))
    time.sleep(0.05)


def _batches(spark):
    def mk(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("tok"), (F.col("id") % 700).cast("string")).alias("text"),
        )

    return [mk(0, 300), mk(200, 600), mk(550, 900)]


def _run_stream(spark, tmp_path, tag="a"):
    src = str(tmp_path / f"src_{tag}")
    for i, b in enumerate(_batches(spark)):
        _write_slice(b, src, i)
    state = str(tmp_path / f"state_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    q = start_theta_stream(spark, src, SCHEMA, state, ckpt, col="text", k=K)
    q.awaitTermination(300)
    return src, state, ckpt


def test_stream_sketch_equals_batch_union(spark, tmp_path):
    _src, state, _ckpt = _run_stream(spark, tmp_path)
    got = read_theta(spark, state, K).collect()[0]
    union = _batches(spark)[0]
    for b in _batches(spark)[1:]:
        union = union.unionByName(b)
    want = theta_sketch(union, "text", k=K).collect()[0]
    assert got.hs == want.hs and got.nd == want.nd
    est = theta_stream_estimate(spark, state, K).collect()[0]
    # 700 distinct tokens ingested; KMV k=32 stderr ~ n/sqrt(k-2)
    assert abs(est.n_est - 700) / 700 < 0.6


def test_restart_processes_only_new_batch(spark, tmp_path):
    src, state, ckpt = _run_stream(spark, tmp_path, "b")
    before = read_theta(spark, state, K).collect()[0]
    late = spark.range(5000, 5100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("neu"), F.col("id").cast("string")).alias("text"),
    )
    _write_slice(late, src, 9)
    q = start_theta_stream(spark, src, SCHEMA, state, ckpt, col="text", k=K)
    q.awaitTermination(300)
    parts = {d for d in os.listdir(state) if d.startswith("batch_id=")}
    assert len(parts) == 4  # exactly one new partition
    after = read_theta(spark, state, K).collect()[0]
    # merged sketch can only move toward smaller hashes
    assert after.nd == K and after.hs[-1] <= before.hs[-1]


def test_replayed_batch_is_idempotent(spark, tmp_path):
    _src, state, _ckpt = _run_stream(spark, tmp_path, "c")
    before = read_theta(spark, state, K).collect()[0]
    # at-least-once redelivery: rewrite batch 0's sketch over itself
    from gregor_spark.ops.sketch import _hash60

    b0 = _batches(spark)[0].select(_hash60(F.col("text")).alias("h"))
    b0.distinct().orderBy("h").limit(K).write.mode("overwrite").parquet(
        os.path.join(state, "batch_id=0")
    )
    after = read_theta(spark, state, K).collect()[0]
    assert before.hs == after.hs and before.nd == after.nd


def test_compact_preserves_sketch_and_first_batch_crash(spark, tmp_path):
    _src, state, _ckpt = _run_stream(spark, tmp_path, "d")
    before = read_theta(spark, state, K).collect()[0]
    compact_theta(spark, state, K)
    parts = {d for d in os.listdir(state) if d.startswith("batch_id=")}
    assert parts == {"batch_id=0"}
    after = read_theta(spark, state, K).collect()[0]
    assert before.hs == after.hs
    # first-batch-crash shape: a state dir with no committed parquet
    # files must read as an empty sketch, not raise
    empty = str(tmp_path / "state_empty")
    os.makedirs(os.path.join(empty, "batch_id=0"))
    r = read_theta(spark, empty, K).collect()[0]
    assert r.nd == 0 and r.hs == []
