"""Checkpoint/lineage resume + Iceberg-shaped layout round trip."""

import json
import os

import pytest
from pyspark.sql import functions as F

from gregor_spark.plans.checkpoint import CheckpointedRun
from gregor_spark.sources.iceberg_like import read_manifest, read_table, write_table


def test_iceberg_like_roundtrip(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    path = str(tmp_path / "tbl")
    man = write_table(df, path, bucket_by="k", n_buckets=8)
    assert man["total_rows"] == 1000
    assert len(man["bucket_rows"]) == 8
    back = read_table(spark, path)
    assert back.count() == 1000
    assert read_manifest(path)["partition_spec"]["bucket_by"] == "k"
    # bucket column usable for pruning
    assert back.filter(F.col("bucket") == 3).count() == man["bucket_rows"]["3"]


def test_checkpoint_resume_skips_done_stages(spark, tmp_path):
    root = str(tmp_path / "run")
    calls = {"a": 0, "b": 0}

    def build_a():
        calls["a"] += 1
        return spark.range(100).select(F.col("id").alias("x"))

    run = CheckpointedRun(spark, root)
    out_a = run.run_stage("a", build_a)
    assert out_a.count() == 100
    assert calls["a"] == 1

    def build_b():
        calls["b"] += 1
        prev = spark.read.parquet(os.path.join(root, "a", "data"))
        return prev.withColumn("y", F.col("x") * 2)

    out_b = run.run_stage("b", build_b)
    assert out_b.count() == 100
    # fresh driver (new CheckpointedRun): both stages resume from disk
    run2 = CheckpointedRun(spark, root)
    a2 = run2.run_stage("a", build_a)
    b2 = run2.run_stage("b", build_b)
    assert calls == {"a": 1, "b": 1}  # builders never re-invoked
    assert a2.count() == 100 and b2.count() == 100
    # lineage: per-partition counts sum to the row count
    m = run2.stage_manifest("a")
    assert sum(m["partition_rows"].values()) == m["rows"] == 100
    metrics = run2.metrics()
    assert set(metrics) == {"a", "b"}
    assert all("wall_sec" in v for v in metrics.values())
