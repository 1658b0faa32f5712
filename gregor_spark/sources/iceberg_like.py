"""Iceberg-shaped table layout on plain parquet.

No Iceberg runtime jars are assumed in this environment (SURVEY.md §7),
so the engine writes/reads an Iceberg-*shaped* layout behind one function
pair: hash-bucketed parquet directories plus a JSON manifest carrying the
schema, partition spec, per-bucket row counts and a snapshot id.  On a
cluster with Iceberg jars, swap these two functions for
``df.writeTo(...).using("iceberg")`` / ``spark.table`` — callers don't
change.

Bucketing by a stable key hash gives the co-location properties the
engine relies on: a later join/groupBy on the bucket key can avoid a
full shuffle, and per-bucket counts give the resume/lineage layer its
units of work (plans/checkpoint.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_gregor_manifest.json"


def write_table(
    df: DataFrame,
    path: str,
    bucket_by: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` hash-bucketed by ``bucket_by`` with a manifest."""
    out = df.withColumn("bucket", F.pmod(F.hash(F.col(bucket_by)), F.lit(n_buckets)))
    out.write.mode(mode).partitionBy("bucket").parquet(path)
    spark = df.sparkSession
    counts = {
        str(r["bucket"]): r["n"]
        for r in spark.read.parquet(path)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest = {
        "format": "gregor-iceberg-like/1",
        "snapshot_id": int(time.time() * 1000),
        "schema": df.schema.jsonValue(),
        "partition_spec": {"bucket_by": bucket_by, "n_buckets": n_buckets},
        "bucket_rows": counts,
        "total_rows": sum(counts.values()),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read a table written by ``write_table`` (drops the bucket column;
    Catalyst still prunes on it when callers filter by bucket)."""
    return spark.read.parquet(path)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
