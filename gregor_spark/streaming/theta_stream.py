"""Streaming theta/KMV sketch: continuous-ingest shape of
``ops.sketch.theta_sketch`` — distinct counts AND set-expression
estimates (union/intersection vs other sketches) over everything
ingested so far, without re-scanning history.

Same protocol as ``hll_stream`` (which inherited the dedup_stream
crash lessons):

Per micro-batch (``foreachBatch``):
  1. sketch THIS batch alone — its bottom-``k`` distinct hashes
     (TakeOrdered, no prior-state read; batches are independent)
  2. OVERWRITE ``{state}/batch_id=N`` with those ≤ k rows

Estimate time: read every committed batch partition with an EXPLICIT
schema (a dir holding only uncommitted ``_temporary`` files must read
as an empty sketch), distinct + bottom-k merge, then the KMV
estimator.  At-least-once replay is free: a replayed batch overwrites
its own partition with identical content, and bottom-k of a multiset
equals bottom-k of its support — duplicate delivery cannot move the
sketch.  ``compact_theta`` folds all partitions into one, so state is
O(k) forever instead of O(batches × k).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.sketch import _hash60, theta_estimate

_SCHEMA = "h long, batch_id int"


def read_theta(spark: SparkSession, state_dir: str, k: int = 64) -> DataFrame:
    """One row (``hs`` sorted array<long>, ``nd``) merging all committed
    batch sketches — identical to a batch ``theta_sketch`` over the
    union of everything ingested (bottom-k merge is exact)."""
    if not os.path.isdir(state_dir):
        d = spark.createDataFrame([], "h long")
    else:
        d = spark.read.schema(_SCHEMA).parquet(state_dir).select("h")
    top = d.distinct().orderBy("h").limit(k)
    return top.agg(
        F.array_sort(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).alias("nd"),
    )


def theta_stream_estimate(
    spark: SparkSession, state_dir: str, k: int = 64
) -> DataFrame:
    """One row: ``nd`` and the KMV distinct estimate ``n_est`` over the
    full ingest history."""
    return read_theta(spark, state_dir, k).select(
        "nd", F.round(theta_estimate(F.col("hs"), k), 6).alias("n_est")
    )


def compact_theta(spark: SparkSession, state_dir: str, k: int = 64) -> None:
    """Fold all batch partitions into ``batch_id=0``; estimates are
    unchanged (bottom-k merge is associative and idempotent).  Run
    between stream restarts, like ``compact_registers``."""
    import shutil

    merged = read_theta(spark, state_dir, k).select(
        F.explode("hs").alias("h")
    )
    tmp = state_dir.rstrip("/") + "._compact_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    back = spark.read.parquet(tmp)
    final = state_dir.rstrip("/") + "._compact_new"
    back.write.mode("overwrite").parquet(os.path.join(final, "batch_id=0"))
    old = state_dir.rstrip("/") + "._compact_old"
    os.rename(state_dir, old)
    os.rename(final, state_dir)
    shutil.rmtree(old)
    shutil.rmtree(tmp)


def start_theta_stream(
    spark: SparkSession,
    input_dir: str,
    input_schema: str,
    state_dir: str,
    checkpoint_dir: str,
    col: str,
    k: int = 64,
    max_files_per_trigger: int = 1,
):
    """File-source stream -> per-batch bottom-k sketch -> partitioned
    state dir.  Returns the StreamingQuery (caller awaits/stops)."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        h = _hash60(F.col(col).cast("string"))
        top = batch.select(h.alias("h")).distinct().orderBy("h").limit(k)
        top.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={batch_id}")
        )

    reader = (
        spark.readStream.schema(input_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
