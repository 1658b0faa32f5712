"""Streaming distinct-count: continuous-ingest shape of
``ops.sketch.hll_distinct``.

Micro-batches of documents land continuously; the pipeline must answer
"how many distinct X so far (per group)" at any moment without ever
re-scanning history.  HLL registers are the textbook state for this —
tiny (≤ groups × 2^p rows), mergeable by groupBy-max, and insensitive
to duplicate delivery (max is idempotent), which makes the streaming
protocol radically simpler than dedup_stream's:

Per micro-batch (``foreachBatch``):
  1. sketch THIS batch alone — ``hll_registers(batch)`` (map + bounded
     partial-agg; no read of prior state, batches are independent)
  2. OVERWRITE ``{state}/batch_id=N`` with the batch's registers

Estimate time (``hll_stream_estimate``): read every committed batch
partition with an EXPLICIT schema (first-batch-crash recovery — an
existing dir holding only uncommitted ``_temporary`` files must read as
an empty sketch, the dedup_stream lesson), groupBy-max merge, then the
standard estimator.  At-least-once replay is free here: a replayed
batch overwrites its own partition with identical content, and even a
DOUBLE-counted batch cannot move the registers (max of a set with
itself).  ``compact_registers`` folds all batch partitions into one
(state stays O(groups × 2^p) forever instead of O(batches)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.sketch import hll_estimate_from_registers, hll_registers

_BASE = "bucket int, rho int"


def _read_schema(by_schema: str | None) -> str:
    # batch_id comes from directory names; declaring it in the explicit
    # schema keeps the read working when no committed files exist yet
    prefix = f"{by_schema}, " if by_schema else ""
    return f"{prefix}{_BASE}, batch_id int"


def read_registers(
    spark: SparkSession,
    state_dir: str,
    by: list[str] | None = None,
    by_schema: str | None = None,
) -> DataFrame:
    """Merged register table across all committed batch partitions.
    ``by_schema`` must declare the group columns (e.g. ``"lang string"``)
    when ``by`` is used — explicit schemas are the crash-recovery
    contract, never inference."""
    if by and not by_schema:
        raise ValueError("by_schema is required when grouping columns are used")
    schema = _read_schema(by_schema)
    if not os.path.isdir(state_dir):
        return spark.createDataFrame([], schema).drop("batch_id")
    raw = spark.read.schema(schema).parquet(state_dir).drop("batch_id")
    return raw.groupBy(*(by or []), "bucket").agg(F.max("rho").alias("rho"))


def hll_stream_estimate(
    spark: SparkSession,
    state_dir: str,
    p: int = 9,
    by: list[str] | None = None,
    by_schema: str | None = None,
) -> DataFrame:
    """(``*by``, occupied, zeros, s_int, est_r) over everything ingested
    so far — identical to batch ``hll_distinct`` on the union of all
    batches (register merge is exact, pytest-asserted)."""
    return hll_estimate_from_registers(
        read_registers(spark, state_dir, by, by_schema), p, by
    )


def compact_registers(
    spark: SparkSession,
    state_dir: str,
    by: list[str] | None = None,
    by_schema: str | None = None,
) -> None:
    """Fold all batch partitions into ``batch_id=0`` and drop the rest.
    Safe to run between (not during) stream restarts: estimates are
    unchanged because merge is associative/idempotent."""
    import shutil

    merged = read_registers(spark, state_dir, by, by_schema)
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


def start_hll_stream(
    spark: SparkSession,
    input_dir: str,
    input_schema: str,
    state_dir: str,
    checkpoint_dir: str,
    col: str,
    p: int = 9,
    by: list[str] | None = None,
    max_files_per_trigger: int = 1,
):
    """File-source stream -> per-batch register sketch -> partitioned
    state dir.  Returns the StreamingQuery (caller awaits/stops)."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        regs = hll_registers(batch, col, p, by)
        regs.write.mode("overwrite").parquet(
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
