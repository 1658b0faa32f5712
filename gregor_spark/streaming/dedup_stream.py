"""Streaming incremental dedup — continuous-ingest shape of
``ops.dedup.dedup_incremental``.

The reference has no streaming surface (SURVEY.md §1); the 100 TB
pipeline this engine targets does: document shards land continuously and
each must be deduped against everything ingested before it.  The
idiomatic Structured Streaming construct here is ``foreachBatch``: a
stream-static join alone cannot express "... and then MERGE the kept
docs into the static side", while foreachBatch gives each micro-batch
(= one shard) the full batch operator plus an index append, with Spark's
checkpointing making the loop restartable exactly at a shard boundary.

Per micro-batch:
  1. run ``dedup_incremental(batch, index)`` — band equi-joins against
     the persisted signature index (see ops/dedup.py for the scale shape)
  2. append the kept docs' band rows (plus id-marker rows for docs too
     short to signature) to the index
  3. append the per-doc keep/drop decisions to the output log

Ordering: within a batch the smaller-id-wins rule applies (deterministic
regardless of file arrival interleaving inside the batch); across
batches, earlier-batch keeps win by construction — the same semantics a
re-run of the whole history through the batch operator produces, asserted
in tests/test_streaming_dedup.py.

The index is a plain parquet directory here (appends are atomic at file
granularity; the micro-batch is the unit of visibility).  On a real
cluster the same loop writes through ``sources.iceberg_like`` layouts —
band-key-bucketed appends keep the per-shard delta join co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ops.dedup import dedup_incremental, minhash_bands

INDEX_SCHEMA = "doc_id long, band long, band_key string"


def doc_text_stream_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )


def read_doc_text_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of (doc_id, text) parquet."""
    reader = spark.readStream.schema(doc_text_stream_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _empty_index(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], INDEX_SCHEMA)


def index_rows_for(docs: DataFrame) -> DataFrame:
    """Band rows plus an id-marker row per doc (band = -1, NULL band_key —
    never joins a band key, but keeps the doc's id visible to the
    re-ingestion rule even when the doc is too short to shingle)."""
    return minhash_bands(docs).unionByName(
        docs.select(
            "doc_id",
            F.lit(-1).cast("long").alias("band"),
            F.lit(None).cast("string").alias("band_key"),
        )
    )


def dedup_stream(
    stream_docs: DataFrame,
    index_path: str,
    decisions_path: str,
    checkpoint_path: str,
):
    """Wire a (doc_id, text) stream into the incremental-dedup loop.

    Returns the ``DataStreamWriter`` (caller starts/stops it).  One
    micro-batch = one shard; restarts resume at the last completed shard
    via the stream checkpoint, and re-processing a half-written batch is
    safe: decisions are keyed by doc_id and re-ingested docs drop.
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        try:
            index = spark.read.schema(INDEX_SCHEMA).parquet(index_path)
        except Exception:
            index = _empty_index(spark)
        # the batch plan re-executes per consumer below — pin it
        batch = batch.localCheckpoint(eager=True)
        decisions = dedup_incremental(batch, index).localCheckpoint(eager=True)
        kept = batch.join(decisions.filter("keep").select("doc_id"), "doc_id")
        index_rows_for(kept).write.mode("append").parquet(index_path)
        decisions.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(decisions_path)

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
