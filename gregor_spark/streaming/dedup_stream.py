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

Per micro-batch (``process_batch``):
  1. read the index EXCLUDING this batch's own partition (so a replayed
     half-written attempt never sees its own rows)
  2. run ``dedup_incremental(batch, index)`` — band equi-joins against
     the persisted signature index (see ops/dedup.py for the scale shape)
  3. OVERWRITE ``{decisions}/batch_id=N`` with the per-doc keep/drop
     decisions, then OVERWRITE ``{index}/batch_id=N`` with the kept
     docs' band rows (plus id-marker rows)

Crash safety — the writes are idempotent per batch, not append-only:
Structured Streaming only commits the batch to its checkpoint AFTER
``process_batch`` returns, so a crash at ANY point replays the whole
batch.  Because the replay excludes its own index partition, it
recomputes against exactly the pre-crash state and overwrites both
partitions with identical content.  (The previous append-based protocol
had a real hole: a crash between the index append and the decisions
append made the replay see its own bands, flag every kept doc as
re-ingested, and log keep=false/dup_of=itself with no keep=true row ever
written — silently dropping the doc from the kept output.  Pinned in
tests/test_round4.py::test_dedup_stream_replay_after_index_write.)

Ordering: within a batch the smaller-id-wins rule applies (deterministic
regardless of file arrival interleaving inside the batch); across
batches, earlier-batch keeps win by construction — the same semantics a
re-run of the whole history through the batch operator produces, asserted
in tests/test_streaming_dedup.py.

Both sinks are parquet directories partitioned by ``batch_id=N`` (plain
directory-per-batch; Spark's partition discovery surfaces ``batch_id``
as a column on read).  On a real cluster the same loop writes through
``sources.iceberg_like`` layouts — band-key-bucketed appends keep the
per-shard delta join co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..ops.dedup import dedup_incremental, minhash_bands

INDEX_SCHEMA = "doc_id long, band long, band_key string"

# the on-disk index read schema: INDEX_SCHEMA plus the batch_id partition
# column (from the directory names).  Reading with an EXPLICIT schema is
# load-bearing for crash recovery: if the FIRST micro-batch crashes during
# its index write, the index dir exists but holds only uncommitted
# ``_temporary`` files, and a schema-less ``spark.read.parquet`` throws
# UNABLE_TO_INFER_SCHEMA on replay — before process_batch can overwrite —
# so the stream could never recover without manual cleanup.  With the
# schema pinned, the committed-files-empty state reads as an empty index
# (Spark ignores ``_``/``.``-prefixed dirs) while real read errors on
# committed files still propagate.  Pinned in
# tests/test_round5.py::test_dedup_stream_first_batch_crash_recovers.
_INDEX_READ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.LongType()),
        T.StructField("band_key", T.StringType()),
        T.StructField("batch_id", T.LongType()),
    ]
)


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


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Explicit filesystem existence probe through the Hadoop FS API (works
    for any Hadoop-supported scheme, not just local paths).  Replaces the
    old bare ``except Exception`` around the index read, which treated ANY
    failure — corrupt files, transient IO, schema drift — as "index does
    not exist yet" and silently deduped against an empty index."""
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def read_index(
    spark: SparkSession, index_path: str, exclude_batch: int | None = None
) -> DataFrame:
    """The signature index as (doc_id, band, band_key), optionally
    excluding one ``batch_id=N`` partition (a replaying micro-batch must
    not see its own half-written rows).  A missing directory is an empty
    index; genuine read errors propagate and fail the micro-batch."""
    if not _fs_exists(spark, index_path):
        return _empty_index(spark)
    raw = spark.read.schema(_INDEX_READ_SCHEMA).parquet(index_path)
    if exclude_batch is not None:
        # null-safe: a row outside any batch_id= dir (batch_id NULL) is
        # never this batch's own data — keep it rather than drop it
        raw = raw.filter(~F.col("batch_id").eqNullSafe(F.lit(exclude_batch)))
    return raw.select("doc_id", "band", "band_key")


def index_rows_for(docs: DataFrame) -> DataFrame:
    """Band rows plus an id-marker row per doc (band = -1, NULL band_key —
    never joins a band key, but keeps the doc's id visible to the
    re-ingestion rule independently of its signature; every doc does
    carry bands — see ops.dedup.minhash_bands short-doc semantics — so
    the marker is belt-and-braces, not the only trace of short docs)."""
    return minhash_bands(docs).unionByName(
        docs.select(
            "doc_id",
            F.lit(-1).cast("long").alias("band"),
            F.lit(None).cast("string").alias("band_key"),
        )
    )


def process_batch(
    batch: DataFrame, batch_id: int, index_path: str, decisions_path: str
) -> None:
    """One idempotent micro-batch of the dedup loop (see module docstring
    for the crash-safety argument).  Module-level so tests can replay a
    batch directly without driving a stream."""
    spark = batch.sparkSession
    index = read_index(spark, index_path, exclude_batch=batch_id)
    # the batch plan re-executes per consumer below — pin it
    batch = batch.localCheckpoint(eager=True)
    decisions = dedup_incremental(batch, index).localCheckpoint(eager=True)
    kept = batch.join(decisions.filter("keep").select("doc_id"), "doc_id")
    # decisions FIRST: if the index write below crashes, the keep=true
    # records are already durable; the replay regenerates both anyway
    decisions.write.mode("overwrite").parquet(
        f"{decisions_path}/batch_id={batch_id}"
    )
    index_rows_for(kept).write.mode("overwrite").parquet(
        f"{index_path}/batch_id={batch_id}"
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
    safe at any crash point — see ``process_batch``.
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        process_batch(batch, batch_id, index_path, decisions_path)

    return (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
