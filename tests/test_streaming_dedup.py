"""Streaming incremental dedup: the foreachBatch loop must produce the
SAME decisions as folding the shards sequentially through the batch
operator — shard boundaries = micro-batches, earlier shards win."""

import os
import time

from pyspark.sql import functions as F


def _write_slice(df, src, seq):
    """One parquet file per slice, mtime-ordered so the file stream
    processes slices in sequence (maxFilesPerTrigger=1)."""

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


SHARDS = [
    [(0, "alpha beta gamma delta epsilon zeta eta theta"),
     (1, "one two three four five six seven eight")],
    [(2, "alpha beta gamma delta epsilon zeta eta theta"),   # dup of 0
     (3, "fresh novel words appearing here for the first time"),
     (4, "fresh novel words appearing here for the first time")],  # dup of 3
    [(0, "alpha beta gamma delta epsilon zeta eta theta"),   # re-ingestion
     (5, "one two three four five six seven eight"),          # dup of 1
     (6, "completely different final content closing the run")],
]


def _batch_replay(spark):
    """Ground truth: fold the shards through the batch operator."""
    from gregor_spark.ops.dedup import dedup_incremental
    from gregor_spark.streaming.dedup_stream import _empty_index, index_rows_for

    index = _empty_index(spark)
    decisions = {}
    for rows in SHARDS:
        shard = spark.createDataFrame(rows, "doc_id long, text string")
        dec = dedup_incremental(shard, index).localCheckpoint(eager=True)
        for r in dec.collect():
            decisions[r["doc_id"]] = (r["keep"], r["dup_of"])
        kept = shard.join(dec.filter("keep").select("doc_id"), "doc_id")
        index = index.unionByName(index_rows_for(kept)).localCheckpoint(eager=True)
    return decisions


def test_dedup_stream_matches_batch_fold(spark, tmp_path):
    from gregor_spark.streaming.dedup_stream import (
        dedup_stream,
        read_doc_text_stream,
    )

    src = str(tmp_path / "src")
    for i, rows in enumerate(SHARDS):
        _write_slice(
            spark.createDataFrame(rows, "doc_id long, text string"), src, i
        )
    index_path = str(tmp_path / "index")
    dec_path = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    stream = read_doc_text_stream(spark, src, max_files_per_trigger=1)
    q = dedup_stream(stream, index_path, dec_path, ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)

    got_rows = spark.read.parquet(dec_path).collect()
    # the re-ingested doc 0 appears twice (batch 0 keep, batch 2 drop):
    # keep the LAST batch's decision per doc for comparison with the fold,
    # where the fold's dict update does the same
    got = {}
    for r in sorted(got_rows, key=lambda r: r["batch_id"]):
        got[r["doc_id"]] = (r["keep"], r["dup_of"])
    expected = _batch_replay(spark)
    assert got == expected
    # spot-check the semantics
    assert got[2] == (False, 0)      # cross-shard near-dup
    assert got[4] == (False, 3)      # intra-shard dup
    assert got[0] == (False, 0)      # re-ingestion in shard 3
    assert got[5] == (False, 1)      # dup of shard-1 doc
    assert got[3] == (True, None) and got[6] == (True, None)
    # three micro-batches processed (one per slice file)
    assert {r["batch_id"] for r in got_rows} == {0, 1, 2}


def test_dedup_stream_restart_resumes(spark, tmp_path):
    """Kill the stream after the first shard, restart with the same
    checkpoint: already-processed shards are not reprocessed, and new
    shards dedup against the index the first run built."""
    from gregor_spark.streaming.dedup_stream import (
        dedup_stream,
        read_doc_text_stream,
    )

    src = str(tmp_path / "src")
    _write_slice(
        spark.createDataFrame(SHARDS[0], "doc_id long, text string"), src, 0
    )
    index_path = str(tmp_path / "index")
    dec_path = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    stream = read_doc_text_stream(spark, src, max_files_per_trigger=1)
    q = dedup_stream(stream, index_path, dec_path, ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(300)
    n_first = spark.read.parquet(dec_path).count()
    assert n_first == 2

    for i, rows in enumerate(SHARDS[1:], start=1):
        _write_slice(
            spark.createDataFrame(rows, "doc_id long, text string"), src, i
        )
    stream2 = read_doc_text_stream(spark, src, max_files_per_trigger=1)
    q2 = dedup_stream(stream2, index_path, dec_path, ckpt).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination(300)
    rows = spark.read.parquet(dec_path).collect()
    # shard 0's two decisions exist exactly once (not reprocessed)
    assert sum(1 for r in rows if r["doc_id"] in (0, 1) and r["batch_id"] == 0) == 2
    got = {r["doc_id"]: (r["keep"], r["dup_of"])
           for r in sorted(rows, key=lambda r: r["batch_id"])}
    assert got[2] == (False, 0) and got[5] == (False, 1)
