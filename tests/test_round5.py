"""Round-5 regression tests: ADVICE fixes (streaming first-batch crash,
CLI CRS sentinel, GeoTIFF CRS honesty, GeoJSON error contract, driver
window membership) and the round-5 operator work (star-edge clustering
default, auto pointer-jumping, expire_snapshots, compressed/tiled
GeoTIFF, PNG decode, as-of dup-ts contract row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _decisions_map(spark, dec_path):
    return {
        r["doc_id"]: (r["keep"], r["dup_of"])
        for r in spark.read.parquet(dec_path).collect()
    }


def test_dedup_stream_first_batch_crash_recovers(spark, tmp_path):
    """ADVICE r4 (medium): if the FIRST micro-batch crashes during its
    index write, the index dir exists but holds only uncommitted
    _temporary files.  The replay's read_index must treat that state as
    an empty index (explicit read schema — a schema-less read throws
    UNABLE_TO_INFER_SCHEMA before process_batch can overwrite, wedging
    the stream permanently)."""
    from gregor_spark.streaming.dedup_stream import process_batch, read_index

    index_path = tmp_path / "index"
    dec_path = str(tmp_path / "decisions")
    # the crash state: partition dir exists, only uncommitted temp output
    tmp_dir = index_path / "batch_id=0" / "_temporary" / "0"
    tmp_dir.mkdir(parents=True)
    (tmp_dir / "task_000.parquet").write_bytes(b"half-written attempt")
    assert read_index(spark, str(index_path)).count() == 0
    # and the replayed batch completes normally from that state
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # dup of 1
        ],
        "doc_id long, text string",
    )
    process_batch(batch, 0, str(index_path), dec_path)
    assert _decisions_map(spark, dec_path) == {1: (True, None), 2: (False, 1)}


def test_read_index_corrupt_committed_file_still_raises(spark, tmp_path):
    """The explicit-schema read must not swallow real errors: a corrupt
    COMMITTED data file (non-hidden, inside a batch partition) raises."""
    from gregor_spark.streaming.dedup_stream import read_index

    bad = tmp_path / "index" / "batch_id=0"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception):
        read_index(spark, str(tmp_path / "index")).collect()
