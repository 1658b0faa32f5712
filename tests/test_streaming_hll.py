"""Streaming HLL: the foreachBatch register loop must equal batch
``hll_distinct`` on the union of all batches; state survives restart,
replay, compaction, and a first-batch crash."""

import os
import time

from pyspark.sql import functions as F

from gregor_spark.ops.sketch import hll_distinct
from gregor_spark.streaming.hll_stream import (
    compact_registers,
    hll_stream_estimate,
    read_registers,
    start_hll_stream,
)

SCHEMA = "doc_id long, lang string, text string"


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
    def mk(lo, hi, lang):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.lit(lang).alias("lang"),
            F.concat(F.lit("tok"), (F.col("id") % 400).cast("string")).alias("text"),
        )

    return [mk(0, 300, "en"), mk(200, 600, "en"), mk(0, 150, "fr")]


def _run_stream(spark, tmp_path, tag="a"):
    src = str(tmp_path / f"src_{tag}")
    for i, b in enumerate(_batches(spark)):
        _write_slice(b, src, i)
    state = str(tmp_path / f"state_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    q = start_hll_stream(
        spark, src, SCHEMA, state, ckpt, col="text", by=["lang"]
    )
    q.awaitTermination(300)
    return src, state, ckpt


def test_stream_estimate_equals_batch_union(spark, tmp_path):
    _src, state, _ckpt = _run_stream(spark, tmp_path)
    got = {
        r.lang: (r.occupied, r.zeros, r.s_int, r.est_r)
        for r in hll_stream_estimate(
            spark, state, by=["lang"], by_schema="lang string"
        ).collect()
    }
    union = _batches(spark)[0]
    for b in _batches(spark)[1:]:
        union = union.unionByName(b)
    want = {
        r.lang: (r.occupied, r.zeros, r.s_int, r.est_r)
        for r in hll_distinct(union, "text", by=["lang"]).collect()
    }
    assert got == want and set(got) == {"en", "fr"}


def test_restart_resumes_without_recount(spark, tmp_path):
    src, state, ckpt = _run_stream(spark, tmp_path, "b")
    before = hll_stream_estimate(
        spark, state, by=["lang"], by_schema="lang string"
    ).collect()
    # late batch arrives; restart with the same checkpoint processes ONLY it
    late = spark.range(1000, 1100).select(
        F.col("id").alias("doc_id"),
        F.lit("de").alias("lang"),
        F.concat(F.lit("neu"), F.col("id").cast("string")).alias("text"),
    )
    _write_slice(late, src, 9)
    q = start_hll_stream(spark, src, SCHEMA, state, ckpt, col="text", by=["lang"])
    q.awaitTermination(300)
    after = {
        r.lang: r.est_r
        for r in hll_stream_estimate(
            spark, state, by=["lang"], by_schema="lang string"
        ).collect()
    }
    # en/fr unchanged (their batches were not replayed), de appeared
    for r in before:
        assert after[r.lang] == r.est_r
    assert "de" in after and abs(after["de"] - 100) < 20
    # only one new batch partition was written
    parts = {d for d in os.listdir(state) if d.startswith("batch_id=")}
    assert len(parts) == 4


def test_replayed_batch_is_idempotent(spark, tmp_path):
    _src, state, _ckpt = _run_stream(spark, tmp_path, "c")
    merged_before = hll_stream_estimate(
        spark, state, by=["lang"], by_schema="lang string"
    ).collect()
    # simulate an at-least-once redelivery: re-sketch batch 0's data into
    # its own partition again (overwrite with identical content)
    from gregor_spark.ops.sketch import hll_registers

    hll_registers(_batches(spark)[0], "text", by=["lang"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(state, "batch_id=0"))
    merged_after = hll_stream_estimate(
        spark, state, by=["lang"], by_schema="lang string"
    ).collect()
    assert sorted(map(tuple, merged_before)) == sorted(map(tuple, merged_after))


def test_compact_preserves_estimates(spark, tmp_path):
    _src, state, _ckpt = _run_stream(spark, tmp_path, "d")
    before = sorted(
        map(
            tuple,
            hll_stream_estimate(
                spark, state, by=["lang"], by_schema="lang string"
            ).collect(),
        )
    )
    compact_registers(spark, state, by=["lang"], by_schema="lang string")
    parts = {d for d in os.listdir(state) if d.startswith("batch_id=")}
    assert parts == {"batch_id=0"}
    after = sorted(
        map(
            tuple,
            hll_stream_estimate(
                spark, state, by=["lang"], by_schema="lang string"
            ).collect(),
        )
    )
    assert before == after


def test_first_batch_crash_reads_as_empty(spark, tmp_path):
    # dir exists but holds only an uncommitted temporary file — the
    # explicit-schema read must return an empty sketch, not throw
    state = str(tmp_path / "state_crash")
    os.makedirs(os.path.join(state, "_temporary", "0"), exist_ok=True)
    regs = read_registers(spark, state, by=["lang"], by_schema="lang string")
    assert regs.count() == 0
    est = hll_stream_estimate(spark, state, by=["lang"], by_schema="lang string")
    assert est.count() == 0
