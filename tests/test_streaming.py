"""Structured Streaming tile pipeline: file-source stream == batch result."""

import pytest
from pyspark.sql import functions as F

from gregor_spark.model import fixtures as FX
from gregor_spark.model.zones import ZoneSet
from gregor_spark.operators.spatial_join import spatial_hash_join, with_cell_id
from gregor_spark.operators.tiles import extract_geo_points
from gregor_spark.sources.documents import generate_documents
from gregor_spark.streaming.tiles_stream import read_documents_stream, tile_counts_stream

BOUNDS = (-0.25, 9.75, 1.75, 11.75)
RES = 5


def test_stream_matches_batch(spark, tmp_path):
    docs = generate_documents(spark, 1500, BOUNDS, seed=9).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00"))
        + F.make_interval(secs=F.pmod(F.xxhash64("doc_id"), F.lit(600))),
    )
    src = str(tmp_path / "stream_src")
    docs.write.parquet(src)
    zones = ZoneSet.from_fixture(FX.SEG_2X2)

    stream = read_documents_stream(spark, src, max_files_per_trigger=2)
    counts = tile_counts_stream(stream, RES, BOUNDS, zones=zones, window="2 minutes")
    q = (
        counts.writeStream.format("memory")
        .queryName("tile_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"], r["cell_id"], r["zone_id"]): r["n_spans"]
        for r in spark.sql("SELECT * FROM tile_counts").collect()
    }
    assert got

    # batch reference computation over the same files
    batch_docs = spark.read.parquet(src)
    pts = extract_geo_points(batch_docs.select("doc_id", "spans"))
    ts = batch_docs.select("doc_id", "ts")
    assigned = spatial_hash_join(
        pts, zones, RES, BOUNDS, x="lon", y="lat", keep_unassigned=True,
        broadcast_cover=True,
    ).join(ts, "doc_id")
    want = {
        (r["win"]["start"], r["cell_id"], r["zone_id"]): r["n_spans"]
        for r in assigned.groupBy(
            F.window("ts", "2 minutes").alias("win"), "cell_id", "zone_id"
        )
        .agg(F.count(F.lit(1)).alias("n_spans"))
        .collect()
    }
    assert got == want
