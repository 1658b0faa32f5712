"""Physical-plan assertions — the optimizer behavior the engine relies on
must hold, not just be hoped for (task brief: `.explain` and iterate).

* bbox clip predicates reach the parquet scan (PushedFilters);
* column pruning keeps unused columns out of ReadSchema;
* norm/zone joins in disaggregation go broadcast (no fact shuffle);
* the broadcast assignment path contains NO Exchange at all (map-only);
* Morton encode runs inside WholeStageCodegen (no BatchEvalPython).
"""

import re

import pytest
from pyspark.sql import functions as F

from gregor_spark.model import fixtures as FX
from gregor_spark.model.raster import RasterMeta, clip_bbox, raster_df
from gregor_spark.model.zones import ZoneSet
from gregor_spark.operators.spatial_join import spatial_hash_join, with_cell_id

BOUNDS = (-0.25, 9.75, 1.75, 11.75)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _formatted(df) -> str:
    from io import StringIO
    import contextlib

    buf = StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def parquet_cells(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "cells.parquet")
    raster_df(spark, RasterMeta(**FX.RASTER_META), FX.RASTER_VALUES).write.parquet(p)
    return spark.read.parquet(p)


def test_clip_pushes_down_to_scan(spark, parquet_cells):
    plan = _formatted(clip_bbox(parquet_cells, 0.0, 10.0, 1.0, 11.0))
    assert "PushedFilters" in plan
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(x,", plan), plan


def test_column_pruning(spark, parquet_cells):
    plan = _formatted(parquet_cells.select("row", "col"))
    m = re.search(r"ReadSchema: ([^\n]+)", plan)
    assert m and "value" not in m.group(1), plan


def test_disaggregation_joins_are_broadcast(spark, parquet_cells):
    from gregor_spark.operators.disaggregate import disaggregate_polygon_to_raster

    zones = ZoneSet.from_fixture(FX.SEG_2X2, values={z: 2.0 for z in range(4)})
    plan = _formatted(disaggregate_polygon_to_raster(zones, parquet_cells))
    assert "BroadcastHashJoin" in plan
    # the fact side must never sort-merge: no SortMergeJoin anywhere
    assert "SortMergeJoin" not in plan, plan


def test_broadcast_assignment_is_map_only(spark, parquet_cells):
    zones = ZoneSet.from_fixture(FX.SEG_2X2)
    assigned = spatial_hash_join(
        parquet_cells, zones, 6, BOUNDS, broadcast_cover=True, keep_unassigned=True
    )
    plan = _formatted(assigned)
    # zero shuffle: the whole assignment is scan -> project -> eval python
    assert "Exchange" not in plan, plan


def test_morton_encode_is_codegen(spark, parquet_cells):
    plan = _formatted(with_cell_id(parquet_cells, 8, BOUNDS))
    assert "codegen id" in plan, plan  # encode runs inside a codegen stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_tile_decode_and_neighbors_are_codegen(spark, parquet_cells):
    """Tile decode + 3x3 neighbor generation are pure column bit-ops: no
    Python eval anywhere (round 1 paid two scalar UDFs for the decode; a
    naive decode→re-encode neighbor expression fell out of codegen
    entirely)."""
    from gregor_spark.operators.spatial_join import cell_tile_cols, neighbor_cells_col

    keyed = with_cell_id(parquet_cells, 8, BOUNDS)
    tx, ty = cell_tile_cols(F.col("cell_id"))
    plan = _formatted(
        keyed.select(
            tx.alias("tx"), ty.alias("ty"),
            F.explode(neighbor_cells_col(F.col("cell_id"), 8)).alias("nc"),
        )
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "codegen id" in plan, plan


def test_simhash_fast_single_shuffle(spark):
    """simhash_fast moves O(docs) rows through exactly one Exchange (the
    groupBy with map-side combine) plus the broadcast join back."""
    from gregor_spark.ops.dedup import simhash_fast

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f")], "doc_id long, text string"
    )
    plan = _formatted(simhash_fast(docs))
    # hashAggregate pairs (partial + final) around a single shuffle
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_cell_partitioned_scan_prunes_partitions(spark, tmp_path):
    """A bbox read over the tile-partitioned layout reaches the scan as a
    PartitionFilter (files outside the box are never opened) AND keeps the
    coordinate predicate as a pushed data filter — the SURVEY §4
    'tile-partitioned cells -> scan-level pruning' property, asserted."""
    from gregor_spark.sources.iceberg_like import (
        read_cell_partitioned,
        write_cell_partitioned,
    )

    pts = spark.range(2000).select(
        F.col("id"),
        (F.rand(11) * 2 - 0.25).alias("x"),
        (F.rand(12) * 2 + 9.75).alias("y"),
    )
    path = str(tmp_path / "cellpart")
    write_cell_partitioned(pts, path, res=8, parent_res=2, bounds=BOUNDS)
    clipped = read_cell_partitioned(spark, path, bbox=(0.0, 10.0, 0.4, 10.4))
    plan = _formatted(clipped)
    assert re.search(r"PartitionFilters: \[.*p_cell", plan), plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(x," in plan, plan
    # correctness: same rows as a plain filter over the unpartitioned data
    want = pts.filter(
        (F.col("x") >= 0.0) & (F.col("x") <= 0.4)
        & (F.col("y") >= 10.0) & (F.col("y") <= 10.4)
    ).count()
    assert clipped.count() == want


def test_near_dup_blocked_has_no_driver_collect_shape(spark):
    """The exact near-dup sweep is a cogroup plan (FlatMapCoGroupsInPandas)
    over broadcast block-pair joins — the corpus never reaches the driver
    (round 1 collected the full matrix into the UDF closure)."""
    from gregor_spark.ops.similarity import near_dup_pairs

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])], "vec_id long, embedding array<double>"
    )
    plan = _formatted(near_dup_pairs(emb, threshold=0.5, n_blocks=2))
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
