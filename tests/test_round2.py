"""Round-2 additions: distributed poly→poly parity, north-pipeline
span-sequence invariant, and the public functions module's codegen twins."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gregor_spark.model import fixtures as FX
from gregor_spark.model.zones import ZoneSet

BOUNDS = (-0.25, 9.75, 1.75, 11.75)


def _rows(df):
    return {
        (r["src_zone"], r["tgt_zone"]): (
            round(r["area"], 9),
            round(r["apportioned"], 9),
        )
        for r in df.collect()
    }


def test_poly_to_poly_distributed_parity(spark):
    """Cover-join path == driver path row-for-row on the fixtures."""
    from gregor_spark.operators.disaggregate import (
        disaggregate_polygon_to_polygon,
        disaggregate_polygon_to_polygon_distributed,
    )

    src = ZoneSet.from_fixture(FX.SEG_2X2, values={0: 2.0, 1: 4.0, 2: 6.0, 3: 8.0})
    tgt = ZoneSet.from_fixture(FX.SEG_3X3)
    a = _rows(disaggregate_polygon_to_polygon(src, tgt))
    b = _rows(disaggregate_polygon_to_polygon_distributed(src, tgt))
    assert a == b
    # forced-coarse cover (res 2) still finds every pair — the cover is a
    # conservative superset at ANY resolution
    c = _rows(disaggregate_polygon_to_polygon_distributed(src, tgt, res=2))
    assert a == c


def test_poly_to_poly_distributed_holed_source(spark):
    """A holed source apportions only its annulus area."""
    from gregor_spark.operators.disaggregate import (
        disaggregate_polygon_to_polygon_distributed,
    )

    src = ZoneSet.from_fixture(FX.SEG_HOLED, values={0: 6.0})
    tgt = ZoneSet.from_fixture(FX.SEG_2X2)
    out = disaggregate_polygon_to_polygon_distributed(src, tgt)
    rows = out.collect()
    total_area = sum(r["area"] for r in rows)
    assert total_area == pytest.approx(3.0)  # 2x2 deg minus 1x1 hole
    assert sum(r["apportioned"] for r in rows) == pytest.approx(6.0)


def test_north_pipeline_span_sequence_invariant(spark):
    """Per-doc span sequences are byte-identical before and after the tile
    pipeline (the BASELINE input_hint invariant) — assignment is a side
    table, documents are never mutated."""
    from gregor_spark.entry_queries import north_corpus
    from gregor_spark.sources.documents import verify_span_sequence

    corpus = north_corpus(spark, "/root/testdata/sf0.001")
    # the pipeline reads `corpus`; the invariant compares the corpus with
    # itself AFTER the pipeline has consumed it (no mutation, stable order)
    from gregor_spark.operators.tiles import assign_tiles

    tiled = assign_tiles(
        corpus, 6, BOUNDS, zones=ZoneSet.from_fixture(FX.SEG_2X2),
        keep_unassigned=True, broadcast_cover=False, salt_threshold=0,
        salt_factor=4,
    )
    assert tiled.count() > 0
    assert verify_span_sequence(corpus, north_corpus(spark, "/root/testdata/sf0.001")) == 0
    # interleaving is real: every doc carries text+geo+media kinds
    kinds = (
        corpus.select(F.explode("spans").alias("s"))
        .select(F.col("s.kind").alias("k"))
        .distinct()
        .collect()
    )
    assert {r["k"] for r in kinds} == {"text", "geo", "media"}


def test_functions_module_twins(spark):
    """Public GF column functions are bit-identical to the numpy kernels."""
    from gregor_spark import functions as GF
    from gregor_spark.geo import cells as C

    df = spark.range(2000).select(
        (F.rand(7) * 2 - 0.25).alias("x"), (F.rand(8) * 2 + 9.75).alias("y")
    )
    out = df.select(
        "x",
        "y",
        GF.cell(F.col("x"), F.col("y"), 9, BOUNDS).alias("c"),
    )
    out = out.select(
        "x", "y", "c",
        GF.tile_x(F.col("c")).alias("tx"),
        GF.tile_y(F.col("c")).alias("ty"),
        GF.parent_cell(F.col("c"), 9, 5).alias("p"),
        GF.cell_res(F.col("c")).alias("r"),
    )
    rows = out.collect()
    xs = np.array([r["x"] for r in rows])
    ys = np.array([r["y"] for r in rows])
    want_c = C.cell(xs, ys, 9, BOUNDS)
    np.testing.assert_array_equal(np.array([r["c"] for r in rows]), want_c)
    wtx, wty = C.cell_tile(want_c)
    np.testing.assert_array_equal(np.array([r["tx"] for r in rows]), wtx)
    np.testing.assert_array_equal(np.array([r["ty"] for r in rows]), wty)
    np.testing.assert_array_equal(
        np.array([r["p"] for r in rows]), C.parent(want_c, 5)
    )
    assert all(r["r"] == 9 for r in rows)
