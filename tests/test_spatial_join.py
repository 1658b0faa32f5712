"""Spatial hash join: broadcast vs partitioned vs salted paths must agree
with each other and with the direct broadcast kernel assignment, at any
parallelism (determinism, SURVEY.md §7 hard-part (d))."""

import pytest
from pyspark.sql import functions as F

from gregor_spark.model import fixtures as FX
from gregor_spark.model.zones import ZoneSet
from gregor_spark.operators.assign import assign_cells_df
from gregor_spark.operators.spatial_join import spatial_hash_join, with_cell_id
from gregor_spark.sources.documents import generate_documents, verify_span_sequence
from gregor_spark.operators.tiles import assign_tiles, extract_geo_points, tile_histogram

BOUNDS = (-0.25, 9.75, 1.75, 11.75)
RES = 6


@pytest.fixture(scope="module")
def pts(spark):
    # deterministic scatter incl. the overlap polygons' area
    import numpy as np

    rng = np.random.RandomState(123)
    n = 5000
    rows = [
        (int(i), float(x), float(y))
        for i, (x, y) in enumerate(
            zip(rng.uniform(-0.25, 1.75, n), rng.uniform(9.75, 11.75, n))
        )
    ]
    return spark.createDataFrame(rows, "point_id long, x double, y double").cache()


def _as_map(df):
    return {r["point_id"]: r["zone_id"] for r in df.select("point_id", "zone_id").collect()}


def test_paths_agree(spark, pts):
    zones = ZoneSet.from_fixture(FX.SEG_OVERLAP)
    broadcast = _as_map(
        spatial_hash_join(pts, zones, RES, BOUNDS, broadcast_cover=True)
    )
    partitioned = _as_map(
        spatial_hash_join(pts, zones, RES, BOUNDS, broadcast_cover=False)
    )
    salted = _as_map(
        spatial_hash_join(
            pts, zones, RES, BOUNDS, broadcast_cover=False, salt_threshold=10,
            salt_factor=4, fact_key="point_id",
        )
    )
    assert broadcast == partitioned == salted
    # and the join agrees with the direct mapInPandas kernel path
    direct = assign_cells_df(pts, zones, keep_unassigned=False)
    assert _as_map(direct) == broadcast


def test_left_join_keeps_unassigned(spark, pts):
    zones = ZoneSet.from_fixture(FX.SEG_3X3)  # covers only part of extent
    out = spatial_hash_join(pts, zones, RES, BOUNDS, keep_unassigned=True)
    assert out.count() == pts.count()
    assert out.filter(F.col("zone_id").isNull()).count() > 0


def test_determinism_across_parallelism(spark, pts):
    zones = ZoneSet.from_fixture(FX.SEG_OVERLAP)
    one = _as_map(
        spatial_hash_join(pts.repartition(1), zones, RES, BOUNDS, broadcast_cover=False)
    )
    many = _as_map(
        spatial_hash_join(pts.repartition(16), zones, RES, BOUNDS, broadcast_cover=False)
    )
    assert one == many


def test_documents_deterministic_and_invariant(spark):
    docs_a = generate_documents(spark, 500, BOUNDS, seed=7, partitions=2)
    docs_b = generate_documents(spark, 500, BOUNDS, seed=7, partitions=13)
    assert verify_span_sequence(docs_a, docs_b) == 0
    # offsets strictly increasing within each doc (checked on the array in
    # place — collect_list after a shuffle would not preserve order)
    offs = F.transform(F.col("spans"), lambda s: s["offset"])
    bad = docs_a.filter(
        F.exists(
            F.zip_with(offs, F.slice(offs, 2, 100000), lambda a, b: b <= a),
            lambda x: x,
        )
    ).count()
    assert bad == 0


def test_tile_assignment_and_span_equality(spark):
    zones = ZoneSet.from_fixture(FX.SEG_2X2)
    docs = generate_documents(spark, 2000, BOUNDS, seed=42, skew=0.5)
    tiled = assign_tiles(docs, RES, BOUNDS, zones=zones, keep_unassigned=True)
    pts = extract_geo_points(docs)
    assert tiled.count() == pts.count()
    # every geo point inside the fixture extent is strictly inside some
    # 2x2 zone except exact-boundary cases; spot-check zone correctness
    sample = tiled.filter(F.col("zone_id").isNotNull()).limit(200).collect()
    for r in sample:
        z = next(z for z in FX.SEG_2X2 if z.zone_id == r["zone_id"])
        minx, miny, maxx, maxy = z.bbox
        assert minx <= r["lon"] <= maxx and miny <= r["lat"] <= maxy
    # pipeline must not disturb the corpus: identity re-read of docs
    assert verify_span_sequence(docs, docs.select("doc_id", "spans")) == 0
    hist = tile_histogram(tiled)
    assert hist.agg(F.sum("n_spans")).collect()[0][0] == pts.count()


def test_skew_salting_spreads_hot_cell(spark):
    """With skew=0.9 most geo spans land in one corner; the salted join
    must still produce exactly the broadcast-path assignment."""
    zones = ZoneSet.from_fixture(FX.SEG_2X2)
    docs = generate_documents(spark, 3000, BOUNDS, seed=1, skew=0.9, hot_frac=0.02)
    pts = extract_geo_points(docs)
    a = spatial_hash_join(pts, zones, RES, BOUNDS, x="lon", y="lat", broadcast_cover=True)
    b = spatial_hash_join(
        pts, zones, RES, BOUNDS, x="lon", y="lat", broadcast_cover=False,
        salt_threshold=100, salt_factor=8, fact_key="doc_id",
    )
    key = lambda df: {
        (r["doc_id"], r["offset"]): r["zone_id"]
        for r in df.select("doc_id", "offset", "zone_id").collect()
    }
    assert key(a) == key(b)


def test_jvm_cell_id_matches_numpy(spark, pts):
    """The codegen Morton expression must be bit-identical to the numpy
    kernel (same IEEE op order)."""
    import numpy as np

    from gregor_spark.geo import cells as C

    got = {
        r["point_id"]: r["cell_id"]
        for r in with_cell_id(pts, 9, BOUNDS).select("point_id", "cell_id").collect()
    }
    rows = pts.collect()
    want = C.cell(
        np.array([r["x"] for r in rows]), np.array([r["y"] for r in rows]), 9, BOUNDS
    )
    assert [got[r["point_id"]] for r in rows] == want.tolist()


def test_assign_tiles_auto_resolution(spark):
    """res=None → planner-chosen resolution; assignment unchanged."""
    zones = ZoneSet.from_fixture(FX.SEG_2X2)
    docs = generate_documents(spark, 300, BOUNDS, seed=3)
    auto = assign_tiles(docs, None, BOUNDS, zones=zones, keep_unassigned=True)
    key = lambda df: {
        (r["doc_id"], r["offset"]): r["zone_id"]
        for r in df.select("doc_id", "offset", "zone_id").collect()
    }
    fixed = assign_tiles(docs, RES, BOUNDS, zones=zones, keep_unassigned=True)
    assert key(auto) == key(fixed)  # zone assignment is res-invariant
