"""The reference's roundtrip property (docs/examples/disaggregate-to-raster.py
assert block): disaggregate polygon values onto a proxy raster, aggregate
back under the same segmentation → reproduces the input values.  Run here
as a randomized property over grid segmentations and random proxies."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gregor_spark.model.raster import uniform_proxy_df
from gregor_spark.model.zones import ZoneSet
from gregor_spark.operators.aggregate import aggregate_raster_to_polygon
from gregor_spark.operators.disaggregate import (
    disaggregate_polygon_to_polygon,
    disaggregate_polygon_to_raster,
)


@pytest.mark.parametrize("seed,k,m", [(1, 3, 24), (2, 4, 32), (3, 2, 17)])
def test_disagg_agg_roundtrip(spark, seed, k, m):
    rng = np.random.RandomState(seed)
    x0, y0, x1, y1 = -1.0, -2.0, 3.0, 2.0
    boxes = []
    values = {}
    for r in range(k):
        for c in range(k):
            zid = r * k + c
            boxes.append(
                (
                    zid,
                    x0 + c * (x1 - x0) / k,
                    y0 + r * (y1 - y0) / k,
                    x0 + (c + 1) * (x1 - x0) / k,
                    y0 + (r + 1) * (y1 - y0) / k,
                )
            )
            values[zid] = float(rng.uniform(0.5, 10.0))
    zones = ZoneSet.from_bboxes(boxes)
    zones.values = values

    proxy = uniform_proxy_df(spark, (x0, y0, x1, y1), (m, m)).withColumn(
        "value", F.rand(seed) + F.lit(0.05)  # strictly positive proxy
    )
    disagg = disaggregate_polygon_to_raster(zones, proxy)
    back = aggregate_raster_to_polygon(
        disagg, zones, "sum", value="disaggregated", nodata=None
    )
    got = {r["zone_id"]: r["sum_disaggregated"] for r in back.collect()}
    for zid, v in values.items():
        assert got[zid] == pytest.approx(v, rel=1e-9), (zid, got[zid], v)


def test_poly_to_poly_roundtrip_identity(spark):
    """Apportioning a segmentation onto ITSELF is the identity."""
    boxes = [(i, float(i), 0.0, float(i + 1), 1.0) for i in range(5)]
    zones = ZoneSet.from_bboxes(boxes)
    zones.values = {i: float(i * 2 + 1) for i in range(5)}
    pairs = disaggregate_polygon_to_polygon(zones, zones)
    rows = pairs.collect()
    assert all(r["src_zone"] == r["tgt_zone"] for r in rows)
    got = {r["tgt_zone"]: r["apportioned"] for r in rows}
    assert got == pytest.approx(zones.values)
