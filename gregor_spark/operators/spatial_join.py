"""Spatial hash join — the scale path for assignment (SURVEY.md §2.2, §4).

Fact rows (points / document geo-spans) and zone polygons are keyed by
Morton cell at a chosen resolution; the join runs either:

* **broadcast**: ``F.broadcast(cover)`` when the zone cover is small
  (the planner decides from the cover's size, plans/strategy.py); zero
  fact-side shuffle; or
* **partitioned**: shuffle join on ``cell_id`` with **explicit salting**
  (north rule): a pre-aggregated cell histogram finds hot cells; fact
  rows in hot cells get ``salt = pmod(hash(fact key), k)``, the cover
  side explodes those cells ×k via ``explode(sequence(...))``.  AQE skew
  handling stays on as a second line of defense.

After the equi-join, candidates are refined by the exact PIP kernel and
multi-claims resolve deterministically last-id-wins via ``max(zone_id)``
— never partition order (SURVEY.md §7 hard-part (d)).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells as C
from ..geo import kernels as K
from ..model.zones import ZoneSet


def with_cell_id(
    df: DataFrame,
    res: int,
    bounds: tuple[float, float, float, float] = C.WORLD,
    x: str = "x",
    y: str = "y",
    out: str = "cell_id",
) -> DataFrame:
    """Add the Morton cell id — one Arrow-vectorized scalar pandas UDF."""

    @F.pandas_udf(T.LongType())
    def enc(xs: pd.Series, ys: pd.Series) -> pd.Series:
        return pd.Series(
            C.cell(xs.to_numpy(np.float64), ys.to_numpy(np.float64), res, bounds)
        )

    return df.withColumn(out, enc(F.col(x), F.col(y)))


def _refine_claims(
    joined: DataFrame,
    zones: ZoneSet,
    x: str,
    y: str,
    rule: str,
) -> DataFrame:
    """Filter candidate (point, zone) pairs by the exact geometry kernel.

    Vectorized per zone within each Arrow batch: one kernel pass per
    DISTINCT zone present in the batch, over only that zone's candidate
    rows — O(batch) work, no per-row Python.
    """
    lookup = zones.geometry_lookup()
    schema = joined.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        claim_fn = K.claims_raster_cell if rule == "raster" else (
            lambda px, py, zx, zy: K.points_strictly_inside(px, py, zx, zy)
        )
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[x].to_numpy(np.float64)
            py = pdf[y].to_numpy(np.float64)
            zid = pdf["zone_id"].to_numpy(np.int64)
            for z in np.unique(zid):
                zx, zy = lookup[int(z)]
                m = zid == z
                keep[m] = claim_fn(px[m], py[m], zx, zy)
            yield pdf[keep]

    return joined.mapInPandas(run, schema=schema)


def hot_cells(
    facts: DataFrame, threshold: int, cell: str = "cell_id"
) -> DataFrame:
    """Cells whose fact count exceeds ``threshold`` — the explicit skew
    histogram (one partial-agg shuffle over O(distinct cells) rows)."""
    return (
        facts.groupBy(cell)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(cell, "_n")
    )


def spatial_hash_join(
    facts: DataFrame,
    zones: ZoneSet,
    res: int,
    bounds: tuple[float, float, float, float] = C.WORLD,
    x: str = "x",
    y: str = "y",
    rule: str = "raster",
    broadcast_cover: bool | None = None,
    salt_threshold: int | None = None,
    salt_factor: int = 8,
    keep_unassigned: bool = False,
    fact_key: str | None = None,
) -> DataFrame:
    """Assign each fact row to a zone via the cell-keyed join.

    Returns ``facts`` columns + ``zone_id`` (last-id-wins).  With
    ``keep_unassigned``, unmatched rows carry NULL zone_id (left join).

    ``broadcast_cover=None`` lets the planner decide (plans/strategy.py);
    ``salt_threshold`` enables explicit hot-cell salting on the
    partitioned path.  ``fact_key`` (a stable id column) feeds the salt
    hash so salting is deterministic run-to-run.
    """
    from ..plans.strategy import choose_broadcast

    spark = facts.sparkSession
    cover_pairs = zones.cover(res, bounds)
    cover = spark.createDataFrame(cover_pairs, "zone_id long, cell_id long")
    if broadcast_cover is None:
        broadcast_cover = choose_broadcast(n_cover_rows=len(cover_pairs))

    keyed = with_cell_id(facts, res, bounds, x=x, y=y)
    fact_cols = facts.columns

    if broadcast_cover:
        joined = keyed.join(F.broadcast(cover), "cell_id", "inner")
    elif salt_threshold is not None:
        hot = hot_cells(keyed, salt_threshold).drop("_n")
        salt_src = F.col(fact_key) if fact_key else F.monotonically_increasing_id()
        facts_salted = (
            keyed.join(F.broadcast(hot.withColumn("_hot", F.lit(True))), "cell_id", "left")
            .withColumn(
                "_salt",
                F.when(F.col("_hot"), F.pmod(F.hash(salt_src), F.lit(salt_factor)))
                .otherwise(F.lit(0))
                .cast("int"),
            )
            .drop("_hot")
        )
        # generators can't live inside when(): explode hot cover rows ×k,
        # union the untouched cold rows with salt 0
        hot_cover = cover.join(F.broadcast(hot), "cell_id", "inner").withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt_factor - 1).cast("int"))),
        )
        cold_cover = cover.join(F.broadcast(hot), "cell_id", "left_anti").withColumn(
            "_salt", F.lit(0).cast("int")
        )
        cover_salted = hot_cover.unionByName(cold_cover)
        joined = facts_salted.join(cover_salted, ["cell_id", "_salt"], "inner").drop("_salt")
    else:
        joined = keyed.join(cover, "cell_id", "inner")

    refined = _refine_claims(joined, zones, x=x, y=y, rule=rule)
    # deterministic last-id-wins across multi-zone claims
    assigned = refined.groupBy(*fact_cols).agg(F.max("zone_id").alias("zone_id"))
    if keep_unassigned:
        assigned = facts.join(assigned, fact_cols, "left")
    return assigned
