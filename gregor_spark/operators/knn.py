"""kNN proxy assignment (SURVEY.md §2.2): each fact point gets its k
nearest proxy points.

Two physical strategies, same results:

* ``knn_broadcast`` — proxies ship in the pandas-UDF closure; one
  vectorized (batch × proxies) distance matrix + argpartition per Arrow
  batch.  Zero shuffle.  Right for proxy sets up to ~10^5 (weather
  stations, POI anchors …) against arbitrarily large fact tables — the
  common disaggregation shape.
* ``knn_cell_join`` — the scale path for big proxy sets: facts and
  proxies are keyed by Morton cell; candidates come from the fact's 3×3
  cell neighborhood (an INNER equi-join — a left join would rank NULL
  candidates first and starve the satisfaction guard), distances and the
  neighbor explode are pure JVM column expressions, and
  ``row_number() over (partition by fact order by d2, pid)`` keeps k.
  Facts whose k-th hit isn't provably exact (could a nearer proxy hide
  outside the searched neighborhood?) retry at a COARSER resolution —
  cells 4× bigger per round, always 9 candidate cells per fact, never an
  unbounded ring explode — terminating at res 0 where every proxy is a
  candidate by construction.  Exactness guard: satisfied only when the
  k-th distance < cell side, since any unseen proxy is ≥ one cell away.

Ties break by (distance, proxy_id) in both paths — deterministic at any
parallelism.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..geo import cells as C


def knn_broadcast(
    facts: DataFrame,
    proxies: list[tuple[int, float, float]],
    k: int,
    x: str = "x",
    y: str = "y",
    fact_key: str = "point_id",
) -> DataFrame:
    """(fact_key, rank, proxy_id, d2) for the k nearest proxies.

    ``proxies``: (proxy_id, x, y) rows, driver-side (broadcast in the UDF
    closure).  d2 is squared euclidean (planar) — callers needing great-
    circle distance pass pre-projected coords.
    """
    parr = np.asarray([[p[1], p[2]] for p in proxies], dtype=np.float64)
    pids = np.asarray([p[0] for p in proxies], dtype=np.int64)
    kk = min(k, len(pids))
    key_field = facts.schema[fact_key]
    schema = T.StructType(
        [
            key_field,
            T.StructField("rank", T.IntegerType()),
            T.StructField("proxy_id", T.LongType()),
            T.StructField("d2", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            fx = pdf[x].to_numpy(np.float64)[:, None]
            fy = pdf[y].to_numpy(np.float64)[:, None]
            d2 = (fx - parr[None, :, 0]) ** 2 + (fy - parr[None, :, 1]) ** 2
            # deterministic (d2, proxy_id) order: lexsort per row
            idx = np.lexsort((np.broadcast_to(pids, d2.shape), d2), axis=1)[:, :kk]
            rows = np.repeat(pdf[fact_key].to_numpy(), kk)
            ranks = np.tile(np.arange(1, kk + 1, dtype=np.int32), len(pdf))
            yield pd.DataFrame(
                {
                    fact_key: rows,
                    "rank": ranks,
                    "proxy_id": pids[idx].ravel(),
                    "d2": np.take_along_axis(d2, idx, axis=1).ravel(),
                }
            )

    return facts.mapInPandas(run, schema=schema)


def knn_cell_join(
    facts: DataFrame,
    proxies: DataFrame,
    k: int,
    res: int | None = None,
    bounds: tuple[float, float, float, float] = C.WORLD,
    x: str = "x",
    y: str = "y",
    px: str = "x",
    py: str = "y",
    fact_key: str = "point_id",
    proxy_key: str = "proxy_id",
    stats: dict | None = None,
) -> DataFrame:
    """Distributed exact kNN via Morton-cell candidate join with
    resolution-coarsening escalation (see module docstring).

    Returns (fact columns..., rank, proxy_id, d2).

    ``stats`` (optional dict) is filled with {"res0": starting resolution,
    "rounds": escalation rounds executed} — the round count is the
    density-uniformity diagnostic: clustered proxy layouts coarsen more
    before every fact satisfies the guard, and the bench records that it
    stays small (BENCH/BASELINE.md).
    """
    from .spatial_join import neighbor_cells_col, with_cell_id
    from .tiles import with_parent_cell

    if res is None:
        # resolution from proxy density: ~k proxies per cell on average, so
        # the 3x3 neighborhood holds ~9k candidates and the guard radius
        # (one cell side) covers the k nearest for most facts in round 1
        import math

        n_proxies = proxies.count()
        res = max(0, int(0.5 * math.log2(max(n_proxies / max(k, 1), 1.0))))

    fact_cols = facts.columns
    # Caches serve only the loop's own ``take(1)`` probe jobs; every cache
    # is unpersisted before returning (the returned plan falls back to
    # lineage recompute — measured in round 1 to beat a deserialized
    # persist of fact-sized tables by ~20x in local mode).
    keyed_p = (
        with_cell_id(proxies, res, bounds, x=px, y=py, out="_pcell")
        .select(
            F.col(proxy_key).alias("proxy_id"),
            F.col(px).alias("_px"),
            F.col(py).alias("_py"),
            "_pcell",
        )
        .cache()
    )
    pending = with_cell_id(facts, res, bounds, x=x, y=y, out="_fcell")
    done: DataFrame | None = None
    cached: list[DataFrame] = [keyed_p]
    d2 = (F.col(x) - F.col("_px")) ** 2 + (F.col(y) - F.col("_py")) ** 2
    w_rank = Window.partitionBy(fact_key).orderBy(
        F.col("d2").asc(), F.col("proxy_id").asc()
    )
    w_fact = Window.partitionBy(fact_key)
    if stats is not None:
        stats["res0"] = res
        stats["rounds"] = 0
    try:
        for rr in range(res, -1, -1):
            if stats is not None:
                stats["rounds"] += 1
            f = with_parent_cell(pending, res, rr, cell="_fcell", out="_fc")
            p = with_parent_cell(keyed_p, res, rr, cell="_pcell", out="_pc")
            cand = f.withColumn(
                "_nc", F.explode(neighbor_cells_col(F.col("_fc"), rr))
            ).join(p, F.col("_nc") == F.col("_pc"), "inner")
            topk = (
                cand.withColumn("d2", d2)
                .withColumn("rank", F.row_number().over(w_rank).cast("int"))
                .filter(F.col("rank") <= k)
                .select(*fact_cols, "rank", "proxy_id", "d2")
            )
            if rr == 0:
                # the 1x1 grid makes every proxy a candidate: exact by
                # construction (facts with < k proxies keep what exists)
                finished = topk
                done = finished if done is None else done.unionByName(finished)
                break
            # exactness guard: any proxy outside the 3x3 neighborhood is at
            # least one cell side away, so the k-th hit must be strictly
            # closer.  Window aggregates reuse the rank window's shuffle —
            # no O(facts) driver-side broadcast of satisfied ids.
            cell_min = min(bounds[2] - bounds[0], bounds[3] - bounds[1]) / (1 << rr)
            guard = float(cell_min * cell_min)
            scored = topk.withColumn("_n", F.count(F.lit(1)).over(w_fact)).withColumn(
                "_dmax", F.max("d2").over(w_fact)
            )
            sat = (F.col("_n") >= k) & (F.col("_dmax") < guard)
            finished = scored.filter(sat).drop("_n", "_dmax")
            done = finished if done is None else done.unionByName(finished)
            sat_ids = scored.filter(sat).select(fact_key).distinct()
            nxt = pending.join(sat_ids, fact_key, "left_anti").cache()
            cached.append(nxt)
            has_more = bool(nxt.take(1))
            pending = nxt
            if not has_more:
                break
    finally:
        # no leak: unpersisting never breaks the returned plan — Spark
        # falls back to recomputing the lineage when the caller executes
        for df in cached:
            df.unpersist()
    return done.drop("_fcell") if "_fcell" in done.columns else done


def within_distance_join(
    pts: DataFrame,
    radius: float,
    x: str = "x",
    y: str = "y",
    id_col: str = "point_id",
    cell: float | None = None,
) -> DataFrame:
    """All pairs of ``pts`` rows within planar distance ``radius``:
    (a_{id}, b_{id}, d2) with a_{id} < b_{id}, each qualifying pair
    exactly once.  The 2-D sibling of ops/temporal.py's bucketized range
    join — Spark would otherwise plan the distance predicate as a
    BroadcastNestedLoopJoin over all N² pairs.

    Grid blocking: every point gets its (floor(x/cell), floor(y/cell))
    grid key; the LEFT side explodes into the (2r+1)² neighborhood with
    r = ceil(radius/cell) (cells default to radius → 3×3, the proven
    shape) while the RIGHT side keeps its single cell, so each candidate
    pair meets EXACTLY once (the right cell appears once in the left
    neighborhood) — no distinct needed.  Exact d² <= radius² filters
    post-join.  Scale: one shuffle on the grid key per side; per-cell
    density bounds the candidate blowup (pick ``cell`` ≈ radius; AQE
    skew-join splits pathological cells).  a_id < b_id both halves the
    work and drops self-pairs.
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    w = float(cell) if cell is not None else float(radius)
    if w <= 0:
        raise ValueError("cell width must be positive")
    ring = int(np.ceil(radius / w))
    offsets = [
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in range(-ring, ring + 1)
        for dy in range(-ring, ring + 1)
    ]
    cx = F.floor(F.col(x) / F.lit(w)).cast("long")
    cy = F.floor(F.col(y) / F.lit(w)).cast("long")
    left = (
        pts.select(
            F.col(id_col).alias("_aid"),
            F.col(x).alias("_ax"),
            F.col(y).alias("_ay"),
            cx.alias("_cx0"),
            cy.alias("_cy0"),
        )
        .withColumn("_o", F.explode(F.array(*offsets)))
        .select(
            "_aid",
            "_ax",
            "_ay",
            (F.col("_cx0") + F.col("_o.dx")).alias("_cx"),
            (F.col("_cy0") + F.col("_o.dy")).alias("_cy"),
        )
    )
    right = pts.select(
        F.col(id_col).alias("_bid"),
        F.col(x).alias("_bx"),
        F.col(y).alias("_by"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    d2 = (F.col("_ax") - F.col("_bx")) * (F.col("_ax") - F.col("_bx")) + (
        F.col("_ay") - F.col("_by")
    ) * (F.col("_ay") - F.col("_by"))
    return (
        left.join(right, ["_cx", "_cy"], "inner")
        .filter((F.col("_aid") < F.col("_bid")) & (d2 <= F.lit(radius * radius)))
        .select(
            F.col("_aid").alias(f"a_{id_col}"),
            F.col("_bid").alias(f"b_{id_col}"),
            d2.alias("d2"),
        )
    )


KM_PER_DEG_LAT = 110.574  # smallest km/degree of latitude (conservative)
KM_PER_DEG_LON_EQ = 111.320  # km/degree of longitude at the equator


def within_distance_join_geodesic(
    pts: DataFrame,
    radius_km: float,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str = "point_id",
    max_abs_lat: float = 66.0,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """All pairs within great-circle ``radius_km``: (a_id, b_id, km)
    with a_id < b_id, each pair exactly once — the geodesic sibling of
    :func:`within_distance_join`.

    Blocking uses a lat/lon DEGREE grid sized conservatively: the lat
    cell is ``radius/110.574`` degrees and the lon cell is widened by
    ``1/cos(max_abs_lat)`` so candidate neighborhoods still cover the
    radius at the highest latitude the data reaches (caller-declared;
    the default 66° covers everything south of the polar circles — for
    polar corpora use a polar-cap-aware partitioner, not wider boxes).
    The exactness guard is the exact haversine rescore post-join; the
    degree box only bounds candidates.  Same exactly-once construction
    as the planar join: left explodes its (2r+1)² neighborhood, right
    keeps one cell.

    ``keys``: extra equi-join columns carried on both sides and
    prepended to the output — e.g. a time-grid instant for co-location
    ("same place, same time") joins over resampled tracks; the shuffle
    then partitions on (keys, cell), so instants spread the hash space
    instead of concentrating it.
    """
    import math

    if radius_km <= 0:
        raise ValueError("radius_km must be positive")
    if not 0 <= max_abs_lat < 90:
        raise ValueError("max_abs_lat must be in [0, 90)")
    from ..functions.geometry import haversine_km
    from ..plans.spread import spread

    wlat = radius_km / KM_PER_DEG_LAT
    wlon = radius_km / (KM_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)))

    # One-task candidate twin (r8, operators/pairs_local.py): below the
    # small-points gate the exactly-once candidate pairs come from a
    # single numpy task with the identical cell arithmetic, and the
    # SAME haversine rescore below runs over them — bit-identical
    # edges, no explode, no shuffle join.  keys callers (co-location)
    # and non-long ids keep the distributed join.
    if not keys:
        from .pairs_local import eligible, local_candidate_pairs

        if eligible(pts, id_col, lon, lat):
            sel = pts.select(
                F.col(id_col).alias("_id"),
                F.col(lon).cast("double").alias("_lon"),
                F.col(lat).cast("double").alias("_lat"),
            )
            cand = local_candidate_pairs(sel, wlon, wlat)
            if cand is not None:
                kmc = haversine_km(
                    F.col("_alon"), F.col("_alat"), F.col("_blon"), F.col("_blat")
                )
                return (
                    cand.withColumn("_km", kmc)
                    .filter(F.col("_km") <= F.lit(float(radius_km)))
                    .select(
                        F.col("_aid").alias(f"a_{id_col}"),
                        F.col("_bid").alias(f"b_{id_col}"),
                        F.col("_km").alias("km"),
                    )
                )

    # the 9-way neighborhood explode + haversine rescore is the hot
    # loop; a single-file scan would run it on one core (guide §2.5 —
    # no-op when the input already has >= default-parallelism splits)
    pts = spread(pts, id_col)
    # one ring in each direction because the cell IS the (conservative)
    # radius in that dimension
    offsets = [
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ]
    cx = F.floor(F.col(lon) / F.lit(wlon)).cast("long")
    cy = F.floor(F.col(lat) / F.lit(wlat)).cast("long")
    kcols = [F.col(k) for k in keys]
    left = (
        pts.select(
            *kcols,
            F.col(id_col).alias("_aid"),
            F.col(lon).alias("_alon"),
            F.col(lat).alias("_alat"),
            cx.alias("_cx0"),
            cy.alias("_cy0"),
        )
        .withColumn("_o", F.explode(F.array(*offsets)))
        .select(
            *keys,
            "_aid",
            "_alon",
            "_alat",
            (F.col("_cx0") + F.col("_o.dx")).alias("_cx"),
            (F.col("_cy0") + F.col("_o.dy")).alias("_cy"),
        )
    )
    right = pts.select(
        *kcols,
        F.col(id_col).alias("_bid"),
        F.col(lon).alias("_blon"),
        F.col(lat).alias("_blat"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    km = haversine_km(
        F.col("_alon"), F.col("_alat"), F.col("_blon"), F.col("_blat")
    )
    return (
        left.join(right, [*keys, "_cx", "_cy"], "inner")
        .filter(F.col("_aid") < F.col("_bid"))
        .withColumn("_km", km)
        .filter(F.col("_km") <= F.lit(float(radius_km)))
        .select(
            *keys,
            F.col("_aid").alias(f"a_{id_col}"),
            F.col("_bid").alias(f"b_{id_col}"),
            F.col("_km").alias("km"),
        )
    )
