"""kNN proxy assignment (SURVEY.md §2.2): each fact point gets its k
nearest proxy points.

Two physical strategies, same results:

* ``knn_broadcast`` — proxies ship in the pandas-UDF closure; one
  vectorized (batch × proxies) distance matrix + argpartition per Arrow
  batch.  Zero shuffle.  Right for proxy sets up to ~10^5 (weather
  stations, POI anchors …) against arbitrarily large fact tables — the
  common disaggregation shape.
* ``knn_cell_join`` — the scale path for big proxy sets: proxies are
  replicated to their Morton cell's ring-``r`` neighborhood (explode,
  driver-free), facts join on their own cell, distances are computed
  JVM-side, and ``row_number() over (partition by fact order by d2, pid)``
  keeps k.  Facts that end up with < k candidates (sparse regions) are
  retried with a doubled ring — a logarithmic driver loop over
  DataFrames, never per-row work.

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
    ring: int = 1,
    max_rounds: int = 6,
) -> DataFrame:
    """Distributed kNN via Morton-cell candidate join with ring escalation.

    Returns (fact columns..., rank, proxy_id, d2).
    """
    from .spatial_join import with_cell_id

    if res is None:
        # resolution from proxy density: ring-1 (9 cells) should hold ~3k
        # proxies on average so most facts satisfy in one round
        import math

        n_proxies = proxies.count()
        res = max(0, int(0.5 * math.log2(max(n_proxies * 3.0 / max(k, 1), 1.0))))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def ring_cells(cell: pd.Series, r: pd.Series) -> pd.Series:
        out = []
        for c, rr in zip(cell.to_numpy(np.int64), r.to_numpy(np.int64)):
            out.append(C.neighbors(np.array([c]), ring=int(rr)).tolist())
        return pd.Series(out)

    fact_cols = facts.columns
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
    pending = with_cell_id(facts, res, bounds, x=x, y=y, out="_fcell").cache()
    done = None
    r = ring
    # exactness guard: a fact is satisfied only when its k-th candidate is
    # closer than the ring's guaranteed coverage radius (r * min cell side)
    # — otherwise a nearer proxy could hide just outside the searched ring
    cell_min = min(bounds[2] - bounds[0], bounds[3] - bounds[1]) / (1 << res)
    for _ in range(max_rounds):
        cand = (
            pending.withColumn("_cells", ring_cells(F.col("_fcell"), F.lit(r)))
            .withColumn("_cell", F.explode("_cells"))
            .drop("_cells")
            .join(keyed_p, F.col("_cell") == keyed_p["_pcell"], "left")
        )
        d2 = (F.col(x) - F.col("_px")) ** 2 + (F.col(y) - F.col("_py")) ** 2
        w = Window.partitionBy(fact_key).orderBy(F.col("d2").asc(), F.col("proxy_id").asc())
        topk = (
            cand.withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter((F.col("rank") <= k) & F.col("proxy_id").isNotNull())
            .select(*fact_cols, "_fcell", "rank", "proxy_id", "d2")
        )
        guard = float((r * cell_min) ** 2)
        stats = topk.groupBy(fact_key).agg(
            F.count(F.lit(1)).alias("_n"), F.max("d2").alias("_dmax")
        )
        sat = stats.filter((F.col("_n") >= k) & (F.col("_dmax") <= guard)).select(
            fact_key
        )
        finished = topk.join(F.broadcast(sat), fact_key, "inner")
        done = finished if done is None else done.unionByName(finished)
        nxt = pending.join(sat, fact_key, "left_anti").cache()
        has_more = bool(nxt.take(1))
        pending.unpersist()
        pending = nxt
        if not has_more:
            break
        r *= 2
    # leftover facts (ring never satisfied within max_rounds / fewer than k
    # proxies exist): keep what they found
    if pending.take(1):
        leftover = pending  # re-join at max ring without the >=k filter
        cand = (
            leftover.withColumn("_cells", ring_cells(F.col("_fcell"), F.lit(r)))
            .withColumn("_cell", F.explode("_cells"))
            .drop("_cells")
            .join(keyed_p, F.col("_cell") == keyed_p["_pcell"], "inner")
        )
        d2 = (F.col(x) - F.col("_px")) ** 2 + (F.col(y) - F.col("_py")) ** 2
        w = Window.partitionBy(fact_key).orderBy(F.col("d2").asc(), F.col("proxy_id").asc())
        rest = (
            cand.withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(*fact_cols, "_fcell", "rank", "proxy_id", "d2")
        )
        done = rest if done is None else done.unionByName(rest)
    return done.drop("_fcell")
