"""Distributed DBSCAN — density-based spatial clustering (Ester,
Kriegel, Sander & Xu 1996) over a geodesic point table.

Extension surface beyond the reference's §2 list: the reference assigns
points to GIVEN polygons; a geospatial pipeline also needs to DISCOVER
regions from point density (event hot zones, settlement detection,
GPS-trace destination mining).

Scale shape — no step is quadratic, no step is sequential:

1. ε-neighborhood edges come from
   :func:`~gregor_spark.operators.knn.within_distance_join_geodesic` —
   the degree-grid block join (candidates bounded by cell occupancy,
   exact haversine rescore, each pair exactly once), NOT an all-pairs
   join.
2. Core detection is one groupBy (degree count; a point's neighborhood
   includes itself, the paper's |N_eps(p)| ≥ minPts).
3. Cluster ids are connected components over CORE-CORE edges via
   :func:`~gregor_spark.ops.dedup.dedup_clusters` — the same
   checkpointed O(diameter)-round min-label propagation (with auto
   pointer jumping) that dedup clustering uses; cluster_id = the
   minimum core id of the component, deterministic at any parallelism.
4. Border points (non-core within ε of ≥ 1 core) take the MINIMUM
   cluster id among their adjacent cores — the textbook algorithm
   assigns them to whichever cluster reaches them first (scan-order
   dependent!); the min rule is the deterministic refinement, same
   spirit as the engine's last-id-wins / keep-lowest conventions.
5. Everything else is noise: ``cluster_id`` NULL.

Why not follow the seeded region-growing of the paper? It is
inherently sequential (one seed list, one visited set).  The
edges→cores→components factorization computes the IDENTICAL partition
of core points (cluster = ε-connected cores is an equivalence
relation — Lemma 1/2 of the paper), differs only in the documented
border tie-break, and every stage is a bounded shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.knn import within_distance_join_geodesic
from .dedup import dedup_clusters


def dbscan(
    pts: DataFrame,
    eps_km: float,
    min_pts: int,
    id_col: str = "point_id",
    lon: str = "lon",
    lat: str = "lat",
    max_abs_lat: float = 66.0,
) -> DataFrame:
    """(id_col, is_core, cluster_id) for every input point.

    ``is_core``: |N_eps(p)| ≥ ``min_pts`` with p counted in its own
    neighborhood (the paper's definition — ``min_pts=1`` makes every
    point a singleton core).  ``cluster_id``: the minimum core id of
    the point's cluster; for border points, the minimum over adjacent
    cores' clusters; NULL for noise.  Input ids must be unique."""
    if eps_km <= 0:
        raise ValueError("eps_km must be positive")
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    a, b = f"a_{id_col}", f"b_{id_col}"
    edges = within_distance_join_geodesic(
        pts, eps_km, lon=lon, lat=lat, id_col=id_col, max_abs_lat=max_abs_lat
    ).select(a, b)
    # materialize once: degree count, core-core filter and border
    # assignment all reuse the edge set (the dedup_clusters lineage
    # lesson — never recompute the candidate join per consumer)
    edges = edges.localCheckpoint(eager=True)

    deg = (
        edges.select(F.col(a).alias("id"))
        .unionByName(edges.select(F.col(b).alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_deg"))
    )
    ids = pts.select(F.col(id_col).alias("id"))
    core = (
        ids.join(deg, "id", "left")
        .where(F.coalesce("_deg", F.lit(0)) + F.lit(1) >= F.lit(int(min_pts)))
        .select("id")
    )

    core_edges = (
        edges.join(core.select(F.col("id").alias(a)), a)
        .join(core.select(F.col("id").alias(b)), b)
        .select(a, b)
    )
    comp = dedup_clusters(
        core.select(F.col("id").alias(id_col)), core_edges, key=id_col, a=a, b=b
    ).select(F.col(id_col).alias("id"), "cluster_id")

    dir_edges = edges.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).unionByName(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    border = (
        dir_edges.join(comp.select(F.col("id").alias("dst"), "cluster_id"), "dst")
        .join(core.select(F.col("id").alias("src")), "src", "left_anti")
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("cluster_id").alias("_b_cluster"))
    )

    out = (
        ids.join(comp.withColumnRenamed("cluster_id", "_c_cluster"), "id", "left")
        .join(border, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("_c_cluster").isNotNull().alias("is_core"),
            F.coalesce("_c_cluster", "_b_cluster").alias("cluster_id"),
        )
    )
    return out
