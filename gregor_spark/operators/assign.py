"""Assignment operators — which zone does each cell/point belong to.

This is the engine's version of the reference's ``get_belongs_to_matrix``
(disaggregate.py:112-147, the per-polygon GDAL rasterize loop) and of its
per-point containment scan (disaggregate.py:184-186) / spatial join
(aggregate.py:121): ONE vectorized pass over Arrow batches instead of an
O(polygons) loop of full-raster masks.

Two physical strategies (SURVEY.md §4):

* **broadcast path** (here): zones ship inside the pandas-UDF closure —
  zero shuffle, embarrassingly parallel over fact partitions.  Right
  whenever the zone layer fits comfortably in executor memory (the common
  case: admin boundaries are ~MBs against a 100 TB fact table).
* **partitioned path** (operators/spatial_join.py): cell-cover shuffle
  join with explicit salting, for zone layers too large or too hot to
  broadcast.

Both produce identical assignments (determinism test in
tests/test_spatial_join.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..geo import kernels as K
from ..model.zones import ZoneSet


def _with_long_col(schema: T.StructType, name: str) -> T.StructType:
    return T.StructType(schema.fields + [T.StructField(name, T.LongType(), True)])


def assign_cells_df(
    df: DataFrame,
    zones: ZoneSet,
    x: str = "x",
    y: str = "y",
    out: str = "zone_id",
    keep_unassigned: bool = True,
) -> DataFrame:
    """Raster-rule assignment (pixel-center claims, last-id-wins).

    Adds ``out`` (nullable long).  With ``keep_unassigned=False`` rows in
    no zone are dropped (the inner-join semantics most downstream ops
    want; reference drops them via ``dropna`` at disaggregate.py:52).
    """
    ids = zones.zone_ids
    rings = zones.rings_list()
    if out in df.columns:  # re-assignment replaces a stale column
        df = df.drop(out)
    schema = _with_long_col(df.schema, out)
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            zid = K.assign_cells_rings(
                pdf[x].to_numpy(np.float64), pdf[y].to_numpy(np.float64), ids, rings
            )
            res = pdf.copy()
            res[out] = pd.array(zid, dtype="Int64")
            res.loc[zid < 0, out] = pd.NA
            yield res[names]

    result = df.mapInPandas(run, schema=schema)
    if not keep_unassigned:
        result = result.filter(result[out].isNotNull())
    return result


def assign_points_within_df(
    df: DataFrame,
    zones: ZoneSet,
    x: str = "x",
    y: str = "y",
    out: str = "zone_id",
    hits: str = "n_zones",
) -> DataFrame:
    """Strict-interior (shapely ``within``) assignment.

    Adds ``out`` (lowest matching zone id, null if none) and ``hits``
    (match count) so callers can enforce the reference's cardinality
    semantics: O4's exactly-one assert (disaggregate.py:189-192) or O6's
    inner-join drop (aggregate.py:121).
    """
    ids = zones.zone_ids
    rings = zones.rings_list()
    for c in (out, hits):
        if c in df.columns:
            df = df.drop(c)
    schema = _with_long_col(_with_long_col(df.schema, out), hits)
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            zid, n = K.assign_points_within_rings(
                pdf[x].to_numpy(np.float64), pdf[y].to_numpy(np.float64), ids, rings
            )
            res = pdf.copy()
            res[out] = pd.array(zid, dtype="Int64")
            res.loc[zid < 0, out] = pd.NA
            res[hits] = pd.array(n, dtype="Int64")
            yield res[names]

    return df.mapInPandas(run, schema=schema)


def explode_points_within_df(
    df: DataFrame,
    zones: ZoneSet,
    x: str = "x",
    y: str = "y",
    out: str = "zone_id",
) -> DataFrame:
    """ONE OUTPUT ROW PER (point, containing zone) match — the reference's
    ``gpd.sjoin(predicate='within')`` emits a row for every containing
    polygon (aggregate.py:121), so with overlapping zones a point counts
    once per zone.  Points matching no zone are dropped (inner join).

    Vectorized per zone within each Arrow batch (same cost shape as
    ``assign_points_within_df``); output order within a batch is by zone
    then point, deterministic.
    """
    ids = zones.zone_ids
    rings = zones.rings_list()
    if out in df.columns:
        df = df.drop(out)
    schema = _with_long_col(df.schema, out)
    names = [f.name for f in schema.fields]
    order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf[x].to_numpy(np.float64)
            py = pdf[y].to_numpy(np.float64)
            parts = []
            for k in order:
                mask = K.points_within_rings(px, py, rings[k])
                if mask.any():
                    res = pdf.loc[mask].copy()
                    res[out] = pd.array(
                        np.full(int(mask.sum()), ids[k], dtype=np.int64),
                        dtype="Int64",
                    )
                    parts.append(res[names])
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return df.mapInPandas(run, schema=schema)


# ----------------------------------------------- pure-expression path
#
# Catalyst-only twin of the broadcast path: the zone layer becomes ONE
# literal array<struct<zone_id, rings>> expression and the whole
# even-odd/boundary/west-wall evaluation runs inside whole-stage codegen
# (functions/geometry.py PIP folds) — no Python worker, no Arrow hop.
# Right for small zone layers (the literal expression tree grows with
# vertex count; big/hot layers belong to the partitioned spatial join).
# Parity with the pandas-UDF kernels is pytest-asserted on the golden
# fixtures and random dyadic points (tests/test_geometry_cols.py).


def _zones_literal_sql(zones: ZoneSet) -> str:
    """SQL literal for array<struct<zone_id: bigint, rings:
    array<struct<xs: array<double>, ys: array<double>, ccw: boolean>>>>.

    ``ccw`` — the ring's effective interior orientation, (signed_area >
    0) XOR hole — is folded in HERE, driver-side: it is constant per
    ring, and computing it inside the expression would nest a
    signed-area fold into every edge step of the PIP evaluation."""

    def arr(v) -> str:
        return "array(" + ", ".join(f"{float(x)!r}D" for x in v) + ")"

    zs = []
    for zid, rings in zip(zones.zone_ids, zones.rings_list()):
        rs = ", ".join(
            "named_struct('xs', {x}, 'ys', {y}, 'ccw', {c})".format(
                x=arr(xs),
                y=arr(ys),
                c="true" if (K.signed_area(xs, ys) > 0) != bool(hole) else "false",
            )
            for xs, ys, hole in rings
        )
        zs.append(f"named_struct('zone_id', {int(zid)}L, 'rings', array({rs}))")
    return "array(" + ", ".join(zs) + ")"


def assign_cells_df_expr(
    df: DataFrame,
    zones: ZoneSet,
    x: str = "x",
    y: str = "y",
    out: str = "zone_id",
    keep_unassigned: bool = True,
) -> DataFrame:
    """Raster-rule assignment with zero Python in the hot path: claim
    mask per zone via the expression PIP, last-id-wins via array_max
    over the claiming zones (same semantics as :func:`assign_cells_df`,
    parity-tested)."""
    from pyspark.sql import functions as F

    from ..functions.geometry import point_claims_zone

    if out in df.columns:
        df = df.drop(out)
    Z = F.expr(_zones_literal_sql(zones))
    px, py = df[x], df[y]
    claiming = F.filter(Z, lambda z: point_claims_zone(px, py, z["rings"]))
    zid = F.array_max(F.transform(claiming, lambda z: z["zone_id"]))
    result = df.withColumn(out, zid)
    if not keep_unassigned:
        result = result.filter(result[out].isNotNull())
    return result


def assign_points_within_df_expr(
    df: DataFrame,
    zones: ZoneSet,
    x: str = "x",
    y: str = "y",
    out: str = "zone_id",
    hits: str = "n_zones",
) -> DataFrame:
    """Strict-interior assignment, expression path: lowest matching id +
    hit count (same contract as :func:`assign_points_within_df`)."""
    from pyspark.sql import functions as F

    from ..functions.geometry import point_within_zone

    for c in (out, hits):
        if c in df.columns:
            df = df.drop(c)
    Z = F.expr(_zones_literal_sql(zones))
    px, py = df[x], df[y]
    within = F.filter(Z, lambda z: point_within_zone(px, py, z["rings"]))
    zid = F.array_min(F.transform(within, lambda z: z["zone_id"]))
    return df.withColumn(out, zid).withColumn(
        hits, F.size(within).cast("long")
    )
