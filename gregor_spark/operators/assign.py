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
    ids, zxs, zys = zones.arrays()
    if out in df.columns:  # re-assignment replaces a stale column
        df = df.drop(out)
    schema = _with_long_col(df.schema, out)
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            zid = K.assign_cells(
                pdf[x].to_numpy(np.float64), pdf[y].to_numpy(np.float64), ids, zxs, zys
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
    ids, zxs, zys = zones.arrays()
    for c in (out, hits):
        if c in df.columns:
            df = df.drop(c)
    schema = _with_long_col(_with_long_col(df.schema, out), hits)
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            zid, n = K.assign_points_within(
                pdf[x].to_numpy(np.float64), pdf[y].to_numpy(np.float64), ids, zxs, zys
            )
            res = pdf.copy()
            res[out] = pd.array(zid, dtype="Int64")
            res.loc[zid < 0, out] = pd.NA
            res[hits] = pd.array(n, dtype="Int64")
            yield res[names]

    return df.mapInPandas(run, schema=schema)
