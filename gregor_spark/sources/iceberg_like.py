"""Iceberg-shaped table layout on plain parquet.

No Iceberg runtime jars are assumed in this environment (SURVEY.md §7),
so the engine writes/reads an Iceberg-*shaped* layout behind one function
pair: hash-bucketed parquet directories plus a JSON manifest carrying the
schema, partition spec, per-bucket row counts and a snapshot id.  On a
cluster with Iceberg jars, swap these two functions for
``df.writeTo(...).using("iceberg")`` / ``spark.table`` — callers don't
change.

Bucketing by a stable key hash gives the co-location properties the
engine relies on: a later join/groupBy on the bucket key can avoid a
full shuffle, and per-bucket counts give the resume/lineage layer its
units of work (plans/checkpoint.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_gregor_manifest.json"


def _walk_data_files(path: str, part_col: str) -> list[tuple[str, int]]:
    """(relative file path, footer row count) for every parquet data file
    under the partition dirs — the unit an Iceberg manifest tracks."""
    import pyarrow.parquet as pq

    files: list[tuple[str, int]] = []
    prefix = f"{part_col}="
    for dirname in sorted(os.listdir(path)):
        if not dirname.startswith(prefix):
            continue
        pdir = os.path.join(path, dirname)
        for fname in sorted(os.listdir(pdir)):
            if fname.endswith(".parquet"):
                full = os.path.join(pdir, fname)
                files.append(
                    (os.path.join(dirname, fname), pq.ParquetFile(full).metadata.num_rows)
                )
    return files


def _footer_partition_counts(path: str, part_col: str) -> dict[str, int]:
    """Per-partition row counts straight from the parquet FOOTERS of the
    files just written — zero Spark jobs and zero data reads (a footer is
    a few KB regardless of file size).  This is exactly what a real
    Iceberg writer records in its manifests at commit time; re-scanning
    the table it just wrote (the round-1 shape) costs one extra O(table)
    job per write.  Local-FS walk here; on an object store the same
    footer read happens via the FileSystem API."""
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    prefix = f"{part_col}="
    for dirname in sorted(os.listdir(path)):
        if not dirname.startswith(prefix):
            continue
        key = dirname[len(prefix):]
        n = 0
        pdir = os.path.join(path, dirname)
        for fname in os.listdir(pdir):
            if fname.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(pdir, fname)).metadata.num_rows
        counts[key] = n
    return counts


def write_table(
    df: DataFrame,
    path: str,
    bucket_by: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` hash-bucketed by ``bucket_by`` and COMMIT a snapshot.

    Iceberg-style history: every commit appends a snapshot entry —
    (monotonic id, wall timestamp, operation, the FULL data-file list
    with footer row counts) — to the manifest, and the manifest swap is
    atomic (temp file + ``os.replace``), so a reader never observes a
    half-commit and ``read_table(..., snapshot_id=...)`` /
    ``as_of_ms=...`` time-travels by reading exactly the committed file
    list.  ``mode='append'`` keeps prior snapshots readable (their files
    are still on disk); ``mode='overwrite'`` deletes the old files, so
    it also truncates history — the same contract as an Iceberg
    overwrite followed by ``expire_snapshots``."""
    out = df.withColumn("bucket", F.pmod(F.hash(F.col(bucket_by)), F.lit(n_buckets)))
    prior = []
    if mode == "append" and os.path.exists(os.path.join(path, MANIFEST)):
        prior = read_manifest(path).get("snapshots", [])
    out.write.mode(mode).partitionBy("bucket").parquet(path)
    counts = _footer_partition_counts(path, "bucket")
    files = _walk_data_files(path, "bucket")
    now_ms = int(time.time() * 1000)
    snap_id = max(now_ms, (prior[-1]["snapshot_id"] + 1) if prior else 0)
    snapshot = {
        "snapshot_id": snap_id,
        "timestamp_ms": now_ms,
        "operation": mode,
        "files": [{"path": p, "rows": n} for p, n in files],
        "total_rows": sum(n for _p, n in files),
    }
    manifest = {
        "format": "gregor-iceberg-like/2",
        "snapshot_id": snap_id,            # current (legacy top-level field)
        "schema": df.schema.jsonValue(),
        "partition_spec": {"bucket_by": bucket_by, "n_buckets": n_buckets},
        "bucket_rows": counts,
        "total_rows": sum(counts.values()),
        "snapshots": prior + [snapshot],
        "current_snapshot_id": snap_id,
    }
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(path, MANIFEST))  # atomic commit
    return manifest


def _resolve_snapshot(m: dict, snapshot_id: int | None, as_of_ms: int | None) -> dict:
    snaps = m.get("snapshots", [])
    if not snaps:
        raise ValueError("table has no snapshot history (pre-v2 manifest)")
    if snapshot_id is not None:
        for s in snaps:
            if s["snapshot_id"] == snapshot_id:
                return s
        raise ValueError(f"snapshot {snapshot_id} not found")
    eligible = [s for s in snaps if s["timestamp_ms"] <= as_of_ms]
    if not eligible:
        raise ValueError(f"no snapshot at or before {as_of_ms}")
    return eligible[-1]


def read_table(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
) -> DataFrame:
    """Read a table written by ``write_table`` — current state by
    default; ``snapshot_id`` / ``as_of_ms`` time-travel to a committed
    snapshot by reading exactly its file list (``basePath`` keeps the
    bucket partition column derivable, so pruning still works)."""
    if snapshot_id is None and as_of_ms is None:
        return spark.read.parquet(path)
    snap = _resolve_snapshot(read_manifest(path), snapshot_id, as_of_ms)
    files = [os.path.join(path, f["path"]) for f in snap["files"]]
    if not files:
        raise ValueError(f"snapshot {snap['snapshot_id']} lists no files")
    return spark.read.option("basePath", path).parquet(*files)


def read_table_changes(
    spark: SparkSession, path: str, from_snapshot: int, to_snapshot: int | None = None
) -> DataFrame:
    """Incremental (changelog) scan: rows in files ADDED after
    ``from_snapshot`` up to ``to_snapshot`` (default: current) — the
    Iceberg incremental-read shape that lets a downstream consumer
    process only the delta of each append instead of rescanning the
    table.  Append-only tables: a file never leaves the list, so the
    set difference IS the delta."""
    m = read_manifest(path)
    base = _resolve_snapshot(m, from_snapshot, None)
    head = _resolve_snapshot(
        m, to_snapshot if to_snapshot is not None else m["current_snapshot_id"], None
    )
    seen = {f["path"] for f in base["files"]}
    new_files = [
        os.path.join(path, f["path"]) for f in head["files"] if f["path"] not in seen
    ]
    if not new_files:
        return spark.read.parquet(path).limit(0)
    return spark.read.option("basePath", path).parquet(*new_files)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)


# ------------------------------------------------- tile-partitioned layout


def write_cell_partitioned(
    df: DataFrame,
    path: str,
    res: int,
    parent_res: int,
    bounds: tuple[float, float, float, float],
    x: str = "x",
    y: str = "y",
    mode: str = "overwrite",
) -> dict:
    """Write a fact table partitioned by its COARSE Morton tile
    (``p_cell`` at ``parent_res``) — the Iceberg
    ``partitioned by truncate(cell)`` analog.  Z-order locality means a
    bbox query touches a contiguous handful of partitions, and
    ``read_cell_partitioned`` turns a bbox into a partition IN-list so the
    scan NEVER OPENS files outside the box (SURVEY §4: scan-level pruning
    for tile-partitioned cells)."""
    from ..operators.spatial_join import with_cell_id
    from ..operators.tiles import with_parent_cell

    keyed = with_parent_cell(
        with_cell_id(df, res, bounds, x=x, y=y), res, parent_res, out="p_cell"
    )
    keyed.write.mode(mode).partitionBy("p_cell").parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    cell_rows = _footer_partition_counts(path, "p_cell")
    manifest = {
        "format": "gregor-iceberg-like/1",
        "snapshot_id": int(time.time() * 1000),
        # the WRITTEN schema (source columns + cell_id + p_cell)
        "schema": written.schema.jsonValue(),
        "partition_spec": {
            "kind": "cell",
            "res": res,
            "parent_res": parent_res,
            "bounds": list(bounds),
            "x": x,
            "y": y,
        },
        # counted from the written files' parquet footers (zero jobs),
        # never a second pass over the source lineage or the written data
        "cell_rows": cell_rows,
        "total_rows": sum(cell_rows.values()),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _rect_cells(
    minx: float, miny: float, maxx: float, maxy: float, res: int, bounds
) -> list[int]:
    """All cells at ``res`` whose tile intersects the rect (driver-side,
    O(tiles-in-rect); callers choose parent_res so this stays small)."""
    import numpy as np

    from ..geo import cells as C

    ix0, iy0 = (int(v[0]) for v in C.xy_to_tile(np.array([minx]), np.array([miny]), res, bounds))
    ix1, iy1 = (int(v[0]) for v in C.xy_to_tile(np.array([maxx]), np.array([maxy]), res, bounds))
    out = []
    for iy in range(iy0, iy1 + 1):
        for ix in range(ix0, ix1 + 1):
            out.append(
                int(
                    (np.int64(res) << np.int64(56))
                    | C.morton_encode(np.array([ix]), np.array([iy]))[0]
                )
            )
    return out


def read_cell_partitioned(
    spark: SparkSession,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Read a cell-partitioned table; with ``bbox`` the partition IN-list
    plus the exact coordinate predicate are applied — the IN-list reaches
    the scan as a PartitionFilter (asserted in tests/test_plans.py)."""
    m = read_manifest(path)
    spec = m["partition_spec"]
    df = spark.read.parquet(path)
    if bbox is None:
        return df
    minx, miny, maxx, maxy = bbox
    cells = _rect_cells(minx, miny, maxx, maxy, spec["parent_res"], tuple(spec["bounds"]))
    xc, yc = spec["x"], spec["y"]
    return df.filter(
        F.col("p_cell").isin(cells)
        & (F.col(xc) >= minx) & (F.col(xc) <= maxx)
        & (F.col(yc) >= miny) & (F.col(yc) <= maxy)
    )
