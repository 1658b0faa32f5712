"""Checkpoint / lineage / metrics for resumable multi-stage runs
(north rule: "resumable from checkpoint with per-partition lineage +
metrics").

A pipeline is a sequence of named stages.  Each stage's output is written
to ``<root>/<stage>/data`` (parquet) with a ``_stage_manifest.json``
recording input snapshot, per-spark-partition row counts (the lineage),
wall time, and a DONE marker.  ``run_stage`` skips stages whose manifest
is already complete — a restarted driver resumes exactly after the last
finished stage, reading its predecessor's parquet instead of recomputing.

This is deliberately storage-level resume (the only kind that survives a
driver loss), not Spark's in-session ``.checkpoint()``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAGE_MANIFEST = "_stage_manifest.json"


class CheckpointedRun:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def stage_manifest(self, name: str) -> dict | None:
        p = os.path.join(self._stage_dir(name), STAGE_MANIFEST)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            m = json.load(f)
        return m if m.get("done") else None

    def run_stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        partition_by: str | None = None,
    ) -> DataFrame:
        """Produce stage ``name``: reuse the checkpointed output if its
        manifest is complete, else build → write → manifest.

        Lineage/metrics captured per spark partition via
        ``spark_partition_id()`` *before* the write (one extra narrow
        column, no extra pass)."""
        sdir = self._stage_dir(name)
        data = os.path.join(sdir, "data")
        existing = self.stage_manifest(name)
        if existing is not None:
            return self.spark.read.parquet(data)

        t0 = time.time()
        df = build().withColumn("_part", F.spark_partition_id())
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(data)
        written = self.spark.read.parquet(data)
        part_counts = {
            str(r["_part"]): r["n"]
            for r in written.groupBy("_part").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        manifest = {
            "stage": name,
            "done": True,
            "wall_sec": round(time.time() - t0, 3),
            "rows": int(sum(part_counts.values())),
            "partition_rows": part_counts,
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        os.makedirs(sdir, exist_ok=True)
        with open(os.path.join(sdir, STAGE_MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        # `_part` stays in the output (the resume path re-reads it anyway);
        # downstream stages simply ignore the lineage column
        return written

    def metrics(self) -> dict:
        out = {}
        if not os.path.isdir(self.root):
            return out
        for name in sorted(os.listdir(self.root)):
            m = self.stage_manifest(name)
            if m:
                out[name] = {k: m[k] for k in ("wall_sec", "rows", "finished_at")}
        return out
