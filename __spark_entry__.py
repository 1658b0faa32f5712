"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (doc-derived geo points →
Morton tiles → salted spatial hash join → zone assignment) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with independent DuckDB oracles (see
gregor_spark/entry_queries.py for the derivation rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_PYFILES_READY = False


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship gregor_spark to executors (pandas-UDF closures unpickle by
    module reference).  Local mode usually resolves via cwd; the zip makes
    it robust to any launch directory and mirrors spark-submit --py-files."""
    global _PYFILES_READY
    if _PYFILES_READY:
        return
    try:
        import zipfile

        build = os.path.join(_REPO, ".build")
        os.makedirs(build, exist_ok=True)
        zpath = os.path.join(build, "gregor_spark.zip")
        pkg = os.path.join(_REPO, "gregor_spark")
        sources = [
            os.path.join(root, f)
            for root, _dirs, files in os.walk(pkg)
            for f in files
            if f.endswith(".py")
        ]
        # rebuild when any module is newer than the zip (a stale zip would
        # ship old code to workers while the driver runs new code)
        newest = max(os.path.getmtime(s) for s in sources)
        if not os.path.exists(zpath) or os.path.getmtime(zpath) < newest:
            with zipfile.ZipFile(zpath, "w") as zf:
                for full in sources:
                    zf.write(full, os.path.relpath(full, _REPO))
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added in this context, or cwd-resolution suffices
    _PYFILES_READY = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_workers_can_import(spark)
    from gregor_spark.entry_queries import REGISTRY

    return REGISTRY["doc_tiles"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from gregor_spark.entry_queries import REGISTRY

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for the non-SQL ops:
    north_pipeline, media_features, ann_lsh → rows-only checks)."""
    from gregor_spark.entry_queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
