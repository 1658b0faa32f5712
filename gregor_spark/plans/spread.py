"""Scale-adaptive input-parallelism fix (optimization guide §2.5,
"input skew": one huge unsplittable file).

The sandbox's sf tables are single-row-group parquet files, so every
scan is ONE task no matter what ``spark.sql.files.maxPartitionBytes``
says — and any CPU-heavy map work fused above the scan (shingle
explodes, per-token md5, regex passes) runs on 1 of N cores until the
first exchange.  Profiled at sf0.1/local[32]: minhash_sig spent 3.0 s
in a single-task stage; jaccard_pairs ran the same single-task shingle
explode three times (9.1 s of its 9.5 s stage wall).

``spread`` hash-repartitions the input across the session's default
parallelism BEFORE the heavy derivation — but only when the upstream
plan actually has fewer partitions than that (the single-file shape).
At cluster scale the input arrives in hundreds of splits and the call
is a structural no-op (no exchange added).  Keyed repartition keeps the
row→partition mapping deterministic (guide §2.5's warning about
rand-derived keys), and every downstream aggregate keys on the same id,
so results are partition-layout-independent by the same argument that
lets the driver check the contract at any core count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition ``df`` to the session default parallelism when (and
    only when) its plan currently yields fewer partitions — the
    unsplittable-single-file scan shape.  ``keys`` choose the hash
    partitioning columns (deterministic); without keys a round-robin
    repartition is used."""
    try:
        target = int(df.sparkSession.sparkContext.defaultParallelism)
        n = int(df.rdd.getNumPartitions())
    except Exception:  # pragma: no cover - defensive (plan not convertible)
        return df
    if n >= target or target <= 1:
        return df
    if keys:
        return df.repartition(target, *keys)
    return df.repartition(target)
