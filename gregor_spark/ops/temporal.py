"""Temporal joins — the as-of join Spark's DataFrame API lacks.

``asof_join`` matches each LEFT row to the single most recent RIGHT row
with the same key and ``right.ts <= left.ts`` (backward direction, the
trade/quote classic).  The reference has no temporal surface; a
10^12-document ingest pipeline does (attach the latest schema version /
crawl snapshot / policy row in force at each document's timestamp).

Scale shape — union + window, never a range join:
    tag both sides, unionByName, one window
    ``last(right_payload, ignorenulls) over (partition by key
    order by (ts, side) rows unbounded preceding..current)``
so the whole operator is ONE shuffle on the key (the window's), the
state per group is a single carried row, and there is no range-predicate
join that would force a per-key cross product.  Compare the naive
``l join r on key where r.ts <= l.ts`` + row_number: that materializes
O(|l|·|r|) rows per key before ranking — quadratic on hot keys.

DuckDB has native ASOF JOIN, so the contract oracle is a genuinely
independent implementation, not a formula replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _orderable(dt: T.DataType) -> bool:
    """True when Spark can ORDER BY a column of this type (everything but
    maps, at any nesting depth)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    right_prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: all ``left`` columns plus every ``right``
    column (except the key) renamed ``{right_prefix}{col}``, from the
    latest right row with ``right.ts <= left.ts`` for the same key —
    NULLs when no right row precedes.  Ties on ts count the right row
    (it is "already in force" at that instant).

    FULLY deterministic, duplicate (key, ts) right rows included: among
    right rows sharing the exact same (key, ts), the one with the
    GREATEST payload struct (field-order lexicographic comparison over
    the non-key right columns) wins — a tertiary window sort key, so the
    result never depends on partitioning or parallelism (asserted at
    local[8] vs local[32] in tests/test_temporal.py).  When the payload
    contains a map (not orderable in Spark), the tie-break falls back to
    the payload's canonical JSON — still deterministic, just not a
    meaningful ordering.  An independent oracle replays the rule as
    ``max_by(payload, (ts, payload))`` per (key, ts); DuckDB's native
    ASOF JOIN (the contract query's oracle) leaves the tie winner
    undefined, so the contract pre-dedupes — the OPERATOR no longer
    needs that caller discipline.
    """
    r_payload = [c for c in right.columns if c != on]
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_side = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*r_payload).alias("_r"),
    )
    # side 0 < 1: at equal ts the right row sorts BEFORE the left row, so
    # the carried last() includes it — backward-inclusive semantics.
    # Tertiary key: among equal-(ts, side=0) right rows, last() must not
    # pick an arbitrary one — order by the payload itself so the greatest
    # struct wins.  Left rows all carry _r = NULL (asc_nulls_first keeps
    # them ordered, and their relative order is output-irrelevant: each
    # left row emits its own result and sees the same carried _match).
    r_struct_type = right.select(F.struct(*r_payload).alias("s")).schema[
        "s"
    ].dataType
    tie = (
        F.col("_r")
        if _orderable(r_struct_type)
        else F.to_json(F.col("_r"))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), tie.asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_side.unionByName(r_side).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in r_payload
    ]
    return merged.filter(F.col("_side") == 1).select(*out_cols)
