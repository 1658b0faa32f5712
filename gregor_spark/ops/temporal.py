"""Temporal joins — the as-of join Spark's DataFrame API lacks.

``asof_join`` matches each LEFT row to the single best RIGHT row with
the same key: the latest with ``right.ts <= left.ts`` (``backward``, the
trade/quote classic), the earliest with ``right.ts >= left.ts``
(``forward``), or whichever of the two is closer (``nearest``), with an
optional ``tolerance`` beyond which a match becomes NULL — the same
surface as pandas ``merge_asof``, which doubles as an independent test
oracle (tests/test_temporal.py).  The reference has no temporal surface;
a 10^12-document ingest pipeline does (attach the latest schema version /
crawl snapshot / policy row in force at each document's timestamp).

Scale shape — union + window, never a range join:
    tag both sides, unionByName, one window
    ``last(right_payload, ignorenulls) over (partition by key
    order by (ts, side) rows unbounded preceding..current)``
so the whole operator is ONE shuffle on the key (the window's), the
state per group is a single carried row, and there is no range-predicate
join that would force a per-key cross product.  ``forward`` is the same
window ordered descending; ``nearest`` evaluates both windows over the
SAME exchange (one shuffle, two sorts) and picks per row.  Compare the
naive ``l join r on key where r.ts <= l.ts`` + row_number: that
materializes O(|l|·|r|) rows per key before ranking — quadratic on hot
keys.

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
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: all ``left`` columns plus every ``right`` column
    (except the key) renamed ``{right_prefix}{col}``, from the matching
    right row for the same key — NULLs when none matches.

    ``direction``:
      * ``backward`` (default) — latest right row with ``r.ts <= l.ts``;
      * ``forward`` — earliest right row with ``r.ts >= l.ts``;
      * ``nearest`` — whichever of the two is closer in time; exact
        distance ties resolve BACKWARD (the row already in force).
    Ties on ts itself count the right row in every direction.

    ``tolerance`` (seconds for timestamp ``ts``, raw units for numeric)
    nulls out matches farther than the bound — pandas ``merge_asof``
    semantics, asserted against it in tests.

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
    undefined, so the contract pre-dedupes — the OPERATOR does not need
    that caller discipline.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    r_payload = [c for c in right.columns if c != on]
    r_struct_type = right.select(F.struct(*r_payload).alias("s")).schema["s"].dataType
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
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
    # side 0 < 1: at equal ts the right row sorts BEFORE the left row in
    # BOTH window directions, so the carried last() includes it —
    # ts-tie-inclusive semantics everywhere.  Tertiary key: among
    # equal-(ts, side=0) right rows, last() must not pick an arbitrary
    # one — order by the payload itself so the greatest struct wins.
    # Left rows all carry _r = NULL (asc_nulls_first keeps them ordered,
    # and their relative order is output-irrelevant: each left row emits
    # its own result and sees the same carried _match).
    tie = F.col("_r") if _orderable(r_struct_type) else F.to_json(F.col("_r"))

    def carry(descending: bool):
        order = F.col("_ts").desc() if descending else F.col("_ts").asc()
        w = (
            Window.partitionBy("_k")
            .orderBy(order, F.col("_side").asc(), tie.asc_nulls_first())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("_r", ignorenulls=True).over(w)

    ts_is_time = isinstance(
        left.schema[ts].dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
    )

    def ts_num(col):
        return F.unix_micros(col.cast("timestamp")) if ts_is_time else col.cast("double")

    merged = l_side.unionByName(r_side)
    if direction == "backward":
        merged = merged.withColumn("_match", carry(False))
    elif direction == "forward":
        merged = merged.withColumn("_match", carry(True))
    else:  # nearest: both windows share the one exchange (same partitioning)
        merged = merged.withColumn("_mb", carry(False)).withColumn("_mf", carry(True))
        d_back = ts_num(F.col("_ts")) - ts_num(F.col("_mb")[ts])
        d_fwd = ts_num(F.col("_mf")[ts]) - ts_num(F.col("_ts"))
        merged = merged.withColumn(
            "_match",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(d_fwd < d_back, F.col("_mf"))
            .otherwise(F.col("_mb")),  # distance tie -> backward
        )
    if tolerance is not None:
        bound = tolerance * 1_000_000 if ts_is_time else tolerance
        diff = F.abs(ts_num(F.col("_ts")) - ts_num(F.col("_match")[ts]))
        merged = merged.withColumn(
            "_match",
            F.when(F.col("_match").isNotNull() & (diff <= F.lit(bound)), F.col("_match")),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{right_prefix}{c}") for c in r_payload
    ]
    return merged.filter(F.col("_side") == 1).select(*out_cols)


# ---------------------------------------------------------------------------
# Interval (range) joins.
#
# Spark has no range-join optimization: ``l JOIN r ON l.ts BETWEEN r.lo
# AND r.hi`` with no equi-key plans as BroadcastNestedLoopJoin (every
# point row tested against EVERY interval — O(|points|·|intervals|)
# comparisons), and with an equi-key it still streams every same-key
# pair through the predicate.  The standard fix (Databricks range-join
# hints, DuckDB IEJoin do it engine-side) is BUCKETIZATION: quantize the
# range dimension into fixed-width buckets, emit each interval once per
# bucket it touches, give each point its single containing bucket, and
# equi-join on the bucket id — Catalyst then plans a plain hash/SMJ
# join and the exact predicate only re-checks same-bucket candidates.
# Cost: O(|points| + Σ span_i/width) join input rows; picking width
# around the median interval length keeps the explode factor ~2-3×.
# ---------------------------------------------------------------------------


def _bucket_num(col, is_time: bool):
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp")) if is_time else c.cast("double")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | None = None,
    ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bucket: float = 3600.0,
    closed: str = "both",
    interval_prefix: str = "i_",
    max_buckets: int = 16384,
) -> DataFrame:
    """Point-in-interval join: every ``points`` row paired with every
    ``intervals`` row whose ``[lo, hi]`` contains its ``ts`` (inner join;
    multi-match emits one row per match, no match emits nothing).
    Interval columns come back prefixed ``{interval_prefix}`` (the
    equi-key ``on``, when given, is not duplicated).

    ``closed``: ``both`` (lo <= ts <= hi), ``left`` (lo <= ts < hi),
    ``right`` (lo < ts <= hi), ``neither``.  Empty intervals under the
    chosen closure match nothing and are pruned before the explode.

    ``bucket`` is the quantization width — SECONDS when ``ts``/``lo``/
    ``hi`` are timestamps or dates, raw units when numeric.  Each point
    lands in exactly ONE bucket, so the join needs no post-dedup.  An
    interval spanning more than ``max_buckets`` buckets raises at run
    time (``assert_true``) instead of silently exploding the build side
    — pick a wider ``bucket`` for long intervals.

    Scale shape: one map-side explode of the (small) interval side, one
    equi-join on (key?, bucket) that Catalyst plans as broadcast or SMJ
    by size, exact predicate as a post-join filter.  No nested-loop
    join at any size; bench.py --interval measures the gap.
    """
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"closed must be both|left|right|neither, got {closed!r}")
    is_time = isinstance(
        points.schema[ts].dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
    )
    width = float(bucket) * (1_000_000.0 if is_time else 1.0)
    if width <= 0:
        raise ValueError("bucket width must be positive")

    pts = points.withColumn(
        "_ib", F.floor(_bucket_num(ts, is_time) / F.lit(width)).cast("long")
    )
    lo_n = _bucket_num(lo, is_time)
    hi_n = _bucket_num(hi, is_time)
    nonempty = (lo_n < hi_n) if closed == "neither" else (lo_n <= hi_n)
    lb = F.floor(lo_n / F.lit(width)).cast("long")
    hb = F.floor(hi_n / F.lit(width)).cast("long")
    ivl_cols = [
        F.col(c).alias(c if c == on else f"{interval_prefix}{c}")
        for c in intervals.columns
    ]
    # the guard lives INSIDE the sequence bound (not a dropped side
    # column Catalyst would prune away): a span over the cap evaluates
    # raise_error before the generator can materialize a huge array
    stop = F.when(hb - lb < F.lit(max_buckets), hb).otherwise(
        F.raise_error(
            F.lit(
                f"interval_join: an interval spans >= {max_buckets} buckets "
                f"of width {bucket}; widen `bucket` or raise `max_buckets`"
            )
        ).cast("long")
    )
    ivl = intervals.filter(nonempty).select(
        *ivl_cols, F.explode(F.sequence(lb, stop)).alias("_ib")
    )
    plo = F.col(f"{interval_prefix}{lo}")
    phi = F.col(f"{interval_prefix}{hi}")
    tsc = F.col(ts)
    exact = {
        "both": (plo <= tsc) & (tsc <= phi),
        "left": (plo <= tsc) & (tsc < phi),
        "right": (plo < tsc) & (tsc <= phi),
        "neither": (plo < tsc) & (tsc < phi),
    }[closed]
    keys = ["_ib"] if on is None else [on, "_ib"]
    return pts.join(ivl, on=keys, how="inner").filter(exact).drop("_ib")


def overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: str | None = None,
    lo: str = "lo",
    hi: str = "hi",
    bucket: float = 3600.0,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
    max_buckets: int = 16384,
) -> DataFrame:
    """Interval-overlap join: every ``a`` row paired with every ``b``
    row whose ``[lo, hi]`` intersects it (closed-closed:
    ``a.lo <= b.hi AND b.lo <= a.hi``), columns prefixed per side.

    Same bucketization as :func:`interval_join`, both sides exploded.
    A pair co-occurs in every bucket of the intersection of its two
    bucket spans; keeping only ``bucket == greatest(a_lb, b_lb)`` (the
    first shared bucket, always inside the intersection) emits each
    overlapping pair EXACTLY once — no ``distinct`` needed, so the plan
    stays one explode per side + one equi-join + filters.
    """
    is_time = isinstance(
        a.schema[lo].dataType, (T.TimestampType, T.TimestampNTZType, T.DateType)
    )
    width = float(bucket) * (1_000_000.0 if is_time else 1.0)
    if width <= 0:
        raise ValueError("bucket width must be positive")

    def prep(df: DataFrame, prefix: str) -> DataFrame:
        lo_n = _bucket_num(lo, is_time)
        hi_n = _bucket_num(hi, is_time)
        lb = F.floor(lo_n / F.lit(width)).cast("long")
        hb = F.floor(hi_n / F.lit(width)).cast("long")
        cols = [
            F.col(c).alias(c if c == on else f"{prefix}{c}") for c in df.columns
        ]
        stop = F.when(hb - lb < F.lit(max_buckets), hb).otherwise(
            F.raise_error(
                F.lit(
                    f"overlap_join: an interval spans >= {max_buckets} "
                    f"buckets of width {bucket}; widen `bucket`"
                )
            ).cast("long")
        )
        return df.filter(lo_n <= hi_n).select(
            *cols,
            lb.alias(f"{prefix}_lb"),
            F.explode(F.sequence(lb, stop)).alias("_ib"),
        )

    aa, bb = prep(a, left_prefix), prep(b, right_prefix)
    keys = ["_ib"] if on is None else [on, "_ib"]
    overlap = (F.col(f"{left_prefix}{lo}") <= F.col(f"{right_prefix}{hi}")) & (
        F.col(f"{right_prefix}{lo}") <= F.col(f"{left_prefix}{hi}")
    )
    first_shared = F.col("_ib") == F.greatest(
        F.col(f"{left_prefix}_lb"), F.col(f"{right_prefix}_lb")
    )
    return (
        aa.join(bb, on=keys, how="inner")
        .filter(overlap & first_shared)
        .drop("_ib", f"{left_prefix}_lb", f"{right_prefix}_lb")
    )
