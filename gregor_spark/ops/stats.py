"""Distributed quantiles: exact (moderate group cardinality) and a
bounded-memory histogram method (the 100 TB path).

``quantiles_exact`` wraps Spark's native exact ``percentile`` aggregate
— correct at any skew, but its buffer holds every distinct value of the
group, so it is the right tool only when per-group cardinality is
bounded (it is the oracle twin here: DuckDB's ``quantile_cont`` computes
the same R-7 interpolation, differing only in final-ulp expression
order, covered by 6-dp rounding).

``quantiles_histogram`` is the scale path: two passes, O(n_bins) state
per group no matter the input.

  pass 1 — per-group min/max (partial agg);
  pass 2 — integer counts per fixed-width bin (partial agg), then the
  quantile is linearly interpolated WITHIN the bin that straddles the
  target rank, treating the bin's mass as uniform.

The estimate always lies inside the straddling bin's value span; the
exact R-7 value lies between that bin's start and the end of the NEXT
nonempty bin (its ceil-rank order statistic can sit there), so error ≤
bin width + the empty-bin gap to the next occupied bin — for data dense
relative to the bin width this is one bin width ((max−min)/n_bins), a
resolution knob, not a probabilistic bound.  Bin counts are integers,
so the only float work is the final interpolation expression,
replicated verbatim in the SQL oracle.  Both methods are deterministic at any parallelism
(integer counts + fixed expression order — unlike t-digest/GK sketches,
whose merge order changes results across partitionings, which is why
``approx_percentile`` can never be oracle-checked)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantiles_exact(
    df: DataFrame, col: str, qs: list[float], by: list[str] | None = None
) -> DataFrame:
    """(``*by``, q, value_r): exact R-7 quantiles per group, rounded 6dp
    (cross-engine ulp cover)."""
    arr = "array(" + ", ".join(f"{q!r}D" for q in qs) + ")"
    agg = df.groupBy(*(by or [])).agg(
        F.expr(f"percentile({col}, {arr})").alias("_p")
    )
    pos = F.posexplode(F.col("_p"))
    qlit = F.array(*[F.lit(float(q)) for q in qs])
    return (
        agg.select(*(by or []), pos)
        .select(
            *(by or []),
            F.element_at(qlit, F.col("pos") + 1).alias("q"),
            F.round(F.col("col"), 6).alias("value_r"),
        )
    )


def quantiles_histogram(
    df: DataFrame,
    col: str,
    qs: list[float],
    by: list[str] | None = None,
    n_bins: int = 1000,
) -> DataFrame:
    """(``*by``, q, value_r): histogram-interpolated quantiles, state
    bounded at ``n_bins`` integer counts per group.

    Bin rule: ``bin = least(n_bins-1, floor((v-min)/(max-min)*n_bins))``
    (the max value folds into the last bin).  The q-th quantile's target
    rank is ``q*(n-1)`` (R-7 convention, matching ``quantiles_exact`` as
    bins → ∞); the straddling bin's mass is treated as uniform over its
    width.  Degenerate groups (min == max) return that value for all qs.
    """
    gb = by or []
    ext = df.groupBy(*gb).agg(
        F.min(col).alias("_lo"),
        F.max(col).alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    j = df.join(F.broadcast(ext), gb) if gb else df.crossJoin(F.broadcast(ext))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    binc = F.when(
        F.col("_hi") == F.col("_lo"), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(n_bins - 1),
            F.floor((F.col(col) - F.col("_lo")) / width).cast("int"),
        )
    )
    hist = (
        j.withColumn("_bin", binc)
        .groupBy(*gb, "_lo", "_hi", "_n", "_bin")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    # cumulative count BELOW each bin (window over the tiny histogram)
    from pyspark.sql.window import Window

    w = Window.partitionBy(*gb).orderBy("_bin") if gb else Window.orderBy("_bin")
    hist = hist.withColumn(
        "_below", F.sum("_cnt").over(w) - F.col("_cnt")
    )
    out = None
    for q in qs:
        # target rank in [0, n-1]; the straddling bin holds the rank
        rank = F.lit(float(q)) * (F.col("_n") - 1).cast("double")
        # rank = q*(n-1) <= n-1 < n, so the half-open [below, below+cnt)
        # intervals (which partition [0, n)) straddle every q incl. q=1
        inbin = (rank >= F.col("_below").cast("double")) & (
            rank < (F.col("_below") + F.col("_cnt")).cast("double")
        )
        frac = (rank - F.col("_below").cast("double")) / F.col("_cnt").cast("double")
        val = F.when(F.col("_hi") == F.col("_lo"), F.col("_lo")).otherwise(
            F.col("_lo")
            + (F.col("_bin").cast("double") + frac) * width
        )
        one = (
            hist.where(inbin)
            .groupBy(*gb)
            .agg(F.min(val).alias("_v"))  # straddle ties: lowest bin wins
            .select(*gb, F.lit(float(q)).alias("q"), F.round("_v", 6).alias("value_r"))
        )
        out = one if out is None else out.unionByName(one)
    return out


def robust_outliers(
    df: DataFrame,
    col: str,
    by: list[str] | None = None,
    k: float = 3.5,
) -> DataFrame:
    """(*by, <original columns>, med_r, mad_r, z_u6, outlier) — robust
    per-group outlier flags via the modified z-score (Iglewicz &
    Hoaglin 1993): z = 0.6745·(x − median) / MAD, MAD the median
    absolute deviation; |z| > k flags.  The curation shape for length/
    score anomalies: unlike mean/std, one giant document cannot drag
    the threshold (50% breakdown point).

    Two passes, each a per-group exact-percentile aggregate (the 100 TB
    corpus swaps in ``quantiles_histogram``'s two-pass integer-count
    median — same call shape) + a broadcast join back; the data is
    never shuffled on anything but the group key.

    Determinism: median and MAD are rounded to 6 dp BEFORE entering the
    z expression (the cross-engine ulp cover used by every quantile op
    here — and their interpolated values are .0/.5-grained, never a
    6 dp tie), so z is the SAME double on every engine; it is exported
    as integer micro-z ``floor(z·10⁶)`` because decimal ``round()``
    tie-breaking differs across engines on exact half values (z =
    −0.2529375 bit us), while floor of an identical double cannot.
    The flag compares the raw double against k directly.  MAD = 0
    (constant majority): z is NULL and any value differing from the
    median flags."""
    grp = by or []
    med = df.groupBy(*grp).agg(
        F.round(F.expr(f"percentile({col}, 0.5D)"), 6).alias("_med")
    )
    joined = df.join(F.broadcast(med), grp) if grp else df.crossJoin(
        F.broadcast(med)
    )
    mad = (
        joined.withColumn("_ad", F.abs(F.col(col) - F.col("_med")))
        .groupBy(*grp)
        .agg(F.round(F.expr("percentile(_ad, 0.5D)"), 6).alias("_mad"))
    )
    both = joined.join(F.broadcast(mad), grp) if grp else joined.crossJoin(
        F.broadcast(mad)
    )
    z = F.lit(0.6745) * (F.col(col) - F.col("_med")) / F.col("_mad")
    return both.select(
        *df.columns,
        F.col("_med").alias("med_r"),
        F.col("_mad").alias("mad_r"),
        F.when(F.col("_mad") > 0, F.floor(z * F.lit(1000000.0)).cast("long"))
        .alias("z_u6"),
        F.when(F.col("_mad") > 0, F.abs(z) > F.lit(float(k)))
        .otherwise(F.col(col) != F.col("_med"))
        .alias("outlier"),
    )
