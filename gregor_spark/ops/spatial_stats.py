"""Global spatial autocorrelation: Moran's I over a raster / cell table
with rook (4-neighbor) contiguity weights.

Extension surface beyond the reference's §2 list — the classic "is this
surface clustered, random, or dispersed" statistic (Moran 1950; the
PySAL/esda reference semantics with binary rook weights).

Scale shape — NO pair join: with binary weights the cross term
Σⱼ wᵢⱼ(xᵢ−x̄)(xⱼ−x̄) factors to (xᵢ−x̄)·(Sᵢ−nᵢ·x̄) where Sᵢ/nᵢ are the
neighbor value sum/count, so the whole statistic is one neighbor
explode (×4, map-only) + ONE groupBy on the cell key (union'd identity
rows carry each cell's own value through the same aggregate — the
operators/focal.py trick) + a broadcast of the 1-row global mean + a
final scalar aggregate.  Two Exchanges total, both key-hashed; no
O(cells²) anywhere.

Determinism: x̄ = sum/count is a single exact-rounded division (exact
sums for integer-valued cells); every per-cell term is quantized to
integers before the final sums, so the statistic is bit-identical at
any parallelism and the SQL oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: quantization scale for the numerator/denominator term sums.
MORAN_SCALE = 1_000_000

_ROOK = ((-1, 0), (1, 0), (0, -1), (0, 1))


def morans_i(
    cells: DataFrame,
    value: str = "value",
    nodata: float | None = None,
) -> DataFrame:
    """One row: ``n`` (valid cells), ``w_sum`` (Σ weights = directed
    rook adjacencies among valid cells), ``morans_i``.  Nodata/NULL
    cells are excluded from the lattice entirely (PySAL's treatment of
    missing values under binary contiguity).  NULL statistic when the
    surface is constant (zero variance) or has no adjacencies."""
    v = F.col(value)
    valid_pred = (
        v.isNotNull() if nodata is None else v.isNotNull() & (v != F.lit(nodata))
    )
    valid = cells.where(valid_pred).select("row", "col", v.alias("_x"))

    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
                for dr, dc in _ROOK
            ]
        )
    )
    contrib = valid.withColumn("_o", off).select(
        (F.col("row") + F.col("_o.dr")).alias("row"),
        (F.col("col") + F.col("_o.dc")).alias("col"),
        F.col("_x").alias("_nx"),
        F.lit(None).cast("double").alias("_self"),
    )
    ident = valid.select(
        "row", "col", F.lit(None).cast("double").alias("_nx"), F.col("_x").alias("_self")
    )
    per_cell = (
        contrib.unionByName(ident)
        .groupBy("row", "col")
        .agg(
            F.max("_self").alias("_x"),       # each cell has exactly one identity row
            F.count("_nx").alias("_n_nb"),
            F.sum("_nx").alias("_s_nb"),
        )
        .where(F.col("_x").isNotNull())       # drop phantom off-lattice targets
    )
    means = F.broadcast(
        valid.agg(
            (F.sum("_x") / F.count("_x")).alias("_mean"), F.count("_x").alias("_n")
        )
    )
    dev = F.col("_x") - F.col("_mean")
    cross = dev * (
        F.coalesce(F.col("_s_nb"), F.lit(0.0)) - F.col("_n_nb") * F.col("_mean")
    )
    terms = per_cell.crossJoin(means).select(
        F.col("_n"),
        F.col("_n_nb"),
        F.round(cross * MORAN_SCALE).cast("long").alias("_num_q"),
        F.round(dev * dev * MORAN_SCALE).cast("long").alias("_den_q"),
    )
    agg = terms.groupBy().agg(
        F.first("_n").alias("n"),
        F.sum("_n_nb").alias("w_sum"),
        F.sum("_num_q").alias("_num"),
        F.sum("_den_q").alias("_den"),
    )
    return agg.select(
        "n",
        "w_sum",
        F.when(
            (F.col("w_sum") > 0) & (F.col("_den") > 0),
            (F.col("n").cast("double") * F.col("_num").cast("double"))
            / (F.col("w_sum").cast("double") * F.col("_den").cast("double")),
        ).alias("morans_i"),
    )


_QUEEN_SELF = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1),  (0, 0),  (0, 1),
    (1, -1),  (1, 0),  (1, 1),
)


def getis_ord_gstar(
    cells: DataFrame,
    value: str = "value",
    nodata: float | None = None,
) -> DataFrame:
    """Getis–Ord Gi* hot-spot statistic per cell (Getis & Ord 1992/1995,
    the ArcGIS "Hot Spot Analysis" semantics) with binary queen
    contiguity INCLUDING self — the local complement of the global
    :func:`morans_i`:

    ``gi_z = (Σⱼ∈w(i) xⱼ − x̄·Wᵢ) / (S·sqrt((n·Wᵢ − Wᵢ²)/(n−1)))``

    where w(i) is the valid 3×3 window around i (self included),
    Wᵢ = |w(i)|, x̄ = Σx/n and S = sqrt(Σx²/n − x̄²).  Positive z = hot
    spot (high values clustered), negative = cold spot.

    Scale shape: the SAME two-Exchange plan as Moran's I — one ×9
    neighbor explode + ONE groupBy on the cell key (identity rows carry
    presence), a broadcast 1-row global-moments table, then pure map-side
    arithmetic.  No pair join, nothing O(cells²).

    Determinism: with integer-valued cells the window sums Σxⱼ and the
    global moments are exact at any parallelism (each partial sum is an
    exact double), and the z-score is a fixed-order chain of IEEE
    ``/ − × sqrt`` — bit-identical across engines.  NULL ``gi_z`` when
    the denominator is 0 (constant surface, or Wᵢ = n).  Nodata/NULL
    cells are excluded from the lattice (no row, no contribution)."""
    v = F.col(value)
    valid_pred = (
        v.isNotNull() if nodata is None else v.isNotNull() & (v != F.lit(nodata))
    )
    valid = cells.where(valid_pred).select("row", "col", v.alias("_x"))

    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
                for dr, dc in _QUEEN_SELF
            ]
        )
    )
    contrib = valid.withColumn("_o", off).select(
        (F.col("row") + F.col("_o.dr")).alias("row"),
        (F.col("col") + F.col("_o.dc")).alias("col"),
        F.col("_x").alias("_nx"),
        F.lit(None).cast("double").alias("_self"),
    )
    ident = valid.select(
        "row", "col", F.lit(None).cast("double").alias("_nx"), F.col("_x").alias("_self")
    )
    per_cell = (
        contrib.unionByName(ident)
        .groupBy("row", "col")
        .agg(
            F.max("_self").alias("_xv"),
            F.count("_nx").alias("w_i"),
            F.sum("_nx").alias("sum_nb"),
        )
        .where(F.col("_xv").isNotNull())
    )
    glob = F.broadcast(
        valid.agg(
            F.count("_x").alias("_n"),
            F.sum("_x").alias("_sx"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        )
    )
    joined = per_cell.crossJoin(glob)
    xbar = F.col("_sx") / F.col("_n")
    s = F.sqrt(F.col("_sxx") / F.col("_n") - xbar * xbar)
    tt = (
        F.col("_n") * F.col("w_i") - F.col("w_i") * F.col("w_i")
    ).cast("double") / (F.col("_n").cast("double") - F.lit(1.0))
    den = s * F.sqrt(tt)
    num = F.col("sum_nb") - xbar * F.col("w_i")
    return joined.select(
        "row",
        "col",
        "w_i",
        "sum_nb",
        F.when(den > F.lit(0.0), num / den).alias("gi_z"),
    )
