"""Spatial hash join — the scale path for assignment (SURVEY.md §2.2, §4).

Fact rows (points / document geo-spans) and zone polygons are keyed by
Morton cell at a chosen resolution; the join runs either:

* **broadcast**: ``F.broadcast(cover)`` when the zone cover is small
  (the planner decides from the cover's size, plans/strategy.py); zero
  fact-side shuffle; or
* **partitioned**: shuffle join on ``cell_id`` with **explicit salting**
  (north rule): a pre-aggregated cell histogram finds hot cells; fact
  rows in hot cells get ``salt = pmod(hash(fact key), k)``, the cover
  side explodes those cells ×k via ``explode(sequence(...))``.  AQE skew
  handling stays on as a second line of defense.

After the equi-join, candidates are refined by the exact PIP kernel and
multi-claims resolve deterministically last-id-wins via ``max(zone_id)``
— never partition order (SURVEY.md §7 hard-part (d)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geo import cells as C
from ..geo import kernels as K
from ..model.zones import ZoneSet


_PART1BY1_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _part1by1_col(v):
    """Interleave zeros between the low 32 bits — the same magic-mask
    ladder as geo/cells._part1by1, as pure column bit-ops."""
    v = v.bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _PART1BY1_MASKS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


_COMPACT1BY1_MASKS = (
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000FFFFFFFF),
)


def _compact1by1_col(v):
    """Inverse of ``_part1by1_col`` — drop the interleaved zero bits
    (geo/cells._compact1by1 as pure column bit-ops)."""
    v = v.bitwiseAND(F.lit(0x5555555555555555))
    for shift, mask in _COMPACT1BY1_MASKS:
        v = (v.bitwiseOR(F.shiftrightunsigned(v, shift))).bitwiseAND(F.lit(mask))
    return v


def cell_tile_cols(cell):
    """(ix, iy) tile-coordinate columns decoded from a Morton cell id —
    whole-stage codegen, bit-identical to geo/cells.cell_tile."""
    m = cell.bitwiseAND(F.lit((1 << 56) - 1))
    return _compact1by1_col(m), _compact1by1_col(F.shiftrightunsigned(m, 1))


# 56-bit interleaved-axis masks (morton payload occupies bits [0, 52))
_X_MASK = 0x55555555555555
_Y_MASK = 0xAAAAAAAAAAAAAA


def neighbor_cells_col(cell, res: int):
    """array<long> of the 3x3 Moore-neighborhood cells around ``cell`` at
    resolution ``res``, clipped to the grid — pure column expressions (the
    kNN ring primitive, zero Python).

    Uses direct Morton-space arithmetic (the classic masked inc/dec trick:
    ``x+1 = ((m | Y_MASK) + 1) & X_MASK`` — the carry rides over the other
    axis's bits) instead of decode→±1→re-encode: a naive compose of the
    magic-mask ladders duplicates subtrees exponentially (each ladder
    level references its input twice), which blew the expression tree to
    ~10^4 nodes and forced interpreted evaluation (measured: >100 s for
    1000 rows).  This form is ~20 ops per neighbor and grid-edge validity
    is a constant compare per axis."""
    from ..geo.cells import _part1by1

    import numpy as np

    m = cell.bitwiseAND(F.lit((1 << 56) - 1))
    xmax = int(_part1by1(np.array([(1 << res) - 1]))[0])  # encoded ix == n-1
    ymax = xmax << 1
    mx = m.bitwiseAND(F.lit(_X_MASK))
    my = m.bitwiseAND(F.lit(_Y_MASK))
    x_parts = {
        0: (mx, F.lit(True)),
        1: (((m.bitwiseOR(F.lit(_Y_MASK))) + 1).bitwiseAND(F.lit(_X_MASK)), mx != xmax),
        -1: ((mx - 1).bitwiseAND(F.lit(_X_MASK)), mx != 0),
    }
    y_parts = {
        0: (my, F.lit(True)),
        1: (((m.bitwiseOR(F.lit(_X_MASK))) + 2).bitwiseAND(F.lit(_Y_MASK)), my != ymax),
        -1: ((my - 2).bitwiseAND(F.lit(_Y_MASK)), my != 0),
    }
    base = F.lit(res << 56)
    cands = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            xp, xv = x_parts[dx]
            yp, yv = y_parts[dy]
            cands.append(F.when(xv & yv, base.bitwiseOR(xp.bitwiseOR(yp))))
    return F.array_compact(F.array(*cands))


def cell_id_col(
    x, y, res: int, bounds: tuple[float, float, float, float] = C.WORLD
):
    """Morton cell id as a pure column expression (whole-stage codegen;
    zero Python).  Bit-identical to the numpy kernel geo/cells.cell —
    same IEEE op order, asserted in tests.  THE single definition: both
    ``with_cell_id`` and the public ``gregor_spark.functions.cell`` wrap
    this builder, so the two can never drift."""
    if not 0 <= res <= C.MAX_RES:
        raise ValueError(f"res must be in [0, {C.MAX_RES}]")
    minx, miny, maxx, maxy = bounds
    n = 1 << res

    def tile(coord, lo, hi):
        f = (coord - F.lit(lo)) / F.lit(hi - lo)
        t = F.floor(f * F.lit(float(n))).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit(n - 1), t))

    morton = _part1by1_col(tile(x, minx, maxx)).bitwiseOR(
        F.shiftleft(_part1by1_col(tile(y, miny, maxy)), 1)
    )
    return F.lit(res << 56).bitwiseOR(morton)


def with_cell_id(
    df: DataFrame,
    res: int,
    bounds: tuple[float, float, float, float] = C.WORLD,
    x: str = "x",
    y: str = "y",
    out: str = "cell_id",
) -> DataFrame:
    """Add the Morton cell id column (see cell_id_col)."""
    return df.withColumn(out, cell_id_col(F.col(x), F.col(y), res, bounds))


def _refine_claims(
    joined: DataFrame,
    zones: ZoneSet,
    x: str,
    y: str,
    rule: str,
) -> DataFrame:
    """Null-out the zone_id of candidate (point, zone) pairs that fail the
    exact geometry kernel (instead of dropping the row — so a downstream
    ``max(zone_id)`` groupBy yields NULL for fully-unassigned points and
    the whole join needs no second pass over the facts).

    Vectorized per zone within each Arrow batch: one kernel pass per
    DISTINCT zone present in the batch, over only that zone's candidate
    rows — O(batch) work, no per-row Python.
    """
    lookup = zones.geometry_lookup()

    # slim scalar UDF: Arrow moves ONLY (x, y, zone_id, _full) — never the
    # fact payload (doc ids etc.); everything else stays JVM-side.
    # Interior (_full) candidates short-circuit without touching the kernel.
    @F.pandas_udf(T.BooleanType())
    def claims(xs: pd.Series, ys: pd.Series, zid_s: pd.Series, full_s: pd.Series) -> pd.Series:
        claim_fn = (
            K.claims_raster_cell_rings if rule == "raster" else K.points_within_rings
        )
        notnull = zid_s.notna().to_numpy()
        keep = full_s.fillna(False).to_numpy(bool).copy()
        pending = notnull & ~keep
        if pending.any():
            px = xs.to_numpy(np.float64)
            py = ys.to_numpy(np.float64)
            zid = np.where(notnull, zid_s.fillna(-1).to_numpy(np.int64), -1)
            for z in np.unique(zid[pending]):
                m = pending & (zid == z)
                keep[m] = claim_fn(px[m], py[m], lookup[int(z)])
        return pd.Series(keep)

    ok = claims(F.col(x), F.col(y), F.col("zone_id"), F.col("_full"))
    return joined.withColumn(
        "zone_id", F.when(ok, F.col("zone_id")).otherwise(F.lit(None).cast("long"))
    ).drop("_full")


def _assign_indexed(
    keyed: DataFrame,
    zones: ZoneSet,
    cover_pairs: list[tuple[int, int, bool]],
    x: str,
    y: str,
    rule: str,
) -> DataFrame:
    """Broadcast-path assignment as ONE scalar pandas UDF — zero shuffle.

    The zone cover ships in the closure as per-zone sorted cell arrays;
    per Arrow batch each zone claims via ``searchsorted`` membership on
    the fact's cell_id (full cells directly, boundary cells through the
    exact kernel), ascending zone order → last-id-wins by overwrite.
    Equivalent to join+refine+groupBy but with no join duplication and no
    dedup shuffle: the assignment stage is map-only, so it scales with
    cores/executors and leaves only O(tiles) rows for any downstream agg.
    """
    by_zone: dict[int, tuple[list[int], list[int]]] = {}
    for zid, cid, full in cover_pairs:
        fulls, bnds = by_zone.setdefault(zid, ([], []))
        (fulls if full else bnds).append(cid)
    zone_cells = [
        (
            zid,
            np.sort(np.asarray(by_zone[zid][0], dtype=np.int64)),
            np.sort(np.asarray(by_zone[zid][1], dtype=np.int64)),
        )
        for zid in sorted(by_zone)
    ]
    lookup = zones.geometry_lookup()

    def _member(cells: np.ndarray, sorted_cells: np.ndarray) -> np.ndarray:
        if len(sorted_cells) == 0:
            return np.zeros(len(cells), dtype=bool)
        idx = np.searchsorted(sorted_cells, cells)
        idx = np.clip(idx, 0, len(sorted_cells) - 1)
        return sorted_cells[idx] == cells

    @F.pandas_udf(T.LongType())
    def assign(xs: pd.Series, ys: pd.Series, cell_s: pd.Series) -> pd.Series:
        claim_fn = (
            K.claims_raster_cell_rings if rule == "raster" else K.points_within_rings
        )
        cells = cell_s.to_numpy(np.int64)
        px = xs.to_numpy(np.float64)
        py = ys.to_numpy(np.float64)
        out = np.full(len(cells), -1, dtype=np.int64)
        for zid, fulls, bnds in zone_cells:
            claimed = _member(cells, fulls)
            bmask = _member(cells, bnds)
            if bmask.any():
                claimed[bmask] = claim_fn(px[bmask], py[bmask], lookup[zid])
            out[claimed] = zid
        res = pd.Series(out, dtype="Int64")
        res[out < 0] = pd.NA
        return res

    return keyed.withColumn("zone_id", assign(F.col(x), F.col(y), F.col("cell_id")))


def hot_cells(
    facts: DataFrame, threshold: int, cell: str = "cell_id"
) -> DataFrame:
    """Cells whose fact count exceeds ``threshold`` — the explicit skew
    histogram (one partial-agg shuffle over O(distinct cells) rows)."""
    return (
        facts.groupBy(cell)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > threshold)
        .select(cell, "_n")
    )


def spatial_hash_join(
    facts: DataFrame,
    zones: ZoneSet,
    res: int,
    bounds: tuple[float, float, float, float] = C.WORLD,
    x: str = "x",
    y: str = "y",
    rule: str = "raster",
    broadcast_cover: bool | None = None,
    salt_threshold: int | None = None,
    salt_factor: int = 8,
    keep_unassigned: bool = False,
    fact_key: str | None = None,
) -> DataFrame:
    """Assign each fact row to a zone via the cell-keyed join.

    Returns ``facts`` columns + ``zone_id`` (last-id-wins).  With
    ``keep_unassigned``, unmatched rows carry NULL zone_id (left join).

    ``broadcast_cover=None`` lets the planner decide (plans/strategy.py);
    ``salt_threshold`` enables explicit hot-cell salting on the
    partitioned path.  ``fact_key`` (a stable id column) feeds the salt
    hash so salting is deterministic run-to-run.
    """
    from ..plans.strategy import choose_broadcast

    from ..model.localdf import local_df

    spark = facts.sparkSession
    cover_pairs = zones.cover(res, bounds)
    if broadcast_cover is None:
        broadcast_cover = choose_broadcast(n_cover_rows=len(cover_pairs))
    # the broadcast path ships cover_pairs in the UDF closure and never
    # touches a cover DataFrame — only build it for the join paths
    cover = (
        None
        if broadcast_cover
        else local_df(
            spark, cover_pairs, "zone_id long, cell_id long, _full boolean"
        )
    )

    keyed = with_cell_id(facts, res, bounds, x=x, y=y)
    fact_cols = facts.columns
    how = "left" if keep_unassigned else "inner"
    # NB: the skew histogram makes `keyed` dual-consumed, but it is NOT
    # persisted: the encode is pure codegen, so recomputing the scan
    # lineage costs seconds while a deserialized MEMORY_AND_DISK persist
    # of the fact table causes an allocation/GC storm that anti-scales
    # with task threads (measured: 85 s at local[32] vs 4 s recompute).

    if broadcast_cover:
        assigned = _assign_indexed(keyed, zones, cover_pairs, x, y, rule)
        if not keep_unassigned:
            assigned = assigned.filter(F.col("zone_id").isNotNull())
        return assigned
    if salt_threshold is not None:
        hot = hot_cells(keyed, salt_threshold).drop("_n")
        salt_src = F.col(fact_key) if fact_key else F.monotonically_increasing_id()
        facts_salted = (
            keyed.join(F.broadcast(hot.withColumn("_hot", F.lit(True))), "cell_id", "left")
            .withColumn(
                "_salt",
                F.when(F.col("_hot"), F.pmod(F.hash(salt_src), F.lit(salt_factor)))
                .otherwise(F.lit(0))
                .cast("int"),
            )
            .drop("_hot")
        )
        # generators can't live inside when(): explode hot cover rows ×k,
        # union the untouched cold rows with salt 0
        hot_cover = cover.join(F.broadcast(hot), "cell_id", "inner").withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt_factor - 1).cast("int"))),
        )
        cold_cover = cover.join(F.broadcast(hot), "cell_id", "left_anti").withColumn(
            "_salt", F.lit(0).cast("int")
        )
        cover_salted = hot_cover.unionByName(cold_cover)
        joined = facts_salted.join(cover_salted, ["cell_id", "_salt"], how).drop("_salt")
    else:
        joined = keyed.join(cover, "cell_id", how)

    candidates = _refine_claims(joined, zones, x=x, y=y, rule=rule)
    # deterministic last-id-wins across multi-zone claims (max ignores the
    # nulled-out failed candidates); cell_id (a pure function of x,y) rides
    # along so callers need no second encode pass.  ONE join + ONE groupBy
    # over the facts — keep_unassigned costs nothing extra (left join +
    # NULL zone_id), no second pass; interior-cell candidates short-circuit
    # inside the refine UDF (no kernel work, no plan branch).
    # MEASURED (r2, 2M docs, local[32]): splitting interior/boundary into
    # two plan branches before the UDF — union(filter(_full),
    # refine(filter(~_full))) — ran 3.6× SLOWER (43 s vs 12 s): the
    # branches recompute the salted fact shuffle instead of reusing the
    # exchange.  The slim in-UDF short-circuit (Arrow ships only
    # x,y,zone_id,_full) is the right shape; don't re-split.
    assigned = candidates.groupBy(*fact_cols, "cell_id").agg(
        F.max("zone_id").alias("zone_id")
    )
    if not keep_unassigned:
        assigned = assigned.filter(F.col("zone_id").isNotNull())
    return assigned
