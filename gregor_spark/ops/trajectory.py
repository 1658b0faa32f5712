"""Trajectory / movement analytics over timestamped point events.

Extension surface beyond the reference's §2 list (the reference stops at
static zone/raster assignment; a geospatial event pipeline also needs
per-entity movement rollups).  Everything here is pure Catalyst column
arithmetic — the only per-row work is `lag` over one window, and the
window and the final groupBy share the partition key, so the whole
operator costs exactly one hash Exchange at any scale.

Cross-engine determinism: per-step great-circle distances are quantized
to integer micro-km (``round(km * 1e6)`` as BIGINT) BEFORE summing, the
same trick the HLL / quantile sketches use — integer sums are
order-independent, so a 1000-executor run bit-matches a single-thread
oracle.  Every derived ratio is then a division of exact integers
(IEEE-exact, no libm), so the only cross-engine float surface is the
trig inside one haversine per step, absorbed by the 1e-6 quantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geometry import haversine_km

#: quantization for distance sums: 1e-6 km = 1 mm precision.
KM_QUANT = 1_000_000


def _q_um(km: Column) -> Column:
    return F.round(km * KM_QUANT).cast("long")


def track_stats(
    df: DataFrame,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-entity movement statistics from a (user, ts, lon, lat) event
    table:

    ``n_events``     events observed,
    ``n_steps``      consecutive-pair hops (n_events − 1 per entity),
    ``total_km``     path length (sum of per-step haversine hops),
    ``max_step_km``  longest single hop (teleport / GPS-glitch signal),
    ``net_km``       straight-line first→last displacement,
    ``straightness`` net_km / total_km in [0, 1] (1 = beeline),
    ``avg_kmh``      total_km over elapsed first→last time.

    ``tiebreak`` orders equal timestamps deterministically (pass the
    event id); without it, duplicate-ts rows make the step sequence
    nondeterministic.  Single-event entities get 0 distances and NULL
    ratios.  One window + one groupBy on the same key → one Exchange.
    """
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user).orderBy(*order)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    us = F.unix_micros(F.col(ts).cast("timestamp"))
    plon = F.lag(lon).over(w)
    # Spark's least() SKIPS nulls, so the asin clamp inside haversine_km
    # would turn a null first-row lag into asin(1.0) — mask explicitly.
    step = F.when(
        plon.isNotNull(),
        haversine_km(plon, F.lag(lat).over(w), F.col(lon), F.col(lat)),
    )
    # Group on the ORIGINAL key column and rename only after the agg:
    # renaming before the groupBy (a Project between Window and
    # HashAggregate) stops Catalyst from recognising the window's hash
    # partitioning as satisfying the agg's requirement, costing a second
    # Exchange (observed on the executed plan).
    stepped = df.select(
        F.col(user),
        us.alias("_us"),
        _q_um(step).alias("_step_um"),
        (us - F.lag(us).over(w)).alias("_dt_us"),
        F.first(lon).over(w_all).alias("_lon0"),
        F.first(lat).over(w_all).alias("_lat0"),
        F.last(lon).over(w_all).alias("_lon1"),
        F.last(lat).over(w_all).alias("_lat1"),
    )
    agg = stepped.groupBy(F.col(user).alias("user")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("_step_um").alias("n_steps"),
        F.coalesce(F.sum("_step_um"), F.lit(0)).alias("_tot_um"),
        F.coalesce(F.max("_step_um"), F.lit(0)).alias("_max_um"),
        F.sum("_dt_us").alias("_dur_us"),
        _q_um(
            haversine_km(
                F.first("_lon0"), F.first("_lat0"), F.first("_lon1"), F.first("_lat1")
            )
        ).alias("_net_um"),
    )
    tot = F.col("_tot_um").cast("double")
    dur = F.col("_dur_us").cast("double")
    return agg.select(
        "user",
        "n_events",
        "n_steps",
        (tot / KM_QUANT).alias("total_km"),
        (F.col("_max_um").cast("double") / KM_QUANT).alias("max_step_km"),
        (F.col("_net_um").cast("double") / KM_QUANT).alias("net_km"),
        F.when(
            F.col("_tot_um") > 0, F.col("_net_um").cast("double") / tot
        ).alias("straightness"),
        F.when(
            F.col("_dur_us") > 0, (tot / KM_QUANT) / (dur / 3.6e9)
        ).alias("avg_kmh"),
    )


def track_interp(
    df: DataFrame,
    interval_s: int,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Resample each entity's track to a regular time grid: one output
    row per grid instant k·``interval_s`` inside [first_ts, last_ts],
    coordinates linearly interpolated between the surrounding fixes.
    The standard trajectory-alignment primitive (co-location joins,
    fixed-rate model inputs, map-matching pre-pass).

    Grid ownership is half-open — the segment (tᵢ, tᵢ₊₁) owns instants
    in [tᵢ, tᵢ₊₁); the final fix additionally owns an instant landing
    exactly on it — so every grid instant materializes EXACTLY once per
    entity: duplicate-ts fixes form zero-length segments that own
    nothing (``tiebreak`` makes their order, hence the interpolation
    endpoints, deterministic).

    Scale shape: ONE window over (user, ts) — the same single Exchange
    as :func:`track_stats` — then a map-only sequence/explode per
    segment; no self-join, no per-entity collect.  Output size is
    Σ spans/interval, independent of fix density.

    Determinism: all grid arithmetic is INTEGER epoch-micros (ceil by
    adjusted floor-div; floor-div as (a − a%b)/b, exact in float64
    because the true quotient is an integer < 2⁵³); the interpolation
    fraction divides two exact integer-valued doubles, so every output
    coordinate is a fixed IEEE expression tree replayable in SQL.
    """
    if interval_s <= 0:
        raise ValueError("interval_s must be positive")
    step = int(interval_s) * 1_000_000

    def idiv(c: Column) -> Column:
        return ((c - c % F.lit(step)) / F.lit(step)).cast("long")

    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user).orderBy(*order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))

    seg = df.select(
        F.col(user),
        us.alias("_t1"),
        F.col(lon).alias("_lon1"),
        F.col(lat).alias("_lat1"),
        F.lead(us).over(w).alias("_t2"),
        F.lead(lon).over(w).alias("_lon2"),
        F.lead(lat).over(w).alias("_lat2"),
    )
    lo = idiv(F.col("_t1") + F.lit(step - 1))          # ceil(t1/step)
    hi = idiv(F.col("_t2") + F.lit(step - 1)) - 1      # last k with k*step < t2
    ks = (
        F.when(F.col("_t2").isNotNull() & (lo <= hi), F.sequence(lo, hi))
        .when(
            F.col("_t2").isNull() & (F.col("_t1") % F.lit(step) == 0),
            F.array(idiv(F.col("_t1"))),
        )
        .otherwise(F.array().cast("array<long>"))
    )
    sampled = seg.select(
        F.col(user), "_t1", "_t2", "_lon1", "_lat1", "_lon2", "_lat2",
        F.explode(ks).alias("_k"),
    )
    t = F.col("_k") * F.lit(step)
    frac = F.when(
        F.col("_t2").isNotNull(),
        (t - F.col("_t1")).cast("double")
        / (F.col("_t2") - F.col("_t1")).cast("double"),
    ).otherwise(F.lit(0.0))
    return sampled.select(
        F.col(user),
        t.alias("sample_us"),
        (F.col("_lon1") + (F.coalesce("_lon2", "_lon1") - F.col("_lon1")) * frac).alias(lon),
        (F.col("_lat1") + (F.coalesce("_lat2", "_lat1") - F.col("_lat1")) * frac).alias(lat),
    )


def simplify_tracks(
    df: DataFrame,
    tolerance_deg: float,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Douglas–Peucker polyline simplification per entity: keep the
    minimal fix subset whose polyline stays within ``tolerance_deg``
    (perpendicular planar degree distance) of the original track.  The
    standard pre-step before storing/rendering/map-matching bulky GPS
    tracks.

    Not registered with a SQL oracle: RDP is a data-dependent recursion
    with no bounded SQL unrolling — coverage is the pytest suite
    (independent numpy reference, analytic goldens, invariances).

    Scale shape: one applyInPandas grouped on the entity key (one
    shuffle); memory is O(per-entity track length) — the same per-key
    bound every window over the track already implies.  Inside the
    kernel the split search is an explicit stack (no Python recursion
    limit) with numpy-vectorized segment distances.

    Determinism: ordering is (ts, tiebreak); distances compare exact
    IEEE doubles of a fixed expression; ties at the max deviation split
    at the FIRST (earliest) farthest point.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if tolerance_deg < 0:
        raise ValueError("tolerance_deg must be non-negative")
    tol2 = float(tolerance_deg) * float(tolerance_deg)

    out_schema = T.StructType(
        [
            df.schema[user],
            df.schema[ts],
            df.schema[lon],
            df.schema[lat],
        ]
    )

    def _keep_mask(xs: "np.ndarray", ys: "np.ndarray") -> "np.ndarray":
        n = len(xs)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[n - 1] = True
        stack = [(0, n - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
            px = xs[a + 1 : b]
            py = ys[a + 1 : b]
            dx, dy = bx - ax, by - ay
            seg2 = dx * dx + dy * dy
            if seg2 == 0.0:
                d2 = (px - ax) ** 2 + (py - ay) ** 2
            else:
                # perpendicular distance to the INFINITE line through a-b
                # (classic RDP; anchor points a/b are always kept so the
                # clamped-segment variant differs only on degenerate loops)
                cross = (px - ax) * dy - (py - ay) * dx
                d2 = (cross * cross) / seg2
            i = int(np.argmax(d2))  # first max on ties
            if d2[i] > tol2:
                m = a + 1 + i
                keep[m] = True
                stack.append((a, m))
                stack.append((m, b))
        return keep

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        order = [ts] + ([tiebreak] if tiebreak else [])
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        if len(pdf) <= 2:
            return pdf[[user, ts, lon, lat]]
        m = _keep_mask(
            pdf[lon].to_numpy(np.float64), pdf[lat].to_numpy(np.float64)
        )
        return pdf.loc[m, [user, ts, lon, lat]]

    return df.groupBy(user).applyInPandas(fn, schema=out_schema)


def simplify_tracks_vw(
    df: DataFrame,
    min_area2: int,
    rounds: int,
    track: str = "track_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Bounded Visvalingam–Whyatt polyline simplification — the
    ORACLE-BACKED member of the simplification family (its RDP sibling
    above is data-dependent recursion, pytest-only).

    Integer coords; per round, each track's interior vertex with the
    smallest (doubled triangle area, seq) is removed iff its doubled
    area |cross(prev→cur, prev→next)| < ``min_area2``; endpoints are
    never removed; AT MOST ONE removal per track per round, ``rounds``
    rounds.  The per-round cap is what makes the operator exactly
    SQL-unrollable (entry_queries ``simplify_vw`` replays each round as
    a window + anti-join CTE pair) while keeping classic VW behavior in
    the limit of enough rounds.  All arithmetic is int64 — exact.

    Scale shape: one applyInPandas grouped on the track key (one
    shuffle), O(track length × rounds) per task — tracks are bounded by
    the same per-key contract every track op here assumes.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if rounds < 0:
        raise ValueError("rounds must be non-negative")

    out_schema = T.StructType(
        [df.schema[track], df.schema[seq], df.schema[x], df.schema[y]]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq, kind="mergesort").reset_index(drop=True)
        xs = [int(v) for v in pdf[x]]
        ys = [int(v) for v in pdf[y]]
        ss = [int(v) for v in pdf[seq]]
        alive = list(range(len(pdf)))
        for _ in range(rounds):
            if len(alive) <= 2:
                break
            best = None  # (area2, seq, position-in-alive)
            for k in range(1, len(alive) - 1):
                p, c, n = alive[k - 1], alive[k], alive[k + 1]
                a2 = abs(
                    (xs[c] - xs[p]) * (ys[n] - ys[p])
                    - (ys[c] - ys[p]) * (xs[n] - xs[p])
                )
                if a2 < min_area2 and (best is None or (a2, ss[c]) < best[:2]):
                    best = (a2, ss[c], k)
            if best is None:
                break  # nothing qualifies now; nothing will later
            alive.pop(best[2])
        return pdf.iloc[alive][[track, seq, x, y]]

    return df.groupBy(track).applyInPandas(fn, schema=out_schema)


def od_matrix(
    df: DataFrame,
    x0: float,
    y0: float,
    extent: float,
    n_tiles: int,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Origin–destination flow matrix: each entity's FIRST and LAST fix
    (by ``ts``, ``tiebreak``-disambiguated) is snapped to an
    ``n_tiles × n_tiles`` grid over the square ``[x0, x0+extent) ×
    [y0, y0+extent)``, and flows are counted per (origin, destination)
    tile pair — the transport-planning / migration-analysis primitive.

    Output: ``o_tx, o_ty, d_tx, d_ty, n_users``, plus ``n_stationary``
    (entities whose origin tile == destination tile, a subtotal of
    ``n_users``).

    Scale shape: one window on the entity key (first/last fix), a
    groupBy on the SAME key (no second shuffle of the big table under
    AQE exchange reuse — every row of an entity carries identical
    first/last values, so ``min`` collapses them deterministically),
    then a groupBy on the tile pair — whose cardinality is at most
    n_tiles⁴, tiny.  Entirely column arithmetic; floor-snap is exact in
    float64 for grid-aligned bounds."""
    if n_tiles <= 0 or extent <= 0:
        raise ValueError("n_tiles and extent must be positive")
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = (
        Window.partitionBy(user)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )

    def tile(c: Column, origin: float) -> Column:
        t = F.floor((c - F.lit(origin)) / F.lit(extent) * F.lit(n_tiles))
        return F.least(F.greatest(t, F.lit(0)), F.lit(n_tiles - 1)).cast("long")

    # group on the ORIGINAL key column (the track_stats lesson: renaming
    # between Window and HashAggregate costs a second Exchange)
    ends = df.select(
        F.col(user),
        F.first(lon).over(w).alias("_lon0"),
        F.first(lat).over(w).alias("_lat0"),
        F.last(lon).over(w).alias("_lon1"),
        F.last(lat).over(w).alias("_lat1"),
    )
    per_user = ends.groupBy(user).agg(
        F.min("_lon0").alias("_lon0"),
        F.min("_lat0").alias("_lat0"),
        F.min("_lon1").alias("_lon1"),
        F.min("_lat1").alias("_lat1"),
    )
    od = per_user.select(
        tile(F.col("_lon0"), x0).alias("o_tx"),
        tile(F.col("_lat0"), y0).alias("o_ty"),
        tile(F.col("_lon1"), x0).alias("d_tx"),
        tile(F.col("_lat1"), y0).alias("d_ty"),
    )
    return od.groupBy("o_tx", "o_ty", "d_tx", "d_ty").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(
                (F.col("o_tx") == F.col("d_tx")) & (F.col("o_ty") == F.col("d_ty")), 1
            ).otherwise(0)
        ).alias("n_stationary"),
    )


def staypoints(
    df: DataFrame,
    max_speed_kmh: float,
    min_duration_s: float,
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    tiebreak: str | None = None,
) -> DataFrame:
    """Stop / stay-point detection over a (user, ts, lon, lat) fix table
    — the dwell-extraction primitive behind visit mining (Li et al. 2008
    semantics, re-expressed as a speed-threshold segmentation so it
    distributes as pure windows instead of a sequential anchor scan):

    * a fix is DWELLING if the great-circle speed of the step into it is
      ≤ ``max_speed_kmh`` (the first fix of an entity never is);
    * a stay group = one non-dwelling anchor fix plus the maximal run of
      consecutive dwelling fixes after it (gaps-and-islands: the island
      id is the running count of non-dwelling fixes in ts order);
    * a group is a STAYPOINT if it spans ≥ 2 fixes and its
      first→last duration ≥ ``min_duration_s``.

    Output per staypoint: ``user, stay_id`` (the island ordinal within
    the user), ``start_ts, end_ts, duration_s`` (exact integer
    micro-second diff / 1e6), ``n_fixes``, and the centroid
    ``lon_c / lat_c`` — means of integer micro-degree fixes, so the sums
    are order-independent and the result bit-matches any SQL replay.

    Scale shape: ONE window Exchange on the entity key (lag + running
    sum share the same ordering) and one groupBy on (user, island) —
    O(active fixes) state, no self-join, no applyInPandas."""
    if max_speed_kmh <= 0 or min_duration_s <= 0:
        raise ValueError("max_speed_kmh and min_duration_s must be positive")
    order = [F.col(ts)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(user).orderBy(*order)
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    plon = F.lag(lon).over(w)
    # mask the null lag explicitly — Spark's least() inside haversine_km
    # SKIPS nulls, so an unmasked first row would clamp to asin(1.0)
    step_km = F.when(
        plon.isNotNull(), haversine_km(plon, F.lag(lat).over(w), F.col(lon), F.col(lat))
    )
    dt_us = us - F.lag(us).over(w)
    speed = step_km / (dt_us.cast("double") / F.lit(3600000000.0))
    dwell = F.when(
        speed.isNotNull() & (dt_us > 0) & (speed <= F.lit(max_speed_kmh)), 1
    ).otherwise(0)
    marked = df.select(
        F.col(user),
        F.col(ts).alias("_ts"),
        us.alias("_us"),
        F.round(F.col(lon) * F.lit(1000000.0)).cast("long").alias("_lon_ud"),
        F.round(F.col(lat) * F.lit(1000000.0)).cast("long").alias("_lat_ud"),
        F.sum(F.lit(1) - dwell)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("stay_id"),
    )
    grp = marked.groupBy(F.col(user).alias("user"), F.col("stay_id")).agg(
        F.min("_ts").alias("start_ts"),
        F.max("_ts").alias("end_ts"),
        (F.max("_us") - F.min("_us")).alias("_dur_us"),
        F.count(F.lit(1)).alias("n_fixes"),
        F.sum("_lon_ud").alias("_slon"),
        F.sum("_lat_ud").alias("_slat"),
    )
    dur_us = F.col("_dur_us")
    out = grp.select(
        "user",
        "stay_id",
        "start_ts",
        "end_ts",
        (dur_us.cast("double") / F.lit(1000000.0)).alias("duration_s"),
        "n_fixes",
        (F.col("_slon").cast("double") / F.col("n_fixes") / F.lit(1000000.0)).alias(
            "lon_c"
        ),
        (F.col("_slat").cast("double") / F.col("n_fixes") / F.lit(1000000.0)).alias(
            "lat_c"
        ),
    )
    return out.where(
        (F.col("n_fixes") >= 2) & (F.col("duration_s") >= F.lit(float(min_duration_s)))
    )


def track_similarity(
    df: DataFrame,
    pairs: DataFrame,
    metric: str = "frechet",
    user: str = "user_id",
    ts: str = "ts",
    lon: str = "lon",
    lat: str = "lat",
    a: str = "user_a",
    b: str = "user_b",
    max_len: int = 8_000,
) -> DataFrame:
    """(a, b, n_a, n_b, dist_km) — trajectory similarity between the
    CANDIDATE entity pairs in ``pairs``: discrete Fréchet distance
    (Eiter & Mannila 1994 — the max leash length walking both tracks
    monotonically) or DTW (sum of matched great-circle distances along
    the cheapest monotone alignment).  The matcher behind "same
    commute?" / trajectory clustering / map-matching validation.

    Scale shape: NEVER all-pairs — the caller supplies candidates (from
    staypoint overlap, OD cells, or an LSH block; the same contract as
    the dedup family).  One groupBy packs each track into a ts-sorted
    array (one Exchange), two broadcast-or-hash joins attach the packed
    tracks to the pairs, and ONE Arrow-batched pandas UDF runs the
    O(n·m) rolling-row DP per pair — work is per-pair independent, no
    driver participation, memory O(min(n, m)) per pair.  ``max_len``
    guards the quadratic kernel against runaway tracks (raise it
    deliberately, or pre-simplify with :func:`simplify_tracks`).

    Determinism: each pair's DP is a single-threaded fixed-order IEEE
    evaluation of one expression shape (numpy float64 haversine on the
    same mean-sphere constant as the column kernels), so results are
    partition-invariant; no SQL oracle exists for a data-dependent DP —
    coverage is brute-recursive numpy parity in pytest (the protocol
    VERDICT r5 set for this family)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    if metric not in ("frechet", "dtw"):
        raise ValueError("metric must be 'frechet' or 'dtw'")

    packed = df.groupBy(F.col(user).alias("_u")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts), F.col(lon), F.col(lat)))
        ).alias("_trk")
    )
    joined = (
        pairs.select(F.col(a).alias("_a"), F.col(b).alias("_b"))
        .join(packed.select(F.col("_u").alias("_a"), F.col("_trk").alias("_ta")), "_a")
        .join(packed.select(F.col("_u").alias("_b"), F.col("_trk").alias("_tb")), "_b")
    )
    # per-pair DP work is independent and heavy; AQE's size-based
    # coalescing sees a few KB of packed arrays and serializes every DP
    # onto one core — pin the pair table to the session parallelism
    # before the Arrow stage (results are partition-invariant, pinned
    # in tests/test_trajectory.py; at cluster scale this exchange moves
    # only packed candidate pairs, already the small side)
    joined = joined.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "_a", "_b"
    )

    key_t = pairs.schema[a].dataType
    out_schema = T.StructType(
        [
            T.StructField(a, key_t),
            T.StructField(b, pairs.schema[b].dataType),
            T.StructField("n_a", T.LongType()),
            T.StructField("n_b", T.LongType()),
            T.StructField("dist_km", T.DoubleType()),
        ]
    )
    is_frechet = metric == "frechet"

    def _xy(track) -> "tuple[np.ndarray, np.ndarray]":
        lons = np.array([p[lon] for p in track], dtype=np.float64)
        lats = np.array([p[lat] for p in track], dtype=np.float64)
        return lons, lats

    def _hav_row(lon0, lat0, lons, lats):
        # numpy twin of functions/geometry.py::haversine_km (same
        # 2*6371.0088 constant, same sqrt clamp)
        dphi = np.radians(lats - lat0)
        dlmb = np.radians(lons - lon0)
        h = (
            np.sin(dphi / 2) ** 2
            + np.cos(np.radians(lat0)) * np.cos(np.radians(lats))
            * np.sin(dlmb / 2) ** 2
        )
        return 12742.0176 * np.arcsin(np.minimum(1.0, np.sqrt(h)))

    def _hav_row_pairs(lons0, lats0, lons, lats):
        # elementwise twin of _hav_row (arrays on both sides — the same
        # IEEE expression per element, so values are identical)
        dphi = np.radians(lats - lats0)
        dlmb = np.radians(lons - lons0)
        h = (
            np.sin(dphi / 2) ** 2
            + np.cos(np.radians(lats0)) * np.cos(np.radians(lats))
            * np.sin(dlmb / 2) ** 2
        )
        return 12742.0176 * np.arcsin(np.minimum(1.0, np.sqrt(h)))

    def _dp(ta, tb) -> float:
        # Anti-diagonal vectorized DP (r8): cells on diagonal i+j=k
        # depend only on diagonals k−1 and k−2, so each diagonal is one
        # numpy step — n+m vector ops instead of n·m Python iterations
        # (profiled: the rolling-row loop was a 2.9 s single-task
        # stage).  Every cell still evaluates the IDENTICAL expression
        # on the identical operands (min/max picks and one add for
        # DTW), so values are bit-equal to the rolling-row loop —
        # pinned against the brute recursion in tests/test_trajectory.
        ax, ay = _xy(ta)
        bx, by = _xy(tb)
        n, m = len(ax), len(bx)
        if n * m > max_len * max_len:
            raise ValueError(
                f"track pair DP size {n}x{m} exceeds max_len={max_len}^2; "
                "pre-simplify or raise max_len"
            )
        INF = np.inf
        prev2 = prev1 = None  # (values, i_offset) of diagonals k-2, k-1
        for k in range(n + m - 1):
            i0 = max(0, k - m + 1)
            i1 = min(k, n - 1)
            ii = np.arange(i0, i1 + 1)
            jj = k - ii
            d = _hav_row_pairs(ax[ii], ay[ii], bx[jj], by[jj])

            def gather(diag, idx):
                if diag is None:
                    return np.full(ii.size, INF)
                vals, off = diag
                pos = idx - off
                ok = (pos >= 0) & (pos < vals.size)
                return np.where(ok, vals[np.clip(pos, 0, vals.size - 1)], INF)

            up = gather(prev1, ii - 1)      # (i-1, j)
            left = gather(prev1, ii)        # (i, j-1)
            diag = gather(prev2, ii - 1)    # (i-1, j-1)
            best = np.minimum(np.minimum(diag, up), left)
            best = np.where((ii == 0) & (jj == 0), 0.0, best)
            # boundary rows/cols have exactly one predecessor; the min
            # over {existing, INF, INF} selects it, matching the loop
            cur = np.maximum(d, best) if is_frechet else d + best
            prev2, prev1 = prev1, (cur, i0)
        # the last diagonal (k = n+m−2) holds exactly the (n−1, m−1) cell
        return float(prev1[0][-1])

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            out = {
                a: pdf["_a"],
                b: pdf["_b"],
                "n_a": pdf["_ta"].map(len).astype("int64"),
                "n_b": pdf["_tb"].map(len).astype("int64"),
                "dist_km": [
                    _dp(ta, tb) for ta, tb in zip(pdf["_ta"], pdf["_tb"])
                ],
            }
            yield pd.DataFrame(out)

    return joined.mapInPandas(fn, schema=out_schema)
