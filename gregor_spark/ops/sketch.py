"""Mergeable cardinality sketches: HyperLogLog with CROSS-ENGINE
bit-exact registers.

Why not ``approx_count_distinct``: Spark's HLL++ and DuckDB's
``approx_distinct`` use different hash functions and bias tables, so
their estimates can never hash-match an oracle — and neither exposes
the registers, which are the actual mergeable/persistable artifact a
100 TB pipeline stores per partition and ORs together at rollup time.
This implementation derives everything from the same 60-bit md5 hash
both engines compute identically (the package's standard portable hash,
ops/dedup.py minhash), so registers, register sums, and the final
Flajolet-et-al. estimate are reproducible bit-for-bit anywhere.

Register layout (p bucket bits, m = 2**p buckets over a 60-bit hash):
``bucket = h mod m``, ``w = h >> p`` (a (60-p)-bit window), ``rho =
(60-p) + 1 - bit_length(w)`` = leading zeros in the window + 1.  w = 0
maps to bit_length 1 (both engines render '0' with length 1), i.e. rho
= 60-p rather than the theoretically-correct 61-p; the case has
probability 2**-(60-p) per value and both engines agree, so parity
holds and the estimator bias is unmeasurable.

The register sum is computed IN THE INTEGER DOMAIN: each bucket
contributes ``2**(S_BITS - rho)`` (empty buckets ``2**S_BITS``), so the
aggregate is an exact BIGINT no matter the aggregation order — the
float ``sum(2^-rho)`` of the textbook formulation is
ulp-order-dependent and would break cross-engine hashing.  Only the
final estimate touches doubles (one division + the small-range ``m *
ln(m/zeros)`` correction), rounded to 6 dp because libm ``ln`` may
differ in the last ulp across engines.

At scale: one explode-free map (hash/bucket/rho are column exprs), one
partial-agg groupBy (key, bucket) max — the shuffle carries at most
``groups × m`` rows regardless of input size — then a groups-sized
rollup.  Sketch merge between shards is the same max-by-bucket groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

H_BITS = 60  # md5-prefix portable hash width


def _hash60(col):
    """The package's portable 60-bit hash: first 15 md5 hex chars.
    DuckDB twin: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hll_registers(
    df: DataFrame, col: str, p: int = 9, by: list[str] | None = None
) -> DataFrame:
    """Occupied HLL registers: (``*by``, bucket, rho) with rho maxed per
    bucket.  This IS the sketch — persist it, merge shards by the same
    groupBy-max, feed it to :func:`hll_estimate_from_registers`."""
    m = 1 << p
    w_bits = H_BITS - p
    h = _hash60(F.col(col))
    keyed = df.select(
        *(by or []),
        (h % m).cast("int").alias("bucket"),
        (
            F.lit(w_bits + 1)
            - F.length(F.conv(F.shiftright(h, p).cast("string"), 10, 2))
        ).cast("int").alias("rho"),
    )
    return keyed.groupBy(*(by or []), "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate_from_registers(
    reg: DataFrame, p: int = 9, by: list[str] | None = None
) -> DataFrame:
    """(``*by``, occupied, zeros, s_int, est_r) from a register table.

    ``s_int`` = Σ 2**(S_BITS − rho) over all m buckets (empty → full
    weight) — an exact integer, order-independent.  ``est_r`` is the
    standard HLL estimate with small-range linear counting, rounded 6dp.
    """
    m = 1 << p
    s_bits = H_BITS - p + 1  # max rho, so 2**(s_bits - rho) >= 1
    # 512 * 2**52 = 2**61 < 2**63: BIGINT-safe at p=9
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {s_bits} - rho)")
    agg = reg.groupBy(*(by or [])).agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(term).alias("s_occ"),
    )
    zeros = (F.lit(m) - F.col("occupied")).alias("zeros")
    full = F.expr(f"shiftleft(CAST(1 AS BIGINT), {s_bits})")
    s_int = (F.col("s_occ") + (F.lit(m) - F.col("occupied")) * full).alias("s_int")
    alpha = 0.7213 / (1.0 + 1.079 / m)
    out = agg.select(*(by or []), "occupied", zeros, s_int)
    raw = (
        F.lit(alpha)
        * F.lit(float(m * m))
        * F.lit(float(1 << s_bits))
        / F.col("s_int").cast("double")
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros").cast("double")),
    ).otherwise(raw)
    return out.select(
        *(by or []), "occupied", "zeros", "s_int", F.round(est, 6).alias("est_r")
    )


def hll_distinct(
    df: DataFrame, col: str, p: int = 9, by: list[str] | None = None
) -> DataFrame:
    """End-to-end distinct-count sketch, optionally per group."""
    return hll_estimate_from_registers(hll_registers(df, col, p, by), p, by)


def hll_sql(expr: str, p: int = 9, by: str = "", src: str = "src") -> str:
    """DuckDB oracle twin of :func:`hll_distinct` over CTE ``src`` —
    the SAME hash, register, integer-sum, and estimate expressions, so
    results hash-match bit-for-bit (est_r to 6 dp)."""
    m = 1 << p
    w_bits = H_BITS - p
    s_bits = w_bits + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    sel_by = f"{by}, " if by else ""
    grp_by = f"GROUP BY {by}" if by else ""
    grp_by2 = f"GROUP BY {sel_by}bucket" if by else "GROUP BY bucket"
    # NB: a bare 16-digit literal parses as DECIMAL(18) in DuckDB (and
    # then overflows the estimate arithmetic); force DOUBLE explicitly
    alpha_sql = f"CAST({alpha!r} AS DOUBLE)"
    return f"""
hashed AS (
  SELECT {sel_by}
         CAST(h % {m} AS INT) AS bucket,
         CAST({w_bits + 1} - length(bin(h >> {p})) AS INT) AS rho
  FROM (SELECT {sel_by}
               CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) AS h
        FROM {src})
),
regs AS (SELECT {sel_by}bucket, max(rho) AS rho FROM hashed {grp_by2}),
rolled AS (
  SELECT {sel_by}
         count(*) AS occupied,
         CAST(sum(CAST(1 AS BIGINT) << ({s_bits} - rho)) AS BIGINT) AS s_occ
  FROM regs {grp_by}
),
est AS (
  SELECT {sel_by}occupied,
         {m} - occupied AS zeros,
         s_occ + ({m} - occupied) * (CAST(1 AS BIGINT) << {s_bits}) AS s_int
  FROM rolled
)
SELECT {sel_by}occupied, zeros, s_int,
       round(CASE WHEN ({alpha_sql} * {float(m * m)!r} * {float(1 << s_bits)!r}
                        / CAST(s_int AS DOUBLE)) <= {2.5 * m!r} AND zeros > 0
                  THEN {float(m)!r} * ln({float(m)!r} / CAST(zeros AS DOUBLE))
                  ELSE {alpha_sql} * {float(m * m)!r} * {float(1 << s_bits)!r}
                       / CAST(s_int AS DOUBLE)
             END, 6) AS est_r
FROM est
"""


# ------------------------------------------------------------ count-min


def cms_build(
    df: DataFrame, col: str, d: int = 4, w: int = 1024, weight: str | None = None
) -> DataFrame:
    """Count-min sketch: (j, bucket, cnt) for ``d`` hash rows of ``w``
    buckets.  Entirely integer — build, merge (sum by (j, bucket)), and
    query are exact and order-independent, so the sketch is bit-identical
    on any engine/partitioning with no rounding escape hatch needed.
    The shuffle is bounded at d×w rows regardless of input size; point
    estimates upper-bound true counts (one-sided error ≤ e·N/w with
    probability 1−e^−d).  ``weight`` sums that column instead of 1s."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    _hash60(F.concat(F.lit(f"cms{j}"), F.col(col).cast("string")))
                    % w
                ).cast("int").alias("bucket"),
            )
            for j in range(d)
        ]
    )
    wcol = F.col(weight) if weight else F.lit(1)
    return (
        df.select(F.explode(rows).alias("r"), wcol.cast("long").alias("_w"))
        .groupBy(F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame, probes: DataFrame, col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Point-query: min over the d rows (missing bucket = 0).  One
    broadcast-sized join — the sketch is ≤ d×w rows by construction."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    _hash60(F.concat(F.lit(f"cms{j}"), F.col(col).cast("string")))
                    % w
                ).cast("int").alias("bucket"),
            )
            for j in range(d)
        ]
    )
    ex = probes.select(col, F.explode(rows).alias("r")).select(
        col, F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket")
    )
    return (
        ex.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


# ---------------------------------------------------------- bloom filter


def _bloom_slot(col: str, j: int, m_bits: int):
    """(word, mask) for hash function ``j`` of the Bloom family.  The bit
    position is the package 60-bit md5 hash mod ``m_bits``; NOTE the mask
    must use Spark's ``conv(hex, 16, 10)`` — a DuckDB-style
    ``CAST('0x…' AS BIGINT)`` silently yields NULL in Spark."""
    pos = _hash60(F.concat(F.lit(f"bf{j}"), F.col(col).cast("string"))) % m_bits
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST("
        f"CAST(conv(substr(md5(concat('bf{j}', CAST({col} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        f" % {m_bits} % 32 AS INT))"
    )
    return F.struct((pos / 32).cast("int").alias("word"), mask.alias("mask"))


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 16384, k: int = 4
) -> DataFrame:
    """Bloom filter as a (word, bits) table: ``m_bits`` bits packed into
    32-bit words (32 so the per-word mask arithmetic stays far from
    BIGINT sign overflow on every engine), ``k`` hash functions from the
    portable md5 family.  Entirely integer: build, merge (bit_or by
    word), and membership are bit-exact anywhere.  The table is at most
    ``m_bits/32`` rows — the shuffle bound — and the classic use at
    100 TB is shipping it broadcast as a pre-filter for a semi-join
    whose build side is too large to broadcast raw but whose KEY SET
    fits a few KB of bits (false positives only cost extra probe rows;
    no false negatives, verified by construction in tests)."""
    rows = F.array(*[_bloom_slot(col, j, m_bits) for j in range(k)])
    return (
        df.select(F.explode(rows).alias("r"))
        .groupBy(F.col("r.word").alias("word"))
        .agg(F.expr("bit_or(r.mask)").alias("bits"))
    )


def bloom_contains(
    sketch: DataFrame, probes: DataFrame, col: str, m_bits: int = 16384, k: int = 4
) -> DataFrame:
    """(probe, maybe_present): true iff every one of the k bits is set —
    no false negatives; false-positive rate ~ (1 - e^{-kn/m})^k.  One
    broadcast join against the ≤ m_bits/32-row sketch."""
    slots = F.array(*[_bloom_slot(col, j, m_bits) for j in range(k)])
    ex = probes.select(col, F.explode(slots).alias("r")).select(
        col, F.col("r.word").alias("word"), F.col("r.mask").alias("mask")
    )
    return (
        ex.join(F.broadcast(sketch), ["word"], "left")
        .groupBy(col)
        .agg(F.expr("bool_and(bits IS NOT NULL AND (bits & mask) = mask)").alias("maybe_present"))
    )


# ------------------------------------------------ theta (KMV bottom-k)

#: hash-space size for the 60-bit portable hash (theta normalization).
H_SPACE = float(1 << 60)


def theta_sketch(
    df: DataFrame, col: str, k: int = 64, by: list[str] | None = None
) -> DataFrame:
    """KMV / theta sketch (Bar-Yossef et al. 2002; the DataSketches
    theta family): the ``k`` SMALLEST distinct 60-bit portable hashes of
    ``col`` — (``*by``, ``hs`` sorted array<long>, ``nd`` = |hs|).

    Unlike HLL this sketch supports INTERSECTION (and difference)
    estimates, because it is a uniform sample of the distinct hash
    space below a known threshold.  Fully deterministic: bottom-k of a
    set is order- and partition-independent, so the sketch (and every
    estimate derived from it) is bit-identical at any parallelism and
    exactly replayable in SQL — no engine-private hash, no bias table
    (the HLL lesson at the top of this module).

    Scale shape: one distinct (the same Exchange any distinct-count
    pays); then bottom-k.  Ungrouped: ``orderBy(h).limit(k)`` is
    TakeOrderedAndProject — each partition ships only its local k, no
    global sort.  Grouped: one row_number window per group key.
    Merging shards is union → distinct → bottom-k of the arrays
    (:func:`theta_union_estimate` does exactly this with array ops)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    h = _hash60(F.col(col).cast("string"))
    if by:
        d = df.select(*by, h.alias("h")).distinct()
        w = Window.partitionBy(*by).orderBy("h")
        top = d.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
        return top.groupBy(*by).agg(
            F.array_sort(F.collect_list("h")).alias("hs"),
            F.count(F.lit(1)).alias("nd"),
        )
    d = df.select(h.alias("h")).distinct().orderBy("h").limit(k)
    return d.agg(
        F.array_sort(F.collect_list("h")).alias("hs"),
        F.count(F.lit(1)).alias("nd"),
    )


def theta_estimate(hs, k: int):
    """Distinct-count estimate column from a bottom-k hash array: exact
    |hs| when the set never filled the sketch, else the KMV estimator
    (k−1) / (h_k / 2^60) — one fixed-order float division chain."""
    nd = F.size(hs)
    u = F.element_at(hs, k).cast("double") / F.lit(H_SPACE)
    return F.when(nd < k, nd.cast("double")).otherwise(F.lit(float(k - 1)) / u)


def _theta_threshold(hs, k: int):
    """θ as an INTEGER hash bound: h_k when the sketch is full, else
    2^60 (every hash was kept)."""
    return F.when(F.size(hs) == k, F.element_at(hs, k)).otherwise(
        F.lit(1 << 60)
    )


def theta_set_estimates(
    a: DataFrame, b: DataFrame, col: str, k: int = 64
) -> DataFrame:
    """One row of set-expression cardinality estimates between two
    frames' ``col`` value sets: ``n_a_est, n_b_est, union_est,
    inter_est`` (+ ``ka, kb, rho`` diagnostics).

    Union = bottom-k of the merged hash arrays (the mergeability
    property).  Intersection = the theta rule: θ = min(θ_a, θ_b) as an
    integer bound, ρ = |common hashes below θ|, estimate ρ/θ̂.  All set
    algebra is integer array ops on ≤ k elements; floats appear only in
    the final fixed-order divisions — SQL-replayable bit-for-bit."""
    sa = theta_sketch(a, col, k).select(
        F.col("hs").alias("a_hs"), F.col("nd").alias("ka")
    )
    sb = theta_sketch(b, col, k).select(
        F.col("hs").alias("b_hs"), F.col("nd").alias("kb")
    )
    both = sa.crossJoin(sb)
    u_hs = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("a_hs"), F.col("b_hs")))), 1, k
    )
    theta = F.least(
        _theta_threshold(F.col("a_hs"), k), _theta_threshold(F.col("b_hs"), k)
    )
    below = lambda arr: F.filter(arr, lambda x: x < theta)  # noqa: E731
    rho = F.size(F.array_intersect(below(F.col("a_hs")), below(F.col("b_hs"))))
    inter = rho.cast("double") / (theta.cast("double") / F.lit(H_SPACE))
    return both.select(
        "ka",
        "kb",
        rho.alias("rho"),
        F.round(theta_estimate(F.col("a_hs"), k), 6).alias("n_a_est"),
        F.round(theta_estimate(F.col("b_hs"), k), 6).alias("n_b_est"),
        F.round(theta_estimate(u_hs, k), 6).alias("union_est"),
        F.round(inter, 6).alias("inter_est"),
    )
