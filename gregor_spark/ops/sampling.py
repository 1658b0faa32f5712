"""Deterministic sampling operators for training-data pipelines.

Engine-style `.sample()` is seed-dependent on partitioning: the same row
can be kept on one run and dropped on the next whenever the scan order
changes (AQE, file splits, cluster size).  Training-data curation needs
the opposite contract — membership decided by the ROW, not the plan — so
these operators hash a stable key column (md5, same idiom as
ops/dedup.py's shingle hash) into a bucket in [0, n_buckets) and keep the
row iff its bucket clears the stratum's rate.  Properties that matter at
100 TB:

* map-only — a pure filter expression, no shuffle, no state, trivially
  resumable and identical on any cluster size (the same property the
  exact-dedup keep rule relies on);
* stratified — per-stratum integer rates (basis points of ``n_buckets``)
  rebalance skewed corpora (e.g. downsample the 'en' firehose, keep all
  of a rare language) in one pass;
* nested — because membership is a prefix predicate on the bucket
  (``bucket < rate``), a 5% sample is a strict subset of a 20% sample
  with the same salt, so growing a dataset never invalidates a smaller
  published slice.

Rates are INTEGERS in bucket units (not floats) so the keep predicate is
pure int comparison — bit-identical across Spark, the DuckDB oracle, and
any future engine (float rate * n_buckets would hang the boundary bucket
on rounding mode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, salt: str, n_buckets: int = 10000) -> Column:
    """Deterministic bucket in [0, n_buckets): first 60 bits of
    md5(salt || key) mod n_buckets.  Salt isolates independent samples —
    two samples with different salts are uncorrelated."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h % F.lit(n_buckets)


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    key_col: str,
    default_rate: int = 0,
    salt: str = "strat",
    n_buckets: int = 10000,
) -> DataFrame:
    """Keep each row iff ``hash_bucket(key) < rates[stratum]``.

    ``rates`` maps stratum value → kept buckets out of ``n_buckets``
    (2000/10000 = 20%).  Unlisted strata fall back to ``default_rate``
    (0 = drop, n_buckets = keep all).  Adds a ``bucket`` column so
    downstream audits can verify membership without re-hashing.
    """
    for name, r in rates.items():
        if not 0 <= r <= n_buckets:
            raise ValueError(f"rate for {name!r} is {r}, not in [0, {n_buckets}]")
    pairs = [x for kv in rates.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs), F.col(strata_col)),
        F.lit(int(default_rate)),
    )
    bucket = hash_bucket(F.col(key_col), salt, n_buckets)
    return df.withColumn("bucket", bucket).where(F.col("bucket") < rate)


def sample_weighted(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    by: list[str] | None = None,
    salt: str = "wres",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group, deterministic
    (Efraimidis–Spirakis A-ES): each row gets priority ``u**(1/w)`` with
    ``u`` hash-uniform in (0, 1]; the k largest priorities per group are
    an exact weighted sample without replacement.  Ordering happens in
    the monotone-equivalent log domain (``ln(u)/w``, larger = keep) to
    skip the pow() call.  Membership is a pure function of (salt, key,
    weight) — stable under repartitioning, AQE, cluster size, appends of
    other rows' files — the same contract as :func:`sample_stratified`,
    which A-ES generalizes from per-stratum rates to per-ROW weights.

    Rows with weight <= 0 or NULL are never sampled (dropped up front).
    Scale shape: one window top-k per group — Spark's WindowGroupLimit
    pushes the k-filter below the shuffle, so each partition ships at
    most k rows per group instead of the group.

    Output adds ``rn`` (1-based weighted rank).  Float priorities stay
    internal: the emitted columns are the input's, so cross-engine
    parity only needs the ORDERING to agree (ties broken by key).
    """
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))  # (0, 1]
    pri = F.log(u) / F.col(weight_col).cast("double")
    win = (
        Window.partitionBy(*(by or []))
        .orderBy(pri.desc(), F.col(key_col))
    )
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") <= k)
    )


def sample_weighted_sql(
    k: int,
    weight_col: str,
    key_col: str,
    cols: str,
    by: str = "",
    salt: str = "wres",
    src: str = "src",
) -> str:
    """DuckDB oracle twin of :func:`sample_weighted` over CTE ``src``:
    same hash, same log-domain priority, same tie-break."""
    part = f"PARTITION BY {by} " if by else ""
    u = (
        f"(CAST(('0x' || substr(md5('{salt}' || CAST({key_col} AS VARCHAR)), 1, 15))"
        f" AS BIGINT) + 1) / {float(1 << 60)!r}"
    )
    return f"""
SELECT {cols}, rn FROM (
  SELECT {cols},
         row_number() OVER (
           {part}ORDER BY ln({u}) / CAST({weight_col} AS DOUBLE) DESC, {key_col}
         ) AS rn
  FROM {src} WHERE {weight_col} > 0
) WHERE rn <= {k}
"""


def sample_quota(
    df: DataFrame,
    group_col: str,
    key_col: str,
    quotas: dict[str, int] | None = None,
    total: int | None = None,
    temperature: float | None = None,
    salt: str = "quota",
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """Data-mixing sampler — deterministically downsample each group to
    a TARGET SHARE of the output corpus (the mixture-reweighting step
    of every multi-source pretraining pipeline; temperature form per
    multilingual-sampling practice, e.g. XLM-R's α-smoothing).

    Two modes (exactly one):

    * ``quotas={group: target_count}`` — explicit per-group targets;
    * ``total=N, temperature=α`` — group g gets quota
      N · n_g^α / Σ_h n_h^α: α=1 keeps natural proportions, α→0 flattens
      toward uniform, α between upsamples the tail (relatively).

    Membership is the portable md5 hash-bucket rule (`hash_bucket`):
    keep iff bucket < floor(min(1, quota/n_g)·n_buckets) — a pure
    function of (salt, key), so the sample is identical at any
    parallelism and stable under appends of OTHER groups' rows.
    Weights n^α are quantized to integers (floor(n^α·2²⁰)) before the
    Σ so the normalizing sum is order-independent and the whole rate
    chain is a fixed IEEE expression tree a SQL oracle replays exactly
    (α ∈ {0, 0.5, 1, 2} avoid libm pow entirely: 1/sqrt/square).

    Scale shape: one tiny groupBy-count (partial-agg; |groups| rows), a
    1-row sum cross-join broadcast, a broadcast join back on the group
    key, then a map-only filter — the corpus is touched in one pass and
    never shuffled."""
    if (quotas is None) == (total is None and temperature is None):
        raise ValueError("pass exactly one of quotas= or (total=, temperature=)")
    g = F.col(group_col)
    counts = df.groupBy(g.alias("_g")).agg(F.count("*").alias("_n"))
    if quotas is not None:
        qmap = F.create_map(
            *[F.lit(x) for kv in quotas.items() for x in kv]
        )
        quota = F.coalesce(qmap[F.col("_g")], F.lit(0)).cast("double")
        rates = counts.select(
            "_g",
            F.least(F.lit(1.0), quota / F.col("_n")).alias("_rate"),
        )
    else:
        if total is None or temperature is None:
            raise ValueError("temperature mode needs both total= and temperature=")
        a = float(temperature)
        n_d = F.col("_n").cast("double")
        if a == 0.0:
            w = F.lit(1.0)
        elif a == 0.5:
            w = F.sqrt(n_d)
        elif a == 1.0:
            w = n_d
        elif a == 2.0:
            w = n_d * n_d
        else:
            w = F.pow(n_d, F.lit(a))
        wq = F.floor(w * F.lit(1 << 20)).cast("long")
        cw = counts.select("_g", "_n", wq.alias("_wq"))
        sw = cw.agg(F.sum("_wq").alias("_sw"))
        rates = cw.crossJoin(F.broadcast(sw)).select(
            "_g",
            F.least(
                F.lit(1.0),
                (F.lit(float(total)) * F.col("_wq") / F.col("_sw"))
                / F.col("_n"),
            ).alias("_rate"),
        )
    thr = F.floor(F.col("_rate") * F.lit(n_buckets)).cast("long")
    rates = rates.select("_g", thr.alias("_thr"))
    keep = hash_bucket(F.col(key_col), salt, n_buckets) < F.col("_thr")
    return (
        df.join(F.broadcast(rates), g == F.col("_g"))
        .where(keep)
        .drop("_g", "_thr")
    )
