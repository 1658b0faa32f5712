"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` = total wall seconds over the headline set (lower is better).
Also reports docs/sec for the north-rule tile-assignment pipeline in
"queries" as "north_docs_per_sec" (higher is better, informational).

Scaling-efficiency evidence (north rule, N vs 4N):
  python bench.py --scaling     # runs the pipeline at local[8] and
                                # local[32], prints both rates + efficiency
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: the operators that exercise each engine layer
HEADLINE = [
    "doc_tiles",        # Morton UDF + salted spatial hash join
    "doc_tile_hist",    # + rollup
    "knn_docs",         # broadcast kNN
    "disagg_raster_2x2",  # assignment + norm + apportion
    "zonal_stats_3x3",  # zonal aggregation
    "dedup_exact",
    "minhash_sig",
    "lsh_pairs",
    "simhash",
    "token_count",
    "text_quality",
    "fingerprint",
    "cosine_topk",
    "tpch_q1",
    "tpch_q3ish",
    "events_window",
    "events_sessions",
    "coarsen_2x2",
    "tile_rollup",
    "jaccard_pairs",
    "jaccard_capped",     # df-capped candidates + exact rescore
    "embedding_near_dup",  # exact distributed block-pair sweep
    "near_dup_lsh",        # sub-quadratic LSH-blocked sweep
    "ann_lsh",             # multiprobe LSH top-k
    "knn_cell_join",       # distributed kNN (coarsening escalation)
    "media_features",      # binary payload decode plumbing
    "north_pipeline",      # doc->span->salted-join->histogram (sf-scale)
]

NORTH_DOCS = int(os.environ.get("SPARK_GRAFT_NORTH_DOCS", "2000000"))
BOUNDS = (-0.25, 9.75, 1.75, 11.75)
CORPUS_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench")


def _corpus_path(n_docs: int) -> str:
    return os.path.join(CORPUS_ROOT, f"corpus_{n_docs}")


def ensure_corpus(spark, n_docs: int) -> str:
    """Materialize the synthetic interleaved corpus ONCE as an
    Iceberg-shaped bucketed parquet table (the north rule's input is an
    Iceberg table; generation cost is data-prep, not pipeline throughput)."""
    from gregor_spark.sources.documents import generate_documents
    from gregor_spark.sources.iceberg_like import MANIFEST, write_table

    path = _corpus_path(n_docs)
    if not os.path.exists(os.path.join(path, MANIFEST)):
        docs = generate_documents(
            spark, n_docs, BOUNDS, seed=42, skew=0.2, partitions=64
        )
        write_table(docs, path, bucket_by="doc_id", n_buckets=64)
    return path


def _north_pipeline(spark, n_docs: int, mode: str = "broadcast") -> int:
    """The north-rule job: read the Iceberg-shaped corpus → geo-span
    extraction → Morton encode → spatial hash join → tile histogram.

    ``mode='broadcast'`` is the planner's choice for broadcastable covers
    (map-only assignment, zero fact shuffle); ``mode='salted'`` forces the
    partitioned path with explicit hot-cell salting (the huge-cover /
    skew configuration).  Returns documents processed."""
    from gregor_spark.model import fixtures as FX
    from gregor_spark.model.zones import ZoneSet
    from gregor_spark.operators.tiles import assign_tiles, tile_histogram
    from gregor_spark.sources.iceberg_like import read_table

    docs = read_table(spark, ensure_corpus(spark, n_docs)).select("doc_id", "spans")
    zones = ZoneSet.from_fixture(FX.SEG_2X2)
    if mode == "broadcast":
        kwargs = {"broadcast_cover": True}
    elif mode == "partitioned":
        # shuffle join WITHOUT active salting (histogram finds no hot
        # cells at this threshold) — the pure-shuffle scaling datapoint
        kwargs = {"broadcast_cover": False, "salt_threshold": n_docs}
    else:  # salted
        kwargs = {
            "broadcast_cover": False,
            # threshold chosen so the skewed corner (hot_frac=5% per axis at
            # res 8 ≈ 164 cells holding 20% of spans ≈ 1.8·n_docs/1000 per cell)
            # the salted path must really salt, not just shuffle-join
            "salt_threshold": max(4_000, n_docs // 1000),
            "salt_factor": 16,
        }
    tiled = assign_tiles(docs, 8, BOUNDS, zones=zones, keep_unassigned=True, **kwargs)
    tile_histogram(tiled).write.format("noop").mode("overwrite").save()
    return n_docs


def run_headline() -> dict:
    from gregor_spark.entry_queries import REGISTRY
    from gregor_spark.session import get_spark

    spark = get_spark(app="gregor-bench", master=f"local[{CPUS}]")
    times: dict[str, float] = {}
    # warm the JVM/Arrow path once (excluded from timings)
    REGISTRY["token_count"][0](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    for name in HEADLINE:
        fn = REGISTRY[name][0]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    ensure_corpus(spark, NORTH_DOCS)  # data prep excluded from timings
    for mode in ("broadcast", "salted"):
        t0 = time.time()
        n = _north_pipeline(spark, NORTH_DOCS, mode)
        north_sec = time.time() - t0
        times[f"north_{mode}"] = round(north_sec, 3)
        times[f"north_{mode}_docs_per_sec"] = round(n / north_sec, 1)
    spark.stop()
    return times


def synthetic_embeddings(spark, n: int, dim: int = 32, clusters: int | None = None):
    """Deterministic distributed embedding corpus with REAL near-dups:
    ~n/clusters vectors per cluster share a base vector + small noise
    (all codegen column arithmetic — no driver data, no Python)."""
    from pyspark.sql import functions as F

    clusters = clusters or max(n // 4, 1)
    base = spark.range(n).select(
        F.col("id").alias("vec_id"), (F.col("id") % clusters).alias("c")
    )

    def white(col, j, k):
        # shader-style hash: fract(sin(x)*43758.5453) ~ U[0,1) — breaks the
        # smooth periodicity a plain sin(c*f_j) would leave between nearby
        # cluster ids (measured: that version made ~750 near-dups/vector)
        x = F.sin(col * F.lit(12.9898) + F.lit(j * 78.233 + k)) * F.lit(43758.5453)
        return (x - F.floor(x)) * F.lit(2.0) - F.lit(1.0)

    comps = [
        (white(F.col("c"), j, 0.0) + F.lit(0.05) * white(F.col("vec_id"), j, 0.5)).alias(
            f"x{j}"
        )
        for j in range(dim)
    ]
    return base.select("vec_id", F.array(*comps).alias("embedding"))


def run_embeddings() -> dict:
    """Near-dup sweep at ≥1M synthetic embeddings — the scale datapoint
    for the LSH-blocked path (the exact block-pair sweep is O(N²) by
    definition and is benchmarked at sf scale in the headline set)."""
    from gregor_spark.ops.similarity import near_dup_pairs_lsh
    from gregor_spark.session import get_spark

    n = int(os.environ.get("SPARK_GRAFT_EMB_N", "1000000"))
    dim = int(os.environ.get("SPARK_GRAFT_EMB_DIM", "32"))
    spark = get_spark(app="gregor-emb-bench", master=f"local[{CPUS}]")
    emb = synthetic_embeddings(spark, n, dim)
    import math

    # ~64 vectors/bucket, 2 OR-tables: sub-quadratic candidates
    n_planes = max(4, int(math.log2(max(n / 64, 4))))
    t0 = time.time()
    pairs = near_dup_pairs_lsh(
        emb, threshold=0.98, dim=dim, n_planes=n_planes, n_tables=2
    ).count()
    sec = time.time() - t0
    spark.stop()
    return {
        "n_vectors": n,
        "dim": dim,
        "n_planes": n_planes,
        "pairs_found": pairs,
        "sec": round(sec, 2),
        "vectors_per_sec": round(n / sec, 1),
    }


def run_knn() -> dict:
    """Distributed kNN at scale: facts × proxies through the
    resolution-coarsening cell join (the path round 1's ranking bug made
    unusable at volume)."""
    from pyspark.sql import functions as F

    from gregor_spark.operators.knn import knn_cell_join
    from gregor_spark.session import get_spark

    n_facts = int(os.environ.get("SPARK_GRAFT_KNN_FACTS", "2000000"))
    n_prox = int(os.environ.get("SPARK_GRAFT_KNN_PROXIES", "100000"))
    k = int(os.environ.get("SPARK_GRAFT_KNN_K", "5"))
    spark = get_spark(app="gregor-knn-bench", master=f"local[{CPUS}]")

    def pts(n, seed):
        return spark.range(n).select(
            F.col("id"),
            (F.rand(seed) * 2 - 0.25).alias("x"),
            (F.rand(seed + 1) * 2 + 9.75).alias("y"),
        )

    facts = pts(n_facts, 3).withColumnRenamed("id", "point_id")
    proxies = pts(n_prox, 7).withColumnRenamed("id", "proxy_id")
    t0 = time.time()
    out = knn_cell_join(facts, proxies, k=k, bounds=BOUNDS)
    n_rows = out.count()
    sec = time.time() - t0
    spark.stop()
    return {
        "n_facts": n_facts,
        "n_proxies": n_prox,
        "k": k,
        "result_rows": n_rows,
        "exact": n_rows == n_facts * k,
        "sec": round(sec, 2),
        "facts_per_sec": round(n_facts / sec, 1),
    }


def run_scaling() -> dict:
    """Same north-rule job at two parallelism levels (the sandbox stand-in
    for N vs 4N executors)."""
    from gregor_spark.session import get_spark

    # the scaling job must be long enough that per-stage fixed costs
    # (scheduler barriers, python worker spin-up, AQE planning — a few
    # seconds total) don't mask the parallel region; best-of-3 damps the
    # sandbox's bursty steal time
    n_docs = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "8000000"))
    out = {"n_docs": n_docs}
    modes = tuple(
        os.environ.get("SPARK_GRAFT_SCALE_MODES", "broadcast,partitioned,salted").split(",")
    )
    for cpus in (8, 32):
        spark = get_spark(app=f"gregor-scale-{cpus}", master=f"local[{cpus}]")
        ensure_corpus(spark, n_docs)
        for mode in modes:
            _north_pipeline(spark, n_docs, mode)  # warmup (JIT + page cache)
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                n = _north_pipeline(spark, n_docs, mode)
                best = min(best, time.time() - t0)
            out[f"{mode}_rate_{cpus}"] = n / best
            out[f"{mode}_sec_{cpus}"] = best
        spark.stop()
    for mode in modes:
        out[f"{mode}_efficiency"] = (
            out[f"{mode}_rate_32"] / out[f"{mode}_rate_8"]
        ) / 4.0
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        s = run_scaling()
        print(json.dumps({k: round(v, 3) for k, v in s.items()}))
        sys.exit(0)
    if "--embeddings" in sys.argv:
        print(json.dumps(run_embeddings()))
        sys.exit(0)
    if "--knn" in sys.argv:
        print(json.dumps(run_knn()))
        sys.exit(0)
    times = run_headline()
    total = round(
        sum(v for k, v in times.items() if not k.endswith("_docs_per_sec")), 3
    )
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
