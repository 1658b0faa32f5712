"""Round-4 hardening: IVF hot-list bounding, streaming-dedup crash
ordering, short-doc shingle semantics, GeoJSON multi-part hole
assignment."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ IVF hot-list bounding


def _hot_corpus(spark, n=400, dim=6):
    """Adversarially clustered corpus: 90% of vectors are tiny jitters of
    ONE base vector, so Voronoi assignment lands them all in a single
    inverted list regardless of centroid sampling."""
    rng = np.random.RandomState(3)
    base = rng.normal(size=dim)
    rows = []
    for i in range(n):
        if i % 10 == 0:
            v = rng.normal(size=dim)  # 10% background
        else:
            v = base + 1e-3 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_ivf_matmul_hot_list_split_parity(spark):
    """Splitting an oversized inverted list over hash slots must not
    change the output: union of per-slot top-k ⊇ per-list top-k, final
    window re-ranks globally."""
    from gregor_spark.ops.similarity import ann_ivf_topk_matmul

    df = _hot_corpus(spark)
    unsplit = ann_ivf_topk_matmul(
        df, k=4, n_queries=25, n_lists=8, nprobe=3, max_list_rows=None
    ).collect()
    split = ann_ivf_topk_matmul(
        df, k=4, n_queries=25, n_lists=8, nprobe=3, max_list_rows=16
    ).collect()
    u = {(r["vec_id"], r["rank"]): (r["nbr_id"], round(r["cos"], 9)) for r in unsplit}
    s = {(r["vec_id"], r["rank"]): (r["nbr_id"], round(r["cos"], 9)) for r in split}
    assert u == s and len(u) > 0


def test_ann_ivf_hot_list_slots_bound_cogroup_rows(spark):
    """The slot table must actually cap per-cogroup corpus rows at
    max_list_rows on the all-hot corpus (the guarantee the split buys)."""
    from gregor_spark.ops.similarity import _ivf_assign

    df = _hot_corpus(spark)
    cap = 16
    assigned, _q = _ivf_assign(df, 8, 3, 25, "vec_id", "embedding")
    assigned = assigned.localCheckpoint(eager=False)
    sizes = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("n"))
    assert sizes.agg(F.max("n")).collect()[0][0] > cap  # corpus IS hot
    slots = sizes.select(
        "list_id", F.ceil(F.col("n") / F.lit(cap)).cast("int").alias("_slots")
    )
    per_slot = (
        assigned.join(F.broadcast(slots), "list_id")
        .withColumn(
            "_slot", F.pmod(F.xxhash64(F.col("nbr_id")), F.col("_slots")).cast("int")
        )
        .groupBy("list_id", "_slot")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    max_slot = per_slot.agg(F.max("n")).collect()[0][0]
    # hash slots are uniform in expectation; allow 2x headroom over the
    # exact cap (the guarantee is O(cap) per cogroup, not an exact cut)
    assert max_slot <= 2 * cap
