"""Training-data ops: dedup, text analysis, similarity, media plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gregor_spark.ops import dedup as D
from gregor_spark.ops import text as TX
from gregor_spark.ops.media import extract_features, frame_sample_plan, synthetic_media
from gregor_spark.ops.similarity import ann_lsh_topk, cosine_topk, cosine_topk_pandas

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (3, "completely different words here nothing shared at all"),
        (4, "a b"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_dedup_exact(spark, docs):
    out = {r["min_doc_id"]: r["n_docs"] for r in D.dedup_exact(docs).collect()}
    assert out[0] == 2  # docs 0 and 2 identical
    assert sum(out.values()) == 6


def test_jaccard_pairs(spark, docs):
    rows = D.jaccard_pairs(docs, threshold=0.5).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert pairs[(0, 2)] == pytest.approx(1.0)  # identical docs
    assert pairs[(0, 1)] > 0.5  # one-word difference
    assert (0, 3) not in pairs


def test_lsh_candidates_contain_near_dups(spark, docs):
    cand = {(r["doc_a"], r["doc_b"]) for r in D.lsh_candidate_pairs(docs).collect()}
    assert (0, 2) in cand  # identical signatures always collide


def test_simhash_near_dup_hamming(spark, docs):
    h = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert h[0] == h[2]
    ham = bin(h[0] ^ h[1]).count("1")
    ham_far = bin(h[0] ^ h[3]).count("1")
    assert ham <= ham_far


def test_text_ops(spark, docs):
    tc = {r["doc_id"]: r["n_tokens"] for r in TX.token_count(docs).collect()}
    assert tc[0] == 9 and tc[4] == 2 and tc[5] == 0
    q = {r["doc_id"]: r for r in TX.quality_score(docs).collect()}
    assert q[0]["n_distinct"] == 8  # 'the' twice
    assert q[0]["distinct_ratio"] == pytest.approx(8 / 9)
    assert q[5]["distinct_ratio"] is None  # empty text -> null, not div0
    fp = {r["doc_id"]: r["fp"] for r in TX.fingerprint(docs).collect()}
    assert fp[0] == fp[2] and fp[0] != fp[1]
    lang = {r["doc_id"]: r["predicted"] for r in TX.lang_id(docs).collect()}
    assert lang[0] == "en" and lang[3] == "und"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_cosine_paths_agree(spark, emb):
    a = cosine_topk(emb, k=3, n_queries=10)
    amap = {(r["vec_id"], r["rank"]): r["nbr_id"] for r in a.collect()}
    q = emb.filter(F.col("vec_id") < 10)
    b = cosine_topk_pandas(emb, q, k=3)
    bmap = {(r["vec_id"], r["rank"]): r["nbr_id"] for r in b.collect()}
    assert amap == bmap


def test_ann_lsh_recall(spark, emb):
    exact = cosine_topk(emb, k=5, n_queries=30)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    approx = ann_lsh_topk(emb, dim=64, k=5)
    got = {}
    for r in approx.collect():
        if r["vec_id"] < 30:
            got.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    recalls = [len(truth[q] & got.get(q, set())) / 5 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.5  # multiprobe LSH, auto planes


def test_jaccard_capped_bounds_hot_shingles(spark):
    """Degenerate boilerplate corpus: one shingle shared by ALL docs.
    Uncapped, the self-join would materialize O(n²) rows on it; with
    max_df the hot shingle contributes ZERO candidates, while pairs that
    also share a rare shingle keep their EXACT jaccard score."""
    n = 40
    rows = [(i, f"common boiler plate unique{i} tail{i % 2}") for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.shingle_table(docs)
    dfh = sh.groupBy("shingle").count().filter(F.col("count") > 5).count()
    assert dfh >= 1  # the corpus really has a hot shingle
    capped = D.jaccard_pairs(docs, threshold=0.0, max_df=5).collect()
    # 'common boiler plate' (df=40) is capped away; no candidates share a
    # rare (df<=5) shingle here -> empty, and the join never exploded
    assert capped == []
    # now make two docs share a RARE shingle: scores must be exact
    rows2 = rows + [(100, "rare shared shingle alpha"), (101, "rare shared shingle beta")]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in D.jaccard_pairs(docs2, threshold=0.0, max_df=5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["n_b"], r["jaccard"])
        for r in D.jaccard_pairs(docs2, threshold=0.0).collect()
        if (r["doc_a"], r["doc_b"]) in got
    }
    assert got == exact and (100, 101) in got


def test_simhash_fast_parity(spark, docs):
    a = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in D.simhash_fast(docs).collect()}
    assert a == b


def test_near_dup_blocked_matches_driver_sweep(spark, emb):
    """The distributed block-pair sweep reproduces the exact all-pairs
    result (same pairs, same cosines) with no driver-side corpus collect."""
    from gregor_spark.ops.similarity import near_dup_pairs

    got = {
        (r["id_a"], r["id_b"]): round(r["cos"], 9)
        for r in near_dup_pairs(emb, threshold=0.4).collect()
    }
    # independent numpy re-derivation
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    ai, bi = np.where(sims >= 0.4)
    want = {
        (int(ids[i]), int(ids[j])): round(float(sims[i, j]), 9)
        for i, j in zip(ai, bi)
        if ids[i] < ids[j]
    }
    assert got == want and len(want) > 0


def test_near_dup_lsh_subset_of_exact(spark, emb):
    """LSH-blocked sweep returns a subset of the exact sweep (identical
    cosines on what it returns) with usable recall at 8 planes."""
    from gregor_spark.ops.similarity import near_dup_pairs, near_dup_pairs_lsh

    exact = {
        (r["id_a"], r["id_b"]): round(r["cos"], 9)
        for r in near_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): round(r["cos"], 9)
        for r in near_dup_pairs_lsh(emb, threshold=0.4, dim=64).collect()
    }
    assert set(approx) <= set(exact)
    for k in approx:
        assert approx[k] == exact[k]
    assert len(approx) >= 0.7 * len(exact)


def test_dedup_clusters_components(spark):
    """Label propagation converges to min-reachable-id components,
    including a CHAIN (propagation must cross diameter > 1) and
    singletons."""
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # components: {0,1,2,3} as a chain 3-2-1-0, {5,6}, singletons 4,7,8,9
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (0, 1), (5, 6)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}


def test_ann_ivf_recall(spark, emb):
    """IVF probe-3-of-16 recall against the exact top-k (uniform random
    embeddings are a worst case for Voronoi lists; the dial is nprobe)."""
    from gregor_spark.ops.similarity import ann_ivf_topk

    exact = cosine_topk(emb, k=5, n_queries=30)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    approx = ann_ivf_topk(emb, k=5, n_queries=30, n_lists=16, nprobe=3)
    got = {}
    for r in approx.collect():
        got.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    recalls = [len(truth[q] & got.get(q, set())) / 5 for q in truth]
    assert sum(recalls) / len(recalls) >= 0.3
    # probing EVERY list must reproduce the exact result (IVF == brute
    # force when nprobe == n_lists)
    full = ann_ivf_topk(emb, k=5, n_queries=10, n_lists=16, nprobe=16)
    fmap = {(r["vec_id"], r["rank"]): r["nbr_id"] for r in full.collect()}
    emap = {
        (r["vec_id"], r["rank"]): r["nbr_id"]
        for r in cosine_topk(emb, k=5, n_queries=10).collect()
    }
    assert fmap == emap


def test_media_pipeline(spark):
    media = synthetic_media(spark, 100)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 100
    assert all(0 <= r["mean_px"] <= 255 for r in rows)
    assert all(1 <= r["thumb_w"] <= 16 for r in rows)
    plan = frame_sample_plan(media, every_n=30)
    vids = media.filter(F.col("kind") == "video").count()
    assert plan.select("media_id").distinct().count() == vids
    # deterministic across runs
    again = {
        (r["media_id"], r["mean_px"]) for r in extract_features(synthetic_media(spark, 100)).collect()
    }
    assert {(r["media_id"], r["mean_px"]) for r in rows} == again
