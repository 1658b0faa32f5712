"""SemDeDup: planted-duplicate goldens, pair-level brute-force
characterization against the operator's own cluster assignment, and
parallelism invariance."""

import numpy as np

from gregor_spark.ops.similarity import semdedup


def _corpus(spark, n=60, dim=8, dups=((7, 31), (12, 44))):
    """Deterministic pseudo-random unit-ish vectors; docs in ``dups``
    pairs share the SAME vector (cos exactly 1) so they must land in one
    cluster and dedup regardless of the trained centroids."""
    rows = []
    vecs = {}
    for i in range(n):
        v = [((i * 97 + d * 31 + (i * d) % 13) % 17 - 8) / 8.0 + 0.1 for d in range(dim)]
        vecs[i] = v
    for a, b in dups:
        vecs[b] = list(vecs[a])
    for i in range(n):
        rows.append((i, vecs[i]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        {i: np.array(v) for i, v in vecs.items()},
    )


def test_semdedup_planted_exact_dups(spark):
    df, vecs = _corpus(spark)
    out = {r.vec_id: r for r in semdedup(df, threshold=0.999).collect()}
    assert len(out) == 60
    for a, b in ((7, 31), (12, 44)):
        assert out[a].cid == out[b].cid  # identical vectors, same cluster
        assert out[b].keep == 0 and out[b].dup_of is not None
        assert out[a].keep == 1 or out[a].dup_of < a  # a kept unless a lower dup


def test_semdedup_verdicts_match_brute_force(spark):
    df, vecs = _corpus(spark)
    tau = 0.93
    out = {r.vec_id: r for r in semdedup(df, threshold=tau, n_blocks=3).collect()}
    cid = {i: out[i].cid for i in out}
    norms = {i: v / np.linalg.norm(v) for i, v in vecs.items()}
    for i, r in out.items():
        partners = [
            j
            for j in out
            if j < i and cid[j] == cid[i] and float(norms[j] @ norms[i]) >= tau
        ]
        if partners:
            assert r.keep == 0 and r.dup_of == min(partners), i
        else:
            assert r.keep == 1 and r.dup_of is None, i


def test_semdedup_partition_invariance(spark):
    df, _ = _corpus(spark)
    a = sorted(map(tuple, semdedup(df, threshold=0.95).collect()))
    b = sorted(
        map(tuple, semdedup(df.repartition(7), threshold=0.95, n_blocks=2).collect())
    )
    assert a == b  # quantized centroids + deterministic keep rule
