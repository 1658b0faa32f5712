"""Context-window packing (ops/text.py::pack_sequences): concat-and-chunk
block assignment with straddling docs, verified against a dict/loop
replay and under repartitioning."""

import pytest

from gregor_spark.ops.text import pack_sequences


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


def _collect(df):
    return {
        r["doc_id"]: (
            r["shard"],
            r["n_tokens"],
            r["offset"],
            r["first_block"],
            r["last_block"],
            r["n_blocks"],
        )
        for r in df.collect()
    }


def _brute(rows, capacity, shard_of):
    """Loop replay: per shard, docs in doc_id order, running offset."""
    out, cum = {}, {}
    for d, text in sorted(rows):
        n = len([t for t in text.split(" ") if t])
        s = shard_of(d)
        off = cum.get(s, 0)
        cum[s] = off + n
        if n == 0:
            out[d] = (s, 0, off, None, None, 0)
        else:
            fb, lb = off // capacity, (off + n - 1) // capacity
            out[d] = (s, n, off, fb, lb, lb - fb + 1)
    return out


def test_pack_straddles_and_replay(spark):
    docs = [(i, " ".join(f"t{i}_{j}" for j in range(30 + 17 * (i % 5)))) for i in range(40)]
    docs.append((100, ""))  # empty doc: 0 tokens, NULL blocks
    df = _df(spark, docs)
    got = _collect(pack_sequences(df, capacity=64, n_shards=4))
    shard_of = {d: got[d][0] for d, _ in docs}
    want = _brute(docs, 64, lambda d: shard_of[d])
    assert got == want
    # docs longer than capacity must straddle
    for d, (s, n, off, fb, lb, nb) in got.items():
        if n and n > 64:
            assert nb >= 2
    assert got[100][5] == 0 and got[100][3] is None
    # within a shard, offsets tile the stream exactly (no gaps/overlap)
    by_shard = {}
    for d, (s, n, off, *_r) in sorted(got.items()):
        by_shard.setdefault(s, []).append((off, n))
    for s, spans in by_shard.items():
        spans.sort()
        pos = 0
        for off, n in spans:
            assert off == pos
            pos += n


def test_pack_partition_invariance(spark):
    docs = [(i, " ".join(f"x{i}_{j}" for j in range(10 + i))) for i in range(60)]
    df = _df(spark, docs)
    a = _collect(pack_sequences(df.repartition(1), capacity=100, n_shards=8))
    b = _collect(pack_sequences(df.repartition(13), capacity=100, n_shards=8))
    assert a == b


def test_pack_validates_capacity(spark):
    with pytest.raises(ValueError):
        pack_sequences(_df(spark, [(1, "a")]), capacity=0)
