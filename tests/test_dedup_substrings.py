"""Offset-insensitive exact-substring dedup (ops/dedup.py::dedup_substrings).

The load-bearing fixture: a passage duplicated at a DIFFERENT token
offset in another doc.  Chunk-aligned dedup (dedup_chunks) provably
misses it — no 20-token chunk boundary lines up — while the sliding-
window pass must flag every covered token.  A brute-force dict/set
reference (independent formulation: no hashing, no joins) pins the
semantics on richer fixtures.
"""

import pytest

from gregor_spark.ops import dedup as D


def _rows(df):
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_tokens"],
            r["kept_text"],
        )
        for r in df.collect()
    }


def _brute(docs, k):
    """Independent reference: first-occurrence-wins over every k-token
    sliding window; token dup iff covered by a non-owner window."""
    toked = [(d, t.lower().split(" ")) for d, t in docs]
    owner = {}
    for d, toks in sorted(toked):
        for p in range(len(toks) - k + 1):
            owner.setdefault(tuple(toks[p : p + k]), (d, p))
    out = {}
    for d, toks in toked:
        covered = set()
        for p in range(len(toks) - k + 1):
            if owner[tuple(toks[p : p + k])] != (d, p):
                covered.update(range(p, p + k))
        kept = " ".join(t for i, t in enumerate(toks) if i not in covered)
        out[d] = (len(toks), len(covered), kept)
    return out


def _df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


WORDS = [f"w{i:02d}" for i in range(40)]


def test_cross_offset_duplicate_chunks_miss_substrings_catch(spark):
    passage = " ".join(WORDS[:25])  # 25 tokens > k=20
    docs = [
        (1, passage),
        # same passage at token offset 7 — no 20-chunk boundary aligns
        (2, " ".join(f"j{i}" for i in range(7)) + " " + passage),
    ]
    df = _df(spark, docs)

    chunks = {
        r["doc_id"]: r["n_dup_chunks"]
        for r in D.dedup_chunks(df, chunk_tokens=20).collect()
    }
    assert chunks == {1: 0, 2: 0}  # the chunk-aligned pass misses it

    got = _rows(D.dedup_substrings(df, k=20))
    assert got == _brute(docs, 20)
    # every passage token in doc 2 is covered (offsets 7..31), junk kept
    assert got[2][1] == 25
    assert got[2][2] == " ".join(f"j{i}" for i in range(7))
    assert got[1] == (25, 0, passage)


def test_within_doc_overlapping_windows(spark):
    # one doc repeating a 22-token passage internally with a 5-token gap:
    # overlapping windows of the second copy all match smaller positions
    passage = WORDS[:22]
    toks = passage + ["g0", "g1", "g2", "g3", "g4"] + passage
    docs = [(10, " ".join(toks))]
    got = _rows(D.dedup_substrings(_df(spark, docs), k=20))
    assert got == _brute(docs, 20)
    # second copy fully covered, first copy + gap survive
    assert got[10] == (49, 22, " ".join(passage + ["g0", "g1", "g2", "g3", "g4"]))


def test_short_docs_and_all_dup_doc(spark):
    docs = [
        (1, " ".join(WORDS[:20])),  # exactly k tokens: one window, owner
        (2, " ".join(WORDS[:20])),  # exact dup of doc 1 → fully covered
        (3, "tiny doc below k"),    # no windows at all
    ]
    got = _rows(D.dedup_substrings(_df(spark, docs), k=20))
    assert got == _brute(docs, 20)
    assert got[2] == (20, 20, "")
    assert got[3] == (4, 0, "tiny doc below k")


def test_brute_parity_on_mixed_corpus_and_partition_invariance(spark):
    # deterministic mixed corpus: shared prefixes, shifted copies,
    # partial overlaps, unique tails
    docs = []
    for d in range(12):
        body = [WORDS[(d * 7 + i * 3) % 40] for i in range(30)]
        if d % 3 == 1:  # embed doc d-1's middle 21 tokens at offset 4
            prev = [WORDS[((d - 1) * 7 + i * 3) % 40] for i in range(30)]
            body = body[:4] + prev[5:26] + body[4:9]
        docs.append((d, " ".join(body)))
    df = _df(spark, docs)
    want = _brute(docs, 20)
    got1 = _rows(D.dedup_substrings(df.repartition(1), k=20))
    got7 = _rows(D.dedup_substrings(df.repartition(7), k=20))
    assert got1 == want
    assert got7 == want


def test_dup_token_frac_column(spark):
    docs = [(1, " ".join(WORDS[:20])), (2, " ".join(WORDS[:20]) + " x y")]
    out = {
        r["doc_id"]: r["dup_token_frac"]
        for r in D.dedup_substrings(_df(spark, docs), k=20).collect()
    }
    assert out[1] == 0.0
    assert out[2] == pytest.approx(20 / 22)
