"""Text-analysis operators for training-data pipelines over the
``documents`` table: tokenization, quality scoring, language-ID heuristic,
and document fingerprinting.

All pure ``pyspark.sql.functions`` column expressions (whole-stage
codegen, zero Python) — each returns a DataFrame and has an exact ANSI-SQL
oracle in entry_queries.py.  Integer arithmetic is kept below 2^63 and
divisions are by guaranteed-nonzero counts so the expressions are
ANSI-mode safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace-robust tokenizer: every maximal run of non-space chars
TOKEN_RE = "[^ ]+"

EN_STOPWORDS = ("the", "a", "an", "of", "to", "in", "and")


def tokens(text: Column) -> Column:
    return F.regexp_extract_all(text, F.lit(TOKEN_RE), 0)


def token_count(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_tokens) — whitespace token counting."""
    return docs.select(
        "doc_id", F.size(tokens(F.col(text))).cast("long").alias("n_tokens")
    )


def quality_score(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, distinct_ratio, mean_token_len).

    Length/diversity quality signals: low distinct ratio flags boilerplate
    or token-salad; mean token length flags OCR noise.  All divisions are
    by n_tokens which is >= 1 for non-empty text (empty text yields size 0
    → guarded with nullif so ANSI mode never divides by zero).
    """
    toks = tokens(F.col(text))
    n = F.size(toks).cast("long")
    nd = F.size(F.array_distinct(toks)).cast("long")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    ).cast("long")
    safe_n = F.nullif(n, F.lit(0)).cast("double")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        (nd.cast("double") / safe_n).alias("distinct_ratio"),
        (sum_len.cast("double") / safe_n).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, en_hits, predicted) — marker-word language heuristic.

    A deliberately simple, fully-declarative scorer: count hits against an
    English stopword profile; below threshold → 'und'.  (The corpus here
    shares one vocabulary across its ``lang`` labels, so the value of this
    operator is the Spark shape — a per-doc array filter + threshold —
    not linguistic accuracy.)
    """
    toks = tokens(F.lower(F.col(text)))
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in EN_STOPWORDS]))
    ).cast("long")
    return docs.select(
        "doc_id",
        hits.alias("en_hits"),
        F.when(hits >= 2, F.lit("en")).otherwise(F.lit("und")).alias("predicted"),
    )


def _token_int(t: Column) -> Column:
    """Cheap deterministic token→int usable identically in Spark and ANSI
    SQL (no engine-specific hash): first/last char codes + length."""
    return (
        F.ascii(F.substring(t, 1, 1)) * F.lit(961)
        + F.ascii(F.substring(t, -1, 1)) * F.lit(31)
        + F.length(t)
    ).cast("long")


def fingerprint(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, fp) — order-sensitive rolling polynomial hash over tokens:
    ``h = (h * 1000003 + token_int) mod 1e9+7``.  Reordered or edited docs
    get different fingerprints; pure column fold, exact integers."""
    toks = tokens(F.col(text))
    fp = F.aggregate(
        F.transform(toks, _token_int),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * F.lit(1000003) + x) % F.lit(1000000007),
    )
    return docs.select("doc_id", fp.alias("fp"))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles as an array<string> (the n-gram unit for
    Jaccard / MinHash dedup)."""
    toks = tokens(text)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(sh)
