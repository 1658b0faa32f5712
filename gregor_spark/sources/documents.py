"""Synthetic interleaved text+media document corpus (north-rule input).

Schema per BASELINE.json:input_hint:

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Generation is **fully distributed and deterministic**: one
``spark.range(n)`` and pure column arithmetic (murmur3 ``F.hash`` mixed
with a seed) — no driver loop, no Python RNG, identical output at any
parallelism.  That is what lets the same generator describe a 10^12-doc
corpus: rows materialize lazily per partition.

Geo-bearing spans carry ``text = "<lon>,<lat>"`` inside the given bounds
so tile assignments are checkable against the zone fixtures
(FIXTURES.md §5).  ``skew`` concentrates a fraction of geo spans into the
first zone-sized hot spot to exercise explicit salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPAN_SCHEMA = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

_WORDS = (
    "glacier delta basin ridge plateau estuary moraine fjord tundra steppe "
    "mesa butte arroyo playa terrace scarp outwash drumlin esker kame"
).split()


def _u(col, salt: int, seed: int):
    """Deterministic uniform [0,1) from a long column (murmur3-mixed)."""
    return (F.pmod(F.hash(col, F.lit(salt), F.lit(seed)), F.lit(1_000_003)) / 1_000_003.0)


def generate_documents(
    spark: SparkSession,
    n_docs: int,
    bounds: tuple[float, float, float, float],
    seed: int = 42,
    skew: float = 0.0,
    hot_frac: float = 0.05,
    partitions: int | None = None,
) -> DataFrame:
    """Build the corpus.  ``skew`` = fraction of docs whose geo spans are
    squeezed into the ``hot_frac``-sized corner of ``bounds``."""
    minx, miny, maxx, maxy = bounds
    base = spark.range(n_docs, numPartitions=partitions)
    i = F.col("id")
    n_spans = (F.pmod(F.hash(i, F.lit(1), F.lit(seed)), F.lit(7)) + 2).cast("int")

    is_hot = _u(i, 99, seed) < F.lit(float(skew))
    hx = minx + hot_frac * (maxx - minx)
    hy = miny + hot_frac * (maxy - miny)

    def span(j):
        kind_ix = F.pmod(F.hash(i, j, F.lit(2), F.lit(seed)), F.lit(3))
        kind = F.element_at(F.array(F.lit("text"), F.lit("geo"), F.lit("media")), kind_ix + 1)
        lon_u = _u(F.hash(i, j, F.lit(3)), 3, seed)
        lat_u = _u(F.hash(i, j, F.lit(4)), 4, seed)
        lon = F.when(is_hot, minx + lon_u * (hx - minx)).otherwise(
            minx + lon_u * (maxx - minx)
        )
        lat = F.when(is_hot, miny + lat_u * (hy - miny)).otherwise(
            miny + lat_u * (maxy - miny)
        )
        word = F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            F.pmod(F.hash(i, j, F.lit(5), F.lit(seed)), F.lit(len(_WORDS))) + 1,
        )
        offset = (j * 10 + F.pmod(F.hash(i, j, F.lit(6), F.lit(seed)), F.lit(10))).cast("int")
        text = (
            F.when(kind == "geo", F.format_string("%.6f,%.6f", lon, lat))
            .when(kind == "text", word)
            .otherwise(F.lit(""))
        )
        media_ref = F.when(
            kind == "media",
            F.format_string("m://doc%012d/%d", i, offset),
        ).otherwise(F.lit(""))
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    return base.select(
        F.format_string("doc%012d", i).alias("doc_id"),
        spans.cast(SPAN_SCHEMA).alias("spans"),
    )


def span_sequence_key(df: DataFrame, spans: str = "spans") -> DataFrame:
    """Canonical per-doc span-sequence fingerprint: the ordered
    (kind, text, media_ref) tuple list hashed JVM-side.  Two tables with
    equal fingerprints per doc_id satisfy the reference invariant
    'span-sequence equality (kind, text, media_ref, order)'."""
    seq = F.transform(
        F.col(spans),
        lambda s: F.concat_ws("\u0001", s["kind"], s["text"], s["media_ref"]),
    )
    return df.withColumn("span_seq_hash", F.xxhash64(F.concat_ws("\u0002", seq)))


def verify_span_sequence(inp: DataFrame, out: DataFrame) -> int:
    """Number of docs whose span sequence changed (must be 0).  Runs as a
    single join on doc_id over fingerprints — O(docs) shuffle, no explode."""
    a = span_sequence_key(inp).select("doc_id", F.col("span_seq_hash").alias("h_in"))
    b = span_sequence_key(out).select("doc_id", F.col("span_seq_hash").alias("h_out"))
    return (
        a.join(b, "doc_id", "full")
        .filter(
            F.col("h_in").isNull()
            | F.col("h_out").isNull()
            | (F.col("h_in") != F.col("h_out"))
        )
        .count()
    )
