"""Per-group convex hull — the classic reduce-style geometry aggregate
(ST_ConvexHull per zone in PostGIS terms), built as a TWO-LEVEL exact
reduction so no single task ever sees a whole group:

* stage 1: points are split into ``n_salt`` deterministic sub-groups
  (``pmod(id-ish hash, n_salt)``) and each sub-group computes its
  partial hull with an integer monotone chain (Arrow-batched
  ``applyInPandas``, numpy int64 — exact cross products, no epsilon);
* stage 2: the union of partial-hull vertices (≤ n_salt × per-hull
  size, tiny) reruns the same chain per group for the final hull.

Exactness of the composition: a point dropped by a partial hull lies in
the convex hull of its own sub-group ⊆ the group hull, so it can never
be a STRICT vertex of the final hull — strict-hull semantics (collinear
boundary points excluded) make hull-of-hulls lossless.

Scale: stage 1 is one shuffle on (group, salt) with per-task work
bounded by group_size/n_salt; stage 2 shuffles only hull vertices
(output of a convex hull of n random points is O(log n) expected).  For
groups beyond n_salt × task capacity, raise ``n_salt`` or chain another
level — the reduction is associative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chain(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int]]:
    """(x, y) vertices of the STRICT convex hull, CCW from the
    lexicographically smallest vertex (Andrew's monotone chain; int64
    cross products — pop on cross ≤ 0 drops collinear boundary points)."""
    order = np.lexsort((ys, xs))
    pts = [(int(xs[i]), int(ys[i])) for i in order]
    # dedupe exact duplicates (sorted, so adjacent)
    ded = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
    if len(ded) <= 2:
        return ded

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in ded:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(ded):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    # fully-collinear inputs leave lower = [first, last] and
    # upper = [last, first], so the concatenation is the two extremes
    return lower[:-1] + upper[:-1]


def _hull_pdf(pdf: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    hull = _chain(
        pdf["x"].to_numpy(dtype=np.int64), pdf["y"].to_numpy(dtype=np.int64)
    )
    out = pd.DataFrame(hull, columns=["x", "y"])
    out["seq"] = np.arange(len(out), dtype=np.int64)
    for k in keys:
        out[k] = pdf[k].iloc[0]
    return out[keys + ["seq", "x", "y"]]


def convex_hull(
    pts: DataFrame,
    by: str = "zone_id",
    x: str = "x",
    y: str = "y",
    n_salt: int = 16,
) -> DataFrame:
    """(by, seq, x, y) — strict convex hull vertices of each group's
    point set, CCW from the lexicographically smallest vertex.

    Collinear-on-edge points and duplicates are excluded (strict hull):
    that is what makes the two-level reduction exact, and it matches the
    definitional oracle (a vertex iff NOT in the convex hull of the
    other points).  A fully-collinear group degrades to its two extreme
    points; a single-point group to itself.
    """
    salt = F.pmod(
        F.xxhash64(F.col(x), F.col(y), F.lit(17)), F.lit(int(n_salt))
    ).alias("_salt")
    base = pts.select(
        F.col(by).alias("_g"),
        F.col(x).cast("long").alias("x"),
        F.col(y).cast("long").alias("y"),
        salt,
    )
    gtype = dict(base.dtypes)["_g"]
    schema1 = f"_g {gtype}, _salt long, seq long, x long, y long"
    partial = base.groupBy("_g", "_salt").applyInPandas(
        lambda pdf: _hull_pdf(pdf, ["_g", "_salt"]), schema1
    )
    schema2 = f"_g {gtype}, seq long, x long, y long"
    final = (
        partial.drop("_salt")
        .groupBy("_g")
        .applyInPandas(lambda pdf: _hull_pdf(pdf, ["_g"]), schema2)
    )
    return final.select(F.col("_g").alias(by), "seq", "x", "y")
