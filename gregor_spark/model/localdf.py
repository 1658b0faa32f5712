"""Small driver-side tables as JVM LocalRelations.

``spark.createDataFrame(list_of_tuples)`` builds a *pickled python RDD*:
every stage that scans it pays a Python-worker round trip per parent
partition (and ``coalesce(1)`` makes one task pay for ALL of them —
~4.5 s per stage at local[32]).  Emitting a SQL ``VALUES`` LocalRelation
instead keeps fixture/zone/norm tables entirely JVM-side: scans are
instant, Catalyst can constant-fold and broadcast them for free.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

_SQL_TYPES = {
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INT",
    "integer": "INT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "STRING",
    "boolean": "BOOLEAN",
}


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        return f"{v!r}D"  # exact shortest repr, parsed directly as DOUBLE
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    raise TypeError(f"unsupported literal {type(v)}")


def local_df(spark: SparkSession, rows: list[tuple], ddl: str) -> DataFrame:
    """DataFrame from literal rows via SQL VALUES (JVM LocalRelation).

    ``ddl``: simple schema like ``"zone_id long, x double, name string"``.
    """
    cols = []
    for part in ddl.split(","):
        name, typ = part.strip().rsplit(" ", 1)
        cols.append((name.strip(), _SQL_TYPES[typ.strip().lower()]))
    if not rows:
        sel = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
        return spark.sql(f"SELECT {sel} WHERE FALSE")
    if len(rows) > 4096:
        # r8: a VALUES literal this large spends seconds in the SQL
        # parser (profiled 5.8 s for a 66k-row zone cover).  The Arrow
        # createDataFrame path ships the rows as record batches — data
        # lands JVM-side with no Python-worker round trip at scan time,
        # which is the property this module exists for.
        import pandas as pd

        pdf = pd.DataFrame(rows, columns=[n for n, _ in cols])
        return spark.createDataFrame(pdf, schema=ddl)
    body = ",".join("(" + ",".join(_lit(v) for v in r) + ")" for r in rows)
    names = ", ".join(n for n, _ in cols)
    casts = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    return spark.sql(f"SELECT {casts} FROM (VALUES {body} AS t({names}))")
