"""Armor every oracle's output column types.

VERDICT r5 root-caused the sole red driver row (`pagerank`) to the
oracle emitting a 128-bit HUGEINT (DuckDB widens sum() over CTE
rounds): the driver's value hasher canonicalizes DECIMAL/float but not
HUGEINT, so the row hash-mismatched even though values were equal.
Twelve more oracles emit DECIMAL columns today and pass only because
the hasher happens to normalize decimals — one hasher change away from
the same silent failure.

This guard registers each oracle as a DuckDB view over the sf0.001
parquet tables and asserts every output column's type is in the
portable set {BIGINT, DOUBLE, VARCHAR, BOOLEAN} (plus sized ints and
list-of-double for array columns, which both sides hash per-element).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = os.environ.get("SPARK_GRAFT_TYPES_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Portable scalar types: both the driver hasher and check_contract
# canonicalize these identically between DuckDB and Spark.
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    # array<double>/array<bigint>/array<varchar> columns hash per-element
    "DOUBLE[]",
    "FLOAT[]",
    "BIGINT[]",
    "INTEGER[]",
    "VARCHAR[]",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _oracle_names():
    return sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_output_types_portable(con, name):
    sql = E.oracle_sql()[name]
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) _o").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if typ.upper() not in ALLOWED
    ]
    assert not bad, (
        f"oracle {name!r} emits non-portable column types {bad}; "
        "CAST the final projection to BIGINT/DOUBLE/VARCHAR/BOOLEAN "
        "(HUGEINT/DECIMAL hash-mismatch against the driver, see VERDICT r5)"
    )
