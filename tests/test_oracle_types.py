"""Guard against oracle result-type drift.

The driver's correctness gate hashes typed values: DuckDB HUGEINT (what
``sum(integer)`` returns) or DECIMAL in an oracle column hash-mismatches
Spark's BIGINT/DOUBLE even when numerically equal.  Round 2 lost 11 driver
rows to exactly this.  This test DESCRIBEs every ``oracle_sql()`` query in
DuckDB and fails on any HUGEINT/UHUGEINT/DECIMAL output column — keeping the
whole oracle surface in the BIGINT/DOUBLE/VARCHAR/BOOLEAN type lattice Spark
can reproduce.

No SparkSession needed: this runs in milliseconds.
"""
from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _oracles():
    import __spark_entry__ as entry

    return sorted(entry.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_has_no_untranslatable_types(con, name, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in BANNED)
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} are HUGEINT/DECIMAL — cast to "
        f"BIGINT/DOUBLE so the driver's typed value-hash matches Spark"
    )
