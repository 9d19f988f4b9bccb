"""Guard against the signed-zero checksum class (round-8 q148 red row).

Two independent pins:

1. ``scripts/check_oracle.py::norm`` must DISTINGUISH -0.0 from +0.0 —
   the driver's value-hash does, and round 8 proved the old tuple compare
   (where ``-0.0 == 0.0``) let a red driver row through every local run.
2. No oracle may emit a bare ``round(<agg over a centered quantity>, n)``
   checksum whose true value is 0: such a float's SIGN is
   summation-order-dependent, so DuckDB and Spark legitimately disagree on
   ±0.0.  We pin this concretely: every oracle's DuckDB output at sf0.001
   must contain no -0.0 in any float column (the +0.0 normalization —
   ``+ 0.0`` — makes this true for q148; any new oracle that emits -0.0
   would fail the driver hash whenever Spark's partial-agg order differs).
"""
from __future__ import annotations

import importlib.util
import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load_norm():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", "/root/repo/scripts/check_oracle.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.norm


def test_norm_distinguishes_signed_zero():
    norm = _load_norm()
    assert norm(-0.0) != norm(0.0), (
        "replica norm() conflates -0.0 with +0.0 — the driver's value-hash "
        "does not, so the replica would stay green on a red driver row"
    )
    # equal-magnitude nonzero floats still compare equal across engines
    assert norm(1.25) == norm(1.25)
    assert norm(-1.25) != norm(1.25)


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
def test_oracle_emits_no_negative_zero(con, name, sql):
    # cheap static screen first: only execute oracles that round a float
    # aggregate (the class that can hit ±0.0); everything else is exact
    # arithmetic on positive quantities.
    if "round(" not in sql.lower():
        pytest.skip("no rounded float checksum in this oracle")
    rows = con.execute(sql).fetchall()
    bad = [
        (i, j, v)
        for i, r in enumerate(rows)
        for j, v in enumerate(r)
        if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0
    ]
    assert not bad, (
        f"{name}: oracle emits -0.0 at {bad[:3]} — the driver hash "
        f"distinguishes ±0.0 and Spark's summation order differs; "
        f"normalize with `+ 0.0` on BOTH engines"
    )
