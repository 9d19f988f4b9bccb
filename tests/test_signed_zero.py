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


def test_cross_engine_round_sign_divergence_and_normalization(spark):
    """Pin the MECHANISM of the signed-zero class: DuckDB's round() of a
    tiny negative yields -0.0 while Spark's yields +0.0 — so any rounded
    signed output diverges the moment data lands inside the rounding
    epsilon — and `+ 0.0` restores agreement in both engines."""
    from pyspark.sql import functions as F

    vals = [-1e-9, -4.9e-7, 1e-9, -0.0, 0.0]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    srows = sdf.select(
        F.round("x", 6).alias("raw"),
        (F.round("x", 6) + F.lit(0.0)).alias("norm"),
    ).collect()
    con = duckdb.connect()
    for v, srow in zip(vals, srows):
        draw, dnorm = con.execute(
            "SELECT round(CAST(? AS DOUBLE), 6),"
            " round(CAST(? AS DOUBLE), 6) + 0.0", [v, v]).fetchone()
        # normalized values agree INCLUDING the sign bit
        assert math.copysign(1.0, srow["norm"]) == math.copysign(1.0, dnorm), v
        assert srow["norm"] == dnorm == 0.0
    # and the divergence is real: raw rounding disagrees on the sign for
    # a tiny negative (if an engine ever changes this, the class is gone
    # and the + 0.0 sweep becomes optional — update the notes)
    draw = con.execute(
        "SELECT round(CAST(-1e-9 AS DOUBLE), 6)").fetchone()[0]
    sraw = srows[0]["raw"]
    assert math.copysign(1.0, draw) == -1.0, "DuckDB stopped emitting -0.0"
    assert math.copysign(1.0, sraw) == 1.0, "Spark started emitting -0.0"
