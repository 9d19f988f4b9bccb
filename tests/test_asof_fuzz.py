"""Randomized cross-engine parity for the as-of join: the Spark
union-tag-window implementation vs DuckDB's NATIVE ASOF JOIN (a
sort-merge range probe — a genuinely independent algorithm). Random
keyed streams with duplicate timestamps, ties, keys missing on one
side, and tolerance windows.
"""
from __future__ import annotations

import random

import duckdb

from duckdb_spatial_spark.operators.temporal import asof_join


def _duck_asof(levents, revents, tolerance_us=None):
    """DuckDB native ASOF LEFT JOIN on (k), backward, ties match."""
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, t BIGINT, lid BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, t BIGINT, val DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", levents)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", revents)
    rows = con.execute(
        "SELECT l.k, l.t, l.lid, r.t AS mt, r.val "
        "FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t "
        "ORDER BY l.k, l.t, l.lid").fetchall()
    out = []
    for k, t, lid, mt, val in rows:
        if tolerance_us is not None and mt is not None \
                and t - mt > tolerance_us:
            mt, val = None, None
        out.append((k, t, lid, mt, val))
    return sorted(out)


def test_asof_join_fuzz_vs_duckdb_native(spark):
    rng = random.Random(99)
    for trial in range(6):
        nl = rng.randint(1, 40)
        nr = rng.randint(0, 40)
        levents = [(rng.randint(0, 4), rng.randint(0, 100), i)
                   for i in range(nl)]
        revents = [(rng.randint(0, 4), rng.randint(0, 100),
                    float(rng.randint(0, 9))) for _ in range(nr)]
        # duplicate (k, t) on the right would make the matched val
        # nondeterministic in BOTH engines — dedupe to the max val
        # (deterministic canonical form for the comparison)
        best = {}
        for k, t, v in revents:
            best[(k, t)] = max(v, best.get((k, t), v))
        revents = [(k, t, v) for (k, t), v in best.items()]
        tol = rng.choice([None, 10, 0])

        want = _duck_asof(levents, revents, tol)

        ldf = spark.createDataFrame(levents, "k long, t long, lid long")
        rdf = spark.createDataFrame(revents, "k long, t long, val double")
        got_df = asof_join(ldf, rdf, "t", "t", by=["k"],
                           value_cols=["val"], direction="backward",
                           tolerance_us=tol)
        got = sorted(
            (r["k"], r["t"], r["lid"], r["matched_t"], r["val"])
            for r in got_df.collect()
        )
        assert got == want, (trial, tol, levents[:10], revents[:10])
