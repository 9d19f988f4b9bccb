"""Randomized cross-engine parity for the interval join: the bucket-grid
equi-join (with its long-interval divert tier) vs DuckDB's plain range
join on the same closed-interval predicate. Random keyed interval sets
with zero-length intervals, exact-touch boundaries, long outliers (to
force the divert path), and small bucket widths (to force multi-bucket
fan-out).
"""
from __future__ import annotations

import random

import duckdb

from duckdb_spatial_spark.operators.temporal import interval_join


def _duck(li, ri):
    con = duckdb.connect()
    con.execute("CREATE TABLE l (k BIGINT, s DOUBLE, e DOUBLE, lid BIGINT)")
    con.execute("CREATE TABLE r (k BIGINT, s DOUBLE, e DOUBLE, rid BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?, ?)", li)
    con.executemany("INSERT INTO r VALUES (?, ?, ?, ?)", ri)
    return sorted(con.execute(
        "SELECT l.lid, r.rid FROM l JOIN r ON l.k = r.k "
        "AND l.s <= r.e AND r.s <= l.e").fetchall())


def test_interval_join_fuzz_vs_duckdb(spark):
    rng = random.Random(5150)
    for trial in range(5):
        nl, nr = rng.randint(1, 30), rng.randint(1, 30)

        def mk(n):
            out = []
            for i in range(n):
                s = rng.randint(0, 200)
                # mostly short, sometimes zero-length, sometimes a long
                # outlier that must divert past max_buckets_per_row
                ln = rng.choice([0, rng.randint(1, 10),
                                 rng.randint(150, 400)])
                out.append((rng.randint(0, 2), float(s), float(s + ln), i))
            return out

        li, ri = mk(nl), mk(nr)
        want = _duck(li, ri)

        ldf = spark.createDataFrame(
            li, "k long, s double, e double, lid long")
        rdf = spark.createDataFrame(
            ri, "k long, s double, e double, rid long")
        got_df = interval_join(ldf, rdf, "s", "e", "s", "e", by=["k"],
                               bucket_width=3.0, max_buckets_per_row=20)
        got = sorted((r["lid"], r["rid_r"] if "rid_r" in got_df.columns
                      else r["rid"]) for r in got_df.collect())
        assert got == want, (trial, li[:8], ri[:8])
