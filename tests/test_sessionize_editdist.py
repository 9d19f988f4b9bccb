"""Batch sessionize + exact edit-distance near-dup vs brute-force oracles."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.dedup import edit_distance_pairs
from duckdb_spatial_spark.operators.temporal import sessionize


def _brute_sessions(rows, gap):
    """rows: (k, ts, rid) → {rid: session_id} (0-based per key)."""
    out = {}
    by_k = {}
    for k, ts, rid in rows:
        by_k.setdefault(k, []).append((ts, rid))
    for k, evs in by_k.items():
        evs.sort()
        sid = -1
        prev = None
        for ts, rid in evs:
            if prev is None or ts - prev > gap:
                sid += 1
            out[rid] = sid
            prev = ts
    return out


def test_sessionize_vs_brute_and_duckdb(spark):
    rng = random.Random(3)
    rows = [(i % 4, rng.randint(0, 100_000), i) for i in range(800)]
    # force duplicate timestamps within a key (the tie case)
    rows += [(0, rows[0][1], 9000 + j) for j in range(3)]
    df = spark.createDataFrame(rows, "k int, ts long, rid long")
    got = {r["rid"]: r["session_id"]
           for r in sessionize(df, ["k"], "ts", gap_us=500,
                               order_cols=["rid"]).collect()}
    # brute with the same (ts, rid) total order
    brute_rows = sorted(rows, key=lambda x: (x[0], x[1], x[2]))
    exp = _brute_sessions([(k, t, r) for k, t, r in brute_rows], 500)
    assert got == exp

    # DuckDB window replica — same formulation any SQL engine can run
    con = duckdb.connect()
    con.execute("CREATE TABLE e AS SELECT * FROM (VALUES " + ",".join(
        f"({k},{t},{r})" for k, t, r in rows) + ") t(k, ts, rid)")
    dd = {r[0]: r[1] for r in con.execute("""
        SELECT rid, CAST(sum(new_s) OVER (
                 PARTITION BY k ORDER BY ts, rid
                 ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
        FROM (SELECT k, ts, rid,
                     CASE WHEN lag(ts) OVER (PARTITION BY k
                                             ORDER BY ts, rid) IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY k
                                                ORDER BY ts, rid) > 500
                          THEN 1 ELSE 0 END AS new_s
              FROM e)
    """).fetchall()}
    assert got == dd


def test_sessionize_single_event_and_gap_edges(spark):
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 500, 2), (1, 1001, 3), (2, 7, 4)],
        "k int, ts long, rid long")
    got = {r["rid"]: r["session_id"]
           for r in sessionize(df, ["k"], "ts", gap_us=500,
                               order_cols=["rid"]).collect()}
    # gap == 500 is NOT a new session (strict >); 501 is
    assert got == {1: 0, 2: 0, 3: 1, 4: 0}


def _brute_ed(strings, d):
    import functools

    @functools.lru_cache(maxsize=None)
    def lev(a, b):
        if not a:
            return len(b)
        if not b:
            return len(a)
        if a[0] == b[0]:
            return lev(a[1:], b[1:])
        return 1 + min(lev(a[1:], b), lev(a, b[1:]), lev(a[1:], b[1:]))

    out = set()
    ids = sorted(strings)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1:]:
            dist = lev(strings[ia], strings[ib])
            if dist <= d:
                out.add((ia, ib, dist))
    return out


def test_edit_distance_pairs_exact(spark):
    rng = random.Random(11)
    base = ["hello world", "spark engine", "data pipeline", "abc",
            "tokenizer", "a", ""]
    strings = {}
    rid = 0
    for b in base:
        for _ in range(3):
            s = list(b)
            for _ in range(rng.randint(0, 2)):  # up to 2 random edits
                op = rng.choice("ins del sub".split())
                pos = rng.randint(0, max(len(s) - 1, 0))
                if op == "ins":
                    s.insert(pos, rng.choice("xyz"))
                elif op == "del" and s:
                    del s[pos]
                elif s:
                    s[pos] = rng.choice("xyz")
            strings[rid] = "".join(s)
            rid += 1
    df = spark.createDataFrame(
        [(i, t) for i, t in strings.items()], "id long, t string")
    for d in (0, 1, 2):
        got = {(r["id_a"], r["id_b"], r["distance"])
               for r in edit_distance_pairs(df, "id", "t",
                                            max_distance=d).collect()}
        assert got == _brute_ed(strings, d), d


def test_edit_distance_short_guard(spark):
    df = spark.createDataFrame(
        [(i, "ab") for i in range(50)], "id long, t string")
    with pytest.raises(ValueError, match="short"):
        edit_distance_pairs(df, "id", "t", max_distance=1,
                            max_short_rows=10)


def test_edit_distance_pairs_fuzz(spark):
    """Randomized corpora over a tiny alphabet (maximizes collisions and
    short strings — the hard cases for the positional-gram bound and the
    short-string tier) must match brute force for every (d, q)."""
    rng = random.Random(99)
    for trial in range(3):
        strings = {
            i: "".join(rng.choice("abc")
                       for _ in range(rng.randint(0, 10)))
            for i in range(40)
        }
        df = spark.createDataFrame(
            [(i, t) for i, t in strings.items()], "id long, t string")
        for d, q in ((1, 2), (2, 3), (0, 3)):
            got = {(r["id_a"], r["id_b"], r["distance"])
                   for r in edit_distance_pairs(
                       df, "id", "t", max_distance=d, q=q).collect()}
            assert got == _brute_ed(strings, d), (trial, d, q)
