"""Isotonic (PAV) calibration: the minimax fit vs an INDEPENDENT
stack-based pool-adjacent-violators reference in exact rational
arithmetic, plus bit-level cross-engine parity with the DuckDB twin."""
from __future__ import annotations

import random
from fractions import Fraction

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.classify import (isotonic_calibrate,
                                                     isotonic_sql)


def pav_reference(pairs):
    """Classic stack PAV over (cnt, pos) blocks in order — exact
    Fractions, merging while the left block's mean exceeds the right's.
    Independent algorithm from the operator's minimax formulation."""
    stack = []  # (n_input_blocks, cnt, pos)
    for cnt, pos in pairs:
        stack.append((1, cnt, pos))
        while len(stack) >= 2:
            k2, c2, p2 = stack[-1]
            k1, c1, p1 = stack[-2]
            if Fraction(p1, c1) <= Fraction(p2, c2):
                break
            stack[-2:] = [(k1 + k2, c1 + c2, p1 + p2)]
    expanded = []
    for k, cnt, pos in stack:
        expanded.extend([Fraction(pos, cnt)] * k)
    return expanded


def test_minimax_fit_matches_stack_pav_fuzz(spark):
    rng = random.Random(7)
    for trial in range(60):
        m = rng.randint(1, 12)
        data = []
        for b in range(m):
            cnt = rng.randint(1, 6)
            pos = rng.randint(0, cnt)
            for i in range(cnt):
                # score placed inside bin b of [0,1) at n_bins=m... use
                # n_bins = 16 and spread bins over [0,1)
                s = (b + 0.5) / 16.0
                data.append((s, 1 if i < pos else 0))
        rng.shuffle(data)
        df = spark.createDataFrame(data, "score double, label int")
        got = isotonic_calibrate(df, "score", "label", n_bins=16).collect()
        pairs = []
        by_bin = {}
        for s, y in data:
            b = int(s * 16)
            c, p = by_bin.get(b, (0, 0))
            by_bin[b] = (c + 1, p + y)
        pairs = [by_bin[b] for b in sorted(by_bin)]
        want = pav_reference(pairs)
        assert len(got) == len(want)
        # monotone non-decreasing and equal to the exact PAV solution
        prev = None
        for row, w in zip(sorted(got, key=lambda r: r["bin"]), want):
            assert row["calibrated"] == pytest.approx(float(w), abs=1e-12)
            if prev is not None:
                assert row["calibrated"] >= prev - 1e-12
            prev = row["calibrated"]


def test_cross_engine_bit_parity(spark):
    rng = random.Random(21)
    data = [(rng.random(), 1 if rng.random() < 0.3 + 0.6 * rng.random()
             else 0) for _ in range(400)]
    df = spark.createDataFrame(data, "score double, label int")
    got = {r["bin"]: (r["n_docs"], r["n_pos"], r["calibrated"])
           for r in isotonic_calibrate(df, "score", "label",
                                       n_bins=32).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"({repr(s)}, {y})" for s, y in data)
    sql = isotonic_sql(
        f"SELECT * FROM (VALUES {vals}) t(score, label)", 32)
    want = {b: (n, p, cal) for b, n, p, cal in con.execute(sql).fetchall()}
    assert got.keys() == want.keys()
    for b in want:
        assert got[b][0] == want[b][0]
        assert got[b][1] == want[b][1]
        # BIT-level equality: same int prefix sums, same IEEE division
        assert got[b][2].hex() == want[b][2].hex(), b


def test_null_scores_and_labels_excluded(spark):
    df = spark.createDataFrame(
        [(0.1, 1), (None, 1), (0.9, None), (0.9, 0)],
        "score double, label int")
    rows = isotonic_calibrate(df, "score", "label", n_bins=4).collect()
    assert sum(r["n_docs"] for r in rows) == 2


def test_empty_input_returns_empty(spark):
    df = spark.createDataFrame([], "score double, label int")
    out = isotonic_calibrate(df, "score", "label")
    assert out.columns == ["bin", "n_docs", "n_pos", "calibrated"]
    assert out.count() == 0


def test_out_of_range_scores_clamp_to_edge_bins(spark):
    df = spark.createDataFrame(
        [(-5.0, 0), (0.5, 1), (99.0, 1)], "score double, label int")
    rows = {r["bin"]: r for r in
            isotonic_calibrate(df, "score", "label", n_bins=8).collect()}
    assert 0 in rows and 7 in rows
    assert rows[0]["n_docs"] == 1 and rows[7]["n_docs"] == 1


def test_nan_and_extreme_scores_cross_engine(spark):
    """ADVICE r10: NaN / far-out-of-range scores must not desync the
    engines — NaN rows are excluded on both; ±1e300 clamps to the edge
    bins on both (the double-space clamp BEFORE the int cast)."""
    data = [(0.2, 1), (float("nan"), 1), (1e300, 0), (-1e300, 1),
            (0.7, 0)]
    df = spark.createDataFrame(data, "score double, label int")
    got = {r["bin"]: (r["n_docs"], r["n_pos"], r["calibrated"])
           for r in isotonic_calibrate(df, "score", "label",
                                       n_bins=8).collect()}
    con = duckdb.connect()

    def lit(s):
        return ("CAST('nan' AS DOUBLE)" if s != s
                else f"CAST({repr(s)} AS DOUBLE)")

    vals = ", ".join(f"({lit(s)}, {y})" for s, y in data)
    sql = isotonic_sql(
        f"SELECT * FROM (VALUES {vals}) t(score, label)", 8)
    want = {b: (n, p, cal) for b, n, p, cal in con.execute(sql).fetchall()}
    assert got.keys() == want.keys()
    assert sum(n for n, _, _ in got.values()) == 4  # NaN row dropped
    assert 0 in got and 7 in got                    # ±1e300 clamped
    for b in want:
        assert got[b][:2] == want[b][:2]
        assert got[b][2].hex() == want[b][2].hex(), b
