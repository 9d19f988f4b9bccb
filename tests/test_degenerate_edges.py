"""Pins for the round-9 degenerate-data gate findings (the full gate is
scripts/make_degenerate_sf.py + scripts/check_oracle.py; these unit
tests pin each fixed behavior fast):

1. zero-norm cosine → -1.0, matching DuckDB's list_cosine_similarity
   (the raw division THREW under ANSI);
2. token_count('') / whitespace-only → 0, and the oracle twin replays
   the guard (DuckDB string_split_regex('') yields [''] → len 1);
3. a zero-token document never 'spans' a packing boundary;
4. the IVF probe set breaks similarity ties by ascending cell id (the
   SQL twin's ORDER BY sim DESC, cid), not argpartition's partial order.
"""
from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.similarity import cosine_similarity
from duckdb_spatial_spark.operators.textops import token_count


def test_zero_vector_cosine_matches_duckdb(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0]), ([0.0, 0.0], [0.0, 0.0]),
         ([1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>")
    got = [r.c for r in df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()]
    con = duckdb.connect()
    want = [con.execute(
        "SELECT list_cosine_similarity(?::DOUBLE[], ?::DOUBLE[])",
        [a, b]).fetchone()[0]
        for a, b in [([0.0, 0.0], [1.0, 2.0]), ([0.0, 0.0], [0.0, 0.0]),
                     ([1.0, 0.0], [0.0, 1.0])]]
    assert got == want == [-1.0, -1.0, 0.0]


def test_token_count_empty_and_whitespace(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("two words",)], "t string")
    got = [r.n for r in
           df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [0, 0, 1, 2]
    # the guarded oracle form agrees (raw string_split_regex gives 1)
    con = duckdb.connect()
    for t, n in [("", 0), ("   ", 0), ("one", 1), ("two words", 2)]:
        w = con.execute(
            "SELECT CASE WHEN length(trim(?)) = 0 THEN 0 "
            "ELSE len(string_split_regex(trim(?), '\\s+')) END",
            [t, t]).fetchone()[0]
        assert w == n, t


def test_pack_sequences_zero_token_doc_never_spans(spark):
    from duckdb_spatial_spark.operators.pipeline import pack_sequences

    # doc 2 has 0 tokens and sits exactly on the capacity cut
    rows = [(1, 4), (2, 0), (3, 3)]
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    out = pack_sequences(df, "doc_id", "tokens", capacity=4,
                         num_partitions=2)
    got = {r["doc_id"]: (r["start_off"], r["spans_boundary"])
           for r in out.collect()}
    assert got[2] == (4, False)
    assert got[1] == (0, False)
    assert got[3] == (4, False)


def test_ivf_probe_set_tie_breaks_by_cell_id():
    from duckdb_spatial_spark.operators.similarity import _assign_cells_udf

    # call the inner numpy logic through the udf's closure shape: a zero
    # query is equally similar to every centroid, so the probe set must
    # be the LOWEST nprobe cell ids
    C = np.eye(6, dtype=np.float64)
    udf = _assign_cells_udf(C, 3)
    fn = udf.func  # the pandas_udf wraps the plain function
    import pandas as pd
    out = fn(pd.Series([[0.0] * 6, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0]]))
    assert list(out.iloc[0]) == [0, 1, 2]        # full tie → lowest cids
    assert out.iloc[1][0] == 0                   # true nearest first
