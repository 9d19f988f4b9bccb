"""q148's z-score shape on DEGENERATE groups: a constant-valued group
has stddev 0, where Spark's ANSI mode throws DIVIDE_BY_ZERO but DuckDB
yields NULL z-scores — the query must use try_divide so both engines
agree (NULL aggregate row, exact count). Runs the REAL entry query on a
synthetic events.parquet containing a constant group, then the real
oracle on the same file.
"""
from __future__ import annotations

import datetime
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402


def test_q148_constant_group_matches_oracle(spark, tmp_path):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 10, "flat", ts, 5.0),       # constant group: stddev = 0
        (2, 11, "flat", ts, 5.0),
        (3, 12, "vary", ts, 1.0),
        (4, 13, "vary", ts, 3.0),
        (5, 14, "solo", ts, 9.0),       # 1-row group: stddev NULL
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    sf = str(tmp_path)
    df.coalesce(1).write.parquet(sf + "/events.parquet")

    got = sorted(map(tuple,
                     entry.q148_group_zscore(spark, sf).collect()))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * "
                f"FROM read_parquet('{sf}/events.parquet/*.parquet')")
    want = sorted(con.execute(
        entry.oracle_sql()["q148_group_zscore"]).fetchall())

    assert got == want
    flat = [r for r in got if r[0] == "flat"][0]
    assert flat[1] == 2 and flat[2] is None and flat[4] is None
