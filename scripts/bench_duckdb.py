"""DuckDB baseline timer: run each oracle_sql() query in DuckDB (spatial
extension if available, else plain SQL oracles) at the same sf as bench.py
and print one JSON line {query: sec}. This is the denominator for the
"within 2x of baseline" criterion in BASELINE.json.

Usage: python scripts/bench_duckdb.py [sf_dir] [query_name ...]
       (query names filter the run, like bench.py's argv filter)
"""
from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# an argument is the sf dir when it IS a directory (so a bare relative
# 'sf0.1' works); the path-separator heuristic is only the fallback for
# not-yet-existing paths. Everything else is a query-name filter.
_dirs = [a for a in sys.argv[1:]
         if os.path.isdir(a) or os.path.sep in a]
ONLY = {a for a in sys.argv[1:] if a not in _dirs}
SF = _dirs[0] if _dirs else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import __spark_entry__ as entry

    con = duckdb.connect()
    try:
        con.execute("INSTALL spatial; LOAD spatial;")
        have_spatial = True
    except Exception:
        have_spatial = False
    for t in TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    oracles = entry.oracle_sql()
    unknown = ONLY - set(oracles)
    if unknown:
        sys.exit(f"bench_duckdb: unknown query name(s): {sorted(unknown)}")
    timings: dict[str, float] = {}
    for name, sql in oracles.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:
            timings[name] = -1.0
            print(f"# duckdb error {name}: {e}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(json.dumps({
        "metric": "duckdb_baseline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF.rstrip("/").rsplit("sf", 1)[-1],
        "spatial_ext": have_spatial,
    }))


if __name__ == "__main__":
    main()
