"""Pin the bench JSON line inside the driver's 2000-char tail buffer.

The round driver keeps only the LAST 2000 chars of bench.py's stdout;
round 4 lost its line to full-name keys. These tests pin the compact
format: unique short keys for every queries() entry, and a projected
line length that stays under budget even at 150 queries with worst-case
two-digit timings.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def test_short_keys_unique_and_numeric():
    names = list(entry.queries())
    keys = [bench.short_key(n) for n in names]
    assert len(set(keys)) == len(keys), "short keys must stay unique"
    assert all(k.isdigit() for k in keys), keys[:5]


def test_projected_line_fits_tail_buffer():
    # current registry with worst-case per-query values (xx.x after
    # short_val's 1-decimal rounding)
    names = list(entry.queries())
    # pad the registry to 165 hypothetical queries — the growth headroom
    names += [f"q{n}_future_query" for n in range(500, 500 + 165 - len(names))]
    q = {bench.short_key(n): bench.short_val(99.94) for n in names}
    line = json.dumps({
        "metric": "headline_queries_total",
        "value": 9999.999,
        "unit": "sec",
        "queries": q,
        "sf": "0.1",
    }, separators=(",", ":"))
    assert len(q) == 165
    assert len(line) < 1800, len(line)


def test_short_val_clamps_and_rounds():
    assert bench.short_val(0.374) == 0.4
    assert bench.short_val(99.94) == 99.9
    assert bench.short_val(12345.6) == 999.9
