"""Randomized parity for resample_ffill against an independent
pure-Python reference: random keyed series with duplicate timestamps,
observation gaps longer than many ticks, observations exactly ON ticks,
keys with a single observation, and explicit/global grid bounds.
"""
from __future__ import annotations

import random

from duckdb_spatial_spark.operators.temporal import resample_ffill


def ref_resample(events, step, start, end):
    """events: list of (key, ts, value). Returns {(key, tick): value}
    with the latest value at-or-before each tick (ties: the later
    observation at the same ts wins per max-ts; equal ts duplicates are
    deduped to max value for determinism before calling this)."""
    keys = sorted({k for k, _, _ in events})
    by_key = {}
    for k, t, v in events:
        by_key.setdefault(k, []).append((t, v))
    out = {}
    for k in keys:
        obs = sorted(by_key.get(k, []))
        tick = start
        while tick <= end:
            prior = [v for t, v in obs if t <= tick]
            out[(k, tick)] = prior[-1] if prior else None
            tick += step
    return out


def test_resample_ffill_fuzz_vs_python_reference(spark):
    rng = random.Random(777)
    for trial in range(6):
        n = rng.randint(1, 40)
        raw = [(rng.randint(0, 3), rng.randint(0, 100) * 10,
                float(rng.randint(1, 99))) for _ in range(n)]
        # dedupe duplicate (key, ts) to max value: forward fill over
        # duplicate timestamps is nondeterministic in any engine
        best = {}
        for k, t, v in raw:
            best[(k, t)] = max(v, best.get((k, t), v))
        events = [(k, t, v) for (k, t), v in best.items()]
        step = rng.choice([7, 10, 25])
        lo = min(t for _, t, _ in events)
        hi = max(t for _, t, _ in events)
        want = ref_resample(events, step, lo, hi)

        df = spark.createDataFrame(events, "k long, ts long, v double")
        got_df = resample_ffill(df, ["k"], "ts", ["v"], step_us=step,
                                start_us=lo, end_us=hi)
        got = {(r["k"], r["tick_us"]): r["v"] for r in got_df.collect()}
        assert got == want, (trial, step, sorted(events)[:12])
