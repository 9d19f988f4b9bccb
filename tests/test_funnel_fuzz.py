"""Randomized parity for the batch funnel operator against an
independent pure-Python greedy reference — duplicates, ties, non-step
event types, within-window constraints, and multi-step chains all drawn
from a seeded RNG. The q143/q152/q153 family's semantics (greedy
earliest-match, strictly-after ordering, window measured from the
step-1 match) must hold on every stream shape, not just the testdata's.
"""
from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.temporal import funnel

STEPS = ["view", "click", "buy"]
NOISE = ["scroll", "hover"]


def ref_funnel(events, steps, within_us=None):
    """Pure-Python greedy earliest-match reference.

    events: list of (user, ts_us, type). Returns {user: (depth,
    t_first_us, t_last_us)} for users who hit step 1.
    """
    out = {}
    by_user = {}
    for u, t, ty in events:
        by_user.setdefault(u, []).append((t, ty))
    for u, evs in by_user.items():
        s1 = [t for t, ty in evs if ty == steps[0]]
        if not s1:
            continue
        first = min(s1)
        prev = first
        depth = 1
        last = first
        for s in steps[1:]:
            cand = [t for t, ty in evs if ty == s and t > prev]
            if within_us is not None:
                cand = [t for t in cand if t <= first + within_us]
            if not cand:
                break
            prev = min(cand)
            depth += 1
            last = prev
        out[u] = (depth, first, last)
    return out


def _run(spark, events, within_us=None):
    rows = [
        (u,
         datetime.datetime.fromtimestamp(t / 1e6,
                                         tz=datetime.timezone.utc)
         .replace(tzinfo=None),
         ty)
        for u, t, ty in events
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, "
                                     "event_type string")
    got = funnel(df, STEPS, within_us=within_us).collect()
    return {r["user_id"]: (r["steps_completed"], r["t_first_us"],
                           r["t_last_us"]) for r in got}


def test_funnel_fuzz_vs_python_reference(spark):
    rng = random.Random(1234)
    for trial in range(8):
        n_users = rng.randint(1, 12)
        events = []
        for u in range(n_users):
            for _ in range(rng.randint(0, 15)):
                # second-aligned so the timestamp round-trip is exact
                t = rng.randint(0, 5000) * 1_000_000
                ty = rng.choice(STEPS + NOISE)
                events.append((u, t, ty))
        if not events:
            continue
        within = rng.choice([None, 500 * 1_000_000, 1 * 1_000_000])
        want = ref_funnel(events, STEPS, within)
        got = _run(spark, events, within)
        assert got == want, (trial, within, sorted(events)[:20])


def test_funnel_tie_on_equal_timestamps_is_strictly_after(spark):
    # a click at exactly the view's time must NOT count (strictly after)
    events = [(1, 1_000_000, "view"), (1, 1_000_000, "click"),
              (1, 2_000_000, "click"), (1, 2_000_000, "buy")]
    want = ref_funnel(events, STEPS)
    got = _run(spark, events)
    assert got == want == {1: (2, 1_000_000, 2_000_000)}


def test_session_funnel_equals_funnel_fuzz(spark):
    """session_funnel (one-pass chained window mins, round 11) must be
    RESULT-identical to funnel() on the same keyed input — same greedy
    earliest-match semantics, different plan. Multi-key form included
    (the q152 no-second-exchange shape)."""
    from duckdb_spatial_spark.operators.temporal import session_funnel

    rng = random.Random(23)
    for trial in range(5):
        events = []
        for u in range(rng.randint(3, 12)):
            t = 0
            for _ in range(rng.randint(0, 25)):
                t += rng.randint(0, 5) * 1_000_000
                ty = rng.choice(STEPS + NOISE + STEPS)
                events.append((u, t, ty))
        rng.shuffle(events)
        rows = [(u,
                 datetime.datetime.fromtimestamp(
                     t / 1e6, tz=datetime.timezone.utc)
                 .replace(tzinfo=None), ty)
                for u, t, ty in events]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string")
        want = sorted(tuple(r) for r in funnel(df, STEPS).collect())
        got = sorted(tuple(r) for r in
                     session_funnel(df, STEPS, key_col="user_id").collect())
        assert got == want, trial
        # multi-key: (user, parity-of-second) as composite session key
        df2 = df.withColumn("g", (F.unix_micros("ts") % 2).cast("long"))
        got2 = sorted(
            tuple(r) for r in
            session_funnel(df2, STEPS,
                           key_col=["user_id", "g"]).collect())
        keyed = df2.select(
            (F.col("user_id") * 2 + F.col("g")).alias("k"),
            "ts", "event_type")
        want2 = sorted(
            (r[0] // 2, r[0] % 2, r[1], r[2], r[3])
            for r in funnel(keyed, STEPS, user_col="k").collect())
        assert got2 == want2, trial
