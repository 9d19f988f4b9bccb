"""Property pin for streaming_funnel's state eviction.

The eviction must be OUTPUT-NEUTRAL: for any arrival order, any
watermark progression consistent with Spark's contract (new events are
never below the watermark), the greedy funnel computed over compacted
state + new arrivals equals the funnel over the full retained history.
And once the watermark passes the matches, state must be bounded (≤1
time per step list).

Pure-Python (no SparkSession): exercises the same helper the stateful
operator calls.
"""
from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

from duckdb_spatial_spark.streaming.ops import _funnel_compact  # noqa: E402


def greedy(t1s, t2s, t3s):
    if not t1s:
        return (0, None, None)
    m1 = min(t1s)
    elig2 = [t for t in t2s if t > m1]
    if not elig2:
        return (1, m1, m1)
    m2 = min(elig2)
    elig3 = [t for t in t3s if t > m2]
    if not elig3:
        return (2, m1, m2)
    return (3, m1, min(elig3))


def test_eviction_is_output_neutral_under_random_streams():
    rng = random.Random(42)
    for trial in range(300):
        n_batches = rng.randint(1, 6)
        # full-history state vs compacted state, fed identically
        full = ([], [], [])
        comp = ([], [], [])
        wm = 0
        for _ in range(n_batches):
            batch = [(rng.randint(0, 2), rng.randint(wm, wm + 50))
                     for _ in range(rng.randint(0, 8))]
            for step, t in batch:
                full[step].append(t)
                comp[step].append(t)
            assert greedy(*full) == greedy(*comp), (trial, full, comp)
            # watermark advances to at most the smallest future arrival
            wm = wm + rng.randint(0, 20)
            comp = _funnel_compact(list(comp[0]), list(comp[1]),
                                   list(comp[2]), wm)


def test_state_bounded_once_watermark_passes_matches():
    t1s, t2s, t3s = [10, 40], [5, 15, 25, 90], [12, 20, 30, 99]
    # greedy: m1=10, m2=15, m3=20
    c1, c2, c3 = _funnel_compact(t1s, t2s, t3s, wm_us=100)
    assert c1 == [10]
    assert c2 == [15]
    assert c3 == [20]
    assert greedy(c1, c2, c3) == greedy(t1s, t2s, t3s)


def test_depth1_user_evicts_dead_step3_times():
    # ADVICE r9: a user stuck at depth 1 (no eligible step-2 match) with
    # a high-volume step-3 event type must not retain step-3 times
    # forever. Once the watermark freezes m1 and t2s holds nothing above
    # it, any FUTURE step-2 match is >= wm, so step-3 times <= wm are
    # dead.
    t1s, t2s, t3s = [10], [5, 8], list(range(11, 100))
    c1, c2, c3 = _funnel_compact(t1s, t2s, t3s, wm_us=100)
    assert c1 == [10]
    assert c2 == []          # all <= frozen m1
    assert c3 == []          # all <= wm: never strictly above a future m2
    # keep a step-3 time strictly above the watermark — still live
    _, _, c3b = _funnel_compact([10], [5], [50, 150], 100)
    assert c3b == [150]
    # output-neutrality: a future step-2 event (>= wm per the lateness
    # contract) must produce the same funnel from compacted state
    for t2_new in (100, 101, 140, 149, 151, 200):
        full = ([10], [5, 8], list(range(11, 100)) + [150])
        comp = _funnel_compact(*[list(x) for x in full], 100)
        full[1].append(t2_new)
        comp2 = (comp[0], comp[1] + [t2_new], comp[2])
        assert greedy(*full) == greedy(*comp2), t2_new


def test_no_watermark_keeps_late_candidates():
    # wm below m1: a later, earlier step-1 event could still arrive and
    # make the small step-2 times eligible — they must be retained
    t1s, t2s, t3s = [10], [5, 15], [12]
    c1, c2, c3 = _funnel_compact(t1s, t2s, t3s, wm_us=0)
    assert 5 in c2 and 15 in c2
    assert greedy(c1, c2, c3) == greedy(t1s, t2s, t3s)
