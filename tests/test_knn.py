"""Spatial KNN join: broadcast tier vs a naive reference, grid tier's
exactness flag semantics."""
import math
import random

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.knn import st_knn_join

K = 4


def _naive(lpts, rpts, k):
    out = {}
    for li, lx, ly in lpts:
        d = sorted(((math.hypot(lx - rx, ly - ry), ri)
                    for ri, rx, ry in rpts))
        out[li] = [(ri, dist) for dist, ri in d[:k]]
    return out


@pytest.fixture(scope="module")
def pts(spark):
    rng = random.Random(5)
    lpts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(80)]
    rpts = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(60)]
    left = spark.createDataFrame(lpts, "left_id long, x double, y double")
    right = spark.createDataFrame(rpts, "right_id long, x double, y double")
    return lpts, rpts, left, right


def test_knn_broadcast_matches_reference(spark, pts):
    lpts, rpts, left, right = pts
    got = st_knn_join(left, right, k=K).collect()
    want = _naive(lpts, rpts, K)
    by_left = {}
    for r in got:
        by_left.setdefault(r.left_id, []).append(r)
    assert set(by_left) == {p[0] for p in lpts}
    for li, rows in by_left.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, K + 1))
        assert all(r.exact for r in rows)
        for r, (ri, dist) in zip(rows, want[li]):
            assert r.right_id == ri
            assert r.dist == pytest.approx(dist, rel=1e-12)


def test_knn_tie_break_by_right_id(spark):
    # four rights equidistant from the left point → ids 1,2,3 win
    left = spark.createDataFrame([(0, 0.0, 0.0)],
                                 "left_id long, x double, y double")
    right = spark.createDataFrame(
        [(i, [1.0, -1.0, 0.0, 0.0][i], [0.0, 0.0, 1.0, -1.0][i])
         for i in range(4)],
        "right_id long, x double, y double")
    rows = sorted(st_knn_join(left, right, k=3).collect(),
                  key=lambda r: r.rank)
    assert [r.right_id for r in rows] == [0, 1, 2]


def test_knn_grid_exact_flag_and_agreement(spark, pts):
    lpts, rpts, left, right = pts
    g = st_knn_join(left, right, k=K, algorithm="grid",
                    cell=25.0, ring=2).collect()
    want = _naive(lpts, rpts, K)
    by_left = {}
    for r in g:
        by_left.setdefault(r.left_id, []).append(r)
    n_exact = 0
    for li, rows in by_left.items():
        rows.sort(key=lambda r: r.rank)
        if rows[0].exact:
            n_exact += 1
            # flagged-exact rows must equal the reference
            assert [r.right_id for r in rows] == [w[0] for w in want[li]], li
            for r, (_, dist) in zip(rows, want[li]):
                assert r.dist == pytest.approx(dist, rel=1e-12)
    # with cell=25/ring=2 the searched radius is 50 on a 100² extent —
    # nearly every probe resolves exactly
    assert n_exact >= 0.9 * len(lpts)
    # guarantee soundness on EVERY row, exact or not: no flagged row may
    # contradict the reference
    # (non-exact rows are allowed to miss neighbors, not to invent them)
    for li, rows in by_left.items():
        ref_ids = {w[0] for w in want[li]}
        for r in rows:
            if r.exact:
                assert r.right_id in ref_ids


def test_knn_k_larger_than_right(spark):
    left = spark.createDataFrame([(0, 0.0, 0.0)],
                                 "left_id long, x double, y double")
    right = spark.createDataFrame([(7, 1.0, 0.0), (9, 2.0, 0.0)],
                                  "right_id long, x double, y double")
    rows = sorted(st_knn_join(left, right, k=10).collect(),
                  key=lambda r: r.rank)
    assert [(r.right_id, r.rank) for r in rows] == [(7, 1), (9, 2)]


def test_knn_haversine(spark):
    """lon/lat KNN against the great-circle formula (reference radius)."""
    import math

    R = 6370986.884258304
    lpts = [(0, 2.35, 48.85)]  # Paris-ish
    rpts = [(1, -0.13, 51.51), (2, 13.41, 52.52), (3, 2.35, 48.86),
            (4, -74.01, 40.71)]
    left = spark.createDataFrame(lpts, "left_id long, x double, y double")
    right = spark.createDataFrame(rpts, "right_id long, x double, y double")
    rows = sorted(st_knn_join(left, right, k=4, metric="haversine")
                  .collect(), key=lambda r: r.rank)

    def hav(lon1, lat1, lon2, lat2):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dl = math.radians(lon2 - lon1)
        dp = p2 - p1
        a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) \
            * math.sin(dl / 2) ** 2
        return 2 * R * math.asin(math.sqrt(a))

    want = sorted((hav(2.35, 48.85, x, y), i) for i, x, y in rpts)
    assert [r.right_id for r in rows] == [w[1] for w in want]
    for r, (d, _) in zip(rows, want):
        assert r.dist == pytest.approx(d, rel=1e-12)
    # nearest is the 1km-away point, farthest is New York
    assert rows[0].right_id == 3 and rows[-1].right_id == 4


def test_knn_grid_empty_ring_flagged(spark):
    """A probe whose whole ring is empty must surface with exact=false
    (not silently vanish)."""
    left = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 500.0, 500.0)],
        "left_id long, x double, y double")
    right = spark.createDataFrame([(7, 1.0, 1.0)],
                                  "right_id long, x double, y double")
    rows = {r.left_id: r for r in
            st_knn_join(left, right, k=1, algorithm="grid",
                        cell=10.0, ring=1).collect()}
    assert rows[0].right_id == 7 and rows[0].exact
    assert rows[1].right_id is None and rows[1].rank == 0 \
        and not rows[1].exact


def test_knn_same_id_name_raises(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0)], "id long, x double, y double")
    with pytest.raises(ValueError):
        st_knn_join(df, df, k=1, left_id="id", right_id="id")
