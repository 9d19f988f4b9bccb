"""Grid DBSCAN vs a straightforward reference implementation."""

import math
import random

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.dbscan import dbscan


def _ref_dbscan(pts, eps, min_pts):
    """Reference DBSCAN with smallest-id labels and deterministic border
    assignment (smallest core-neighbor label)."""
    ids = [p[0] for p in pts]
    pos = {p[0]: (p[1], p[2]) for p in pts}
    nbrs = {i: [] for i in ids}
    for i in ids:
        for j in ids:
            if i != j:
                dx = pos[i][0] - pos[j][0]
                dy = pos[i][1] - pos[j][1]
                if dx * dx + dy * dy <= eps * eps:
                    nbrs[i].append(j)
    core = {i for i in ids if 1 + len(nbrs[i]) >= min_pts}
    # components over core-core edges
    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in core:
        root = find(i)
        comp[i] = min(x for x in core if find(x) == root)
    out = {}
    for i in ids:
        if i in core:
            out[i] = (comp[i], "core")
        else:
            cl = [comp[j] for j in nbrs[i] if j in core]
            out[i] = (min(cl), "border") if cl else (-1, "noise")
    return out


@pytest.mark.parametrize("eps,min_pts", [(1.5, 3), (2.0, 4), (0.9, 2)])
def test_dbscan_matches_reference(spark, eps, min_pts):
    rng = random.Random(13)
    # three blobs + scattered noise
    pts = []
    nid = 0
    for cx, cy in [(0, 0), (10, 0), (5, 9)]:
        for _ in range(30):
            pts.append((nid, cx + rng.gauss(0, 0.8), cy + rng.gauss(0, 0.8)))
            nid += 1
    for _ in range(25):
        pts.append((nid, rng.uniform(-5, 15), rng.uniform(-5, 14)))
        nid += 1
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {
        r["id"]: (r["label"], r["role"])
        for r in dbscan(df, "id", "x", "y", eps, min_pts).collect()
    }
    exp = _ref_dbscan(pts, eps, min_pts)
    assert got == exp


def test_dbscan_all_noise_and_single_cluster(spark):
    pts = [(i, float(i * 100), 0.0) for i in range(6)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = dbscan(df, "id", "x", "y", 1.0, 2).collect()
    assert all(r["role"] == "noise" and r["label"] == -1 for r in got)
    pts = [(i, float(i) * 0.1, 0.0) for i in range(6)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = dbscan(df, "id", "x", "y", 0.5, 3).collect()
    assert all(r["role"] == "core" and r["label"] == 0 for r in got)


def test_dbscan_isolated_core_keeps_cluster(spark):
    # a core point whose neighbors are all non-core (star shape):
    # cluster = the core point + its borders
    pts = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, -1.0, 0.0),
           (3, 0.0, 1.0), (4, 0.0, -1.0), (9, 50.0, 50.0)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {r["id"]: (r["label"], r["role"])
           for r in dbscan(df, "id", "x", "y", 1.0, 5).collect()}
    assert got[0] == (0, "core")
    for b in (1, 2, 3, 4):
        assert got[b] == (0, "border")
    assert got[9] == (-1, "noise")
