"""Geometry-core golden tests.

Expected values lifted from the reference's sqllogictests
(test/sql/geometry/*.test, test/sql/geos/*.test) — same inputs, same
expected outputs, re-expressed in pytest (SURVEY §5 tier 1).
"""

import math

import numpy as np
import pytest

from duckdb_spatial_spark.geom import Geometry, from_wkb, from_wkt, to_wkb, to_wkt
from duckdb_spatial_spark.geom import kernels as K


# ---- WKT round trip ------------------------------------------------------

@pytest.mark.parametrize(
    "wkt",
    [
        "POINT (1 2)",
        "POINT Z (1 2 3)",
        "POINT M (1 2 4)",
        "POINT ZM (1 2 3 4)",
        "POINT EMPTY",
        "LINESTRING (0 0, 1 1, 2 0)",
        "LINESTRING EMPTY",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "POLYGON EMPTY",
        "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        "GEOMETRYCOLLECTION EMPTY",
        "LINESTRING ZM (1 2 3 4, 5 6 7 8)",
    ],
)
def test_wkt_roundtrip(wkt):
    g = from_wkt(wkt)
    assert to_wkt(g) == wkt
    # WKB round trip preserves everything
    g2 = from_wkb(to_wkb(g))
    assert to_wkt(g2) == wkt


def test_wkt_multipoint_parenthesized():
    g = from_wkt("MULTIPOINT ((1 2), (3 4))")
    assert to_wkt(g) == "MULTIPOINT (1 2, 3 4)"


def test_wkt_case_insensitive():
    assert to_wkt(from_wkt("point(1 2)")) == "POINT (1 2)"


def test_wkb_big_endian():
    import struct

    # big-endian POINT(1 2)
    buf = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 1.0, 2.0)
    assert to_wkt(from_wkb(buf)) == "POINT (1 2)"


# ---- area (test/sql/geometry/st_area.test) -------------------------------

AREA_CASES = [
    ("POINT (0 0)", 0.0),
    ("LINESTRING (0 0, 1 1)", 0.0),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))", 100.0),
    # polygon with hole: 100 - 4
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))", 96.0),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))", 5.0),
    # collection sums polygons only (st_area.test:55-66)
    ("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 9 9), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))", 4.0),
    ("POLYGON EMPTY", 0.0),
    ("POINT Z (1 2 3)", 0.0),
]


@pytest.mark.parametrize("wkt,expected", AREA_CASES)
def test_area(wkt, expected):
    assert K.area(from_wkt(wkt)) == pytest.approx(expected)


def test_area_tiny_precision():
    # st_area.test:119-123 — tiny coordinate deltas
    g = from_wkt("POLYGON ((0 0, 1e-05 0, 1e-05 1e-05, 0 1e-05, 0 0))")
    assert K.area(g) == pytest.approx(1e-10, rel=1e-9)


# ---- length / perimeter --------------------------------------------------

def test_length():
    assert K.length(from_wkt("LINESTRING (0 0, 3 4)")) == 5.0
    assert K.length(from_wkt("MULTILINESTRING ((0 0, 3 4), (0 0, 0 1))")) == 6.0
    # polygons have 0 length in the reference (st_length.cpp)
    assert K.length(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")) == 0.0


def test_perimeter():
    assert K.perimeter(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")) == 40.0
    assert K.perimeter(from_wkt("LINESTRING (0 0, 1 1)")) == 0.0


# ---- centroid -------------------------------------------------------------

def test_centroid():
    c = K.centroid(from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
    assert to_wkt(c) == "POINT (5 5)"
    c = K.centroid(from_wkt("LINESTRING (0 0, 10 0)"))
    assert to_wkt(c) == "POINT (5 0)"
    c = K.centroid(from_wkt("MULTIPOINT (0 0, 10 0)"))
    assert to_wkt(c) == "POINT (5 0)"


# ---- predicates ------------------------------------------------------------

def test_point_in_polygon():
    poly = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    assert K.point_in_polygon(2, 2, poly) == 2
    assert K.point_in_polygon(5, 5, poly) == 0  # in hole
    assert K.point_in_polygon(0, 0, poly) == 1  # boundary
    assert K.point_in_polygon(4, 5, poly) == 1  # hole boundary
    assert K.point_in_polygon(20, 20, poly) == 0


def test_intersects_contains_within():
    poly = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    pt_in = from_wkt("POINT (5 5)")
    pt_border = from_wkt("POINT (0 5)")
    pt_out = from_wkt("POINT (20 20)")
    assert K.intersects(poly, pt_in)
    assert K.intersects(poly, pt_border)
    assert not K.intersects(poly, pt_out)
    assert K.contains(poly, pt_in)
    assert not K.contains(poly, pt_border)  # boundary → not contained (GEOS)
    assert K.covers(poly, pt_border)
    assert K.within(pt_in, poly)
    assert not K.within(pt_border, poly)
    assert K.contains_properly(poly, pt_in)
    assert not K.contains_properly(poly, pt_border)


def test_polygon_polygon_predicates():
    a = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    b = from_wkt("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")  # inside a
    c = from_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")  # overlaps a
    d = from_wkt("POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))")  # touches a at x=10
    e = from_wkt("POLYGON ((100 100, 110 100, 110 110, 100 110, 100 100))")
    assert K.contains(a, b) and K.within(b, a)
    assert K.intersects(a, c) and K.overlaps(a, c)
    assert K.touches(a, d) and not K.overlaps(a, d)
    assert K.disjoint(a, e)
    assert K.equals(a, from_wkt("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"))


def test_line_predicates():
    line = from_wkt("LINESTRING (0 0, 10 10)")
    poly = from_wkt("POLYGON ((2 0, 8 0, 8 20, 2 20, 2 0))")
    assert K.crosses(line, poly)
    inner = from_wkt("LINESTRING (3 3, 4 5)")
    assert K.contains(poly, inner)
    l2 = from_wkt("LINESTRING (0 10, 10 0)")
    assert K.crosses(line, l2)
    assert K.intersects(line, l2)
    l3 = from_wkt("LINESTRING (20 20, 30 30)")
    assert not K.intersects(line, l3)


# ---- distance ---------------------------------------------------------------

def test_distance():
    a = from_wkt("POINT (0 0)")
    b = from_wkt("POINT (3 4)")
    assert K.distance(a, b) == 5.0
    line = from_wkt("LINESTRING (0 10, 10 10)")
    assert K.distance(a, line) == 10.0
    poly = from_wkt("POLYGON ((5 0, 10 0, 10 5, 5 5, 5 0))")
    assert K.distance(a, poly) == 5.0
    inside = from_wkt("POINT (7 2)")
    assert K.distance(inside, poly) == 0.0


def test_haversine():
    # reference test: ~111 km per degree at equator
    d = K.haversine(0.0, 0.0, 1.0, 0.0)
    assert d == pytest.approx(111195.0, rel=1e-3)


# ---- processing ---------------------------------------------------------------

def test_envelope_boundary():
    g = from_wkt("LINESTRING (0 0, 5 5, 10 0)")
    assert to_wkt(K.envelope(g)) == "POLYGON ((0 0, 0 5, 10 5, 10 0, 0 0))"
    b = K.boundary(from_wkt("LINESTRING (0 0, 1 1, 2 2)"))
    assert to_wkt(b) == "MULTIPOINT (0 0, 2 2)"
    b = K.boundary(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 0))"))
    assert to_wkt(b) == "LINESTRING (0 0, 1 0, 1 1, 0 0)"


def test_convex_hull():
    g = from_wkt("MULTIPOINT (0 0, 10 0, 10 10, 0 10, 5 5)")
    h = K.convex_hull(g)
    assert K.area(h) == 100.0
    assert h.type_id == 3


def test_point_on_surface():
    poly = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    p = K.point_on_surface(poly)
    assert K.point_in_polygon(p.coords[0], p.coords[1], poly) == 2


def test_simplify():
    g = from_wkt("LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)")
    s = K.simplify(g, 0.1)
    assert to_wkt(s) == "LINESTRING (0 0, 4 0)"


def test_remove_repeated_points():
    g = from_wkt("LINESTRING (0 0, 0 0, 1 1, 1 1, 2 2)")
    assert to_wkt(K.remove_repeated_points(g)) == "LINESTRING (0 0, 1 1, 2 2)"


def test_reverse_flip():
    g = from_wkt("LINESTRING (0 0, 1 1, 2 2)")
    assert to_wkt(K.reverse(g)) == "LINESTRING (2 2, 1 1, 0 0)"
    assert to_wkt(K.flip_coordinates(from_wkt("POINT (1 2)"))) == "POINT (2 1)"


def test_force_dims():
    g = from_wkt("POINT (1 2)")
    g3 = K.force_dims(g, True, False, z=5.0)
    assert to_wkt(g3) == "POINT Z (1 2 5)"
    g2 = K.force_dims(from_wkt("POINT ZM (1 2 3 4)"), False, False)
    assert to_wkt(g2) == "POINT (1 2)"
    gm = K.force_dims(from_wkt("POINT Z (1 2 3)"), True, True, m=9.0)
    assert to_wkt(gm) == "POINT ZM (1 2 3 9)"


def test_line_merge():
    g = from_wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))")
    assert to_wkt(K.line_merge(g)) == "LINESTRING (0 0, 1 1, 2 2)"
    g = from_wkt("MULTILINESTRING ((0 0, 1 1), (5 5, 6 6))")
    m = K.line_merge(g)
    assert m.type_id == 5 and len(m.parts) == 2


def test_is_valid_simple_ring_closed():
    assert K.is_valid(from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
    # bowtie is invalid
    assert not K.is_valid(from_wkt("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))"))
    assert K.is_simple(from_wkt("LINESTRING (0 0, 1 1, 2 2)"))
    assert not K.is_simple(from_wkt("LINESTRING (0 0, 10 10, 10 0, 0 10)"))
    assert K.is_ring(from_wkt("LINESTRING (0 0, 1 0, 1 1, 0 0)"))
    assert K.is_closed(from_wkt("LINESTRING (0 0, 1 0, 1 1, 0 0)"))
    assert not K.is_closed(from_wkt("LINESTRING (0 0, 1 0)"))


def test_collect():
    from duckdb_spatial_spark.geom import collect

    g = collect([from_wkt("POINT (1 1)"), from_wkt("POINT (2 2)")])
    assert to_wkt(g) == "MULTIPOINT (1 1, 2 2)"
    g = collect([from_wkt("POINT (1 1)"), from_wkt("LINESTRING (0 0, 1 1)")])
    assert g.type_id == 7


def test_collection_extract():
    g = from_wkt("GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))")
    assert to_wkt(K.collection_extract(g, 1)) == "MULTIPOINT (1 1)"
    assert K.collection_extract(g).type_id == 6  # default → polygons


def test_clip_to_box():
    poly = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    c = K.clip_to_box(poly, 5, 5, 15, 15)
    assert K.area(c) == 25.0
    line = from_wkt("LINESTRING (-5 5, 15 5)")
    c = K.clip_to_box(line, 0, 0, 10, 10)
    assert K.length(c) == 10.0
    pt = from_wkt("POINT (1 1)")
    assert not K.clip_to_box(pt, 0, 0, 2, 2).is_empty()
    assert K.clip_to_box(pt, 5, 5, 6, 6).is_empty()


def test_buffer_point():
    b = K.buffer(from_wkt("POINT (0 0)"), 10.0, segments=16)
    assert K.area(b) == pytest.approx(math.pi * 100.0, rel=0.01)
    # lines buffer too now (capsule union — full tests in test_overlay.py)
    lb = K.buffer(from_wkt("LINESTRING (0 0, 1 1)"), 1.0)
    assert K.area(lb) == pytest.approx(2 * math.sqrt(2) + math.pi, rel=0.01)


def test_dwithin():
    a = from_wkt("POINT (0 0)")
    b = from_wkt("POINT (3 4)")
    assert K.dwithin(a, b, 5.0)
    assert not K.dwithin(a, b, 4.99)


def test_seg_predicate_matches_kernels():
    # vectorized 2-point-segment tier vs per-row kernels on random pairs
    from duckdb_spatial_spark.geom import vec as V
    from duckdb_spatial_spark.geom.core import LINESTRING

    rng = np.random.default_rng(7)
    n = 400
    A = rng.integers(-4, 5, size=(n, 2, 2)).astype(float)
    B = rng.integers(-4, 5, size=(n, 2, 2)).astype(float)
    r = A[:, 1] - A[:, 0]
    s = B[:, 1] - B[:, 0]
    ok = (r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]) != 0
    A, B = A[ok], B[ok]
    kern = {
        "intersects": K.intersects, "disjoint": K.disjoint,
        "crosses": K.crosses, "touches": K.touches, "equals": K.equals,
        "contains": K.contains, "within": K.within,
        "covers": K.covers, "coveredby": K.covered_by,
        "overlaps": K.overlaps,
    }
    for pred, fn in kern.items():
        got = V.seg_predicate(pred, A, B)
        assert got is not None
        for i in range(len(A)):
            ga = from_wkt(f"LINESTRING ({A[i,0,0]} {A[i,0,1]}, {A[i,1,0]} {A[i,1,1]})")
            gb = from_wkt(f"LINESTRING ({B[i,0,0]} {B[i,0,1]}, {B[i,1,0]} {B[i,1,1]})")
            assert bool(got[i]) == bool(fn(ga, gb)), (
                pred, A[i].tolist(), B[i].tolist())


def test_seg_predicate_declines_parallel():
    from duckdb_spatial_spark.geom import vec as V

    A = np.array([[[0.0, 0.0], [1.0, 0.0]]])
    B = np.array([[[0.0, 1.0], [1.0, 1.0]]])
    assert V.seg_predicate("intersects", A, B) is None


def test_simplify_preserve_topology():
    # plain simplify collapses & drops a skinny hole; the preserving
    # variant restores it
    poly = from_wkt(
        "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0), "
        "(40 40, 60 40.005, 50 40.01, 40 40))"
    )
    plain = K.simplify(poly, 5.0)
    assert len(plain.rings) == 1  # hole collapsed and dropped
    pres = K.simplify_preserve_topology(poly, 5.0)
    assert len(pres.rings) == 2  # hole kept verbatim
    assert np.array_equal(pres.rings[1], poly.rings[1])
    # shell still simplifies when it stays valid
    wig = from_wkt("POLYGON ((0 0, 50 1, 100 0, 100 100, 0 100, 0 0))")
    pres2 = K.simplify_preserve_topology(wig, 5.0)
    assert len(pres2.rings[0]) == 5  # midpoint dropped
    # linestring behaves like DP when result stays simple
    ln = from_wkt("LINESTRING (0 0, 1 0.001, 2 0)")
    assert len(K.simplify_preserve_topology(ln, 0.1).coords) == 2
