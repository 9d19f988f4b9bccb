"""General polygon overlay kernels (geom/overlay.py) — intersection, union,
difference on non-axis-aligned, concave, and holed polygons, plus
line∩region. Reference delegates these to GEOS (st_intersection.cpp etc.);
area/length equality is the correctness authority."""

import math

import pytest

from duckdb_spatial_spark.geom import kernels as K
from duckdb_spatial_spark.geom.wkt import from_wkt

TRI_A = from_wkt("POLYGON ((0 0, 10 0, 0 10, 0 0))")
TRI_IN = from_wkt("POLYGON ((1 1, 4 1, 1 4, 1 1))")
SQ = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
DIAM = from_wkt("POLYGON ((5 0, 10 5, 5 10, 0 5, 5 0))")
HOLE = from_wkt(
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
)
U_SHAPE = from_wkt(
    "POLYGON ((0 0, 10 0, 10 10, 6 10, 6 4, 4 4, 4 10, 0 10, 0 0))"
)


def A(g):
    return K.area(g)


def test_triangle_contains_triangle():
    assert A(K.intersection(TRI_A, TRI_IN)) == pytest.approx(4.5)
    assert A(K.union(TRI_A, TRI_IN)) == pytest.approx(50.0)
    assert A(K.difference(TRI_A, TRI_IN)) == pytest.approx(45.5)


def test_square_diamond():
    assert A(K.intersection(SQ, DIAM)) == pytest.approx(50.0)
    assert A(K.union(SQ, DIAM)) == pytest.approx(100.0)
    assert A(K.difference(SQ, DIAM)) == pytest.approx(50.0)
    assert A(K.difference(DIAM, SQ)) == pytest.approx(0.0)


def test_holes_respected():
    assert A(HOLE) == pytest.approx(96.0)
    assert A(K.intersection(HOLE, DIAM)) == pytest.approx(46.0)
    assert A(K.difference(HOLE, DIAM)) == pytest.approx(50.0)


def test_concave_subject():
    assert A(U_SHAPE) == pytest.approx(88.0)
    left = from_wkt("POLYGON ((0 0, 5 0, 5 10, 0 10, 0 0))")
    assert A(K.intersection(U_SHAPE, left)) == pytest.approx(44.0)


def test_partial_overlap_union():
    other = from_wkt("POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")
    assert A(K.union(SQ, other)) == pytest.approx(175.0)
    assert A(K.intersection(SQ, other)) == pytest.approx(25.0)
    assert A(K.difference(SQ, other)) == pytest.approx(75.0)


def test_line_region_intersection():
    ln = from_wkt("LINESTRING (0 5, 10 5)")
    assert K.length(K.intersection(ln, DIAM)) == pytest.approx(10.0)
    assert K.length(K.intersection(ln, HOLE)) == pytest.approx(8.0)
    diag = from_wkt("LINESTRING (0 0, 10 10)")
    assert K.length(K.intersection(diag, DIAM)) == pytest.approx(5 * math.sqrt(2))
    outside = from_wkt("LINESTRING (0 20, 10 20)")
    assert K.length(K.intersection(outside, DIAM)) == pytest.approx(0.0)


def test_polygon_line_argument_order():
    ln = from_wkt("LINESTRING (0 5, 10 5)")
    assert K.length(K.intersection(DIAM, ln)) == pytest.approx(10.0)


def test_union_fills_hole():
    """Union with a polygon covering the hole fills it (the hole-swallow
    predicate case: covered_by(DIAM, HOLE) must be False)."""
    assert not K.covered_by(DIAM, HOLE)
    assert A(K.union(HOLE, DIAM)) == pytest.approx(100.0)
    assert A(K.difference(DIAM, HOLE)) == pytest.approx(4.0)


def test_polygon_inside_hole_disjoint():
    in_hole = from_wkt("POLYGON ((4.5 4.5, 5.5 4.5, 5.5 5.5, 4.5 5.5, 4.5 4.5))")
    assert not K.intersects(in_hole, HOLE)
    assert not K.covered_by(in_hole, HOLE)
    assert A(K.difference(in_hole, HOLE)) == pytest.approx(1.0)


def test_line_line_crossing():
    a = from_wkt("LINESTRING (0 0, 10 10)")
    b = from_wkt("LINESTRING (0 10, 10 0)")
    g = K.intersection(a, b)
    assert g.type_id == 1  # single POINT
    assert tuple(g.coords[:2]) == pytest.approx((5.0, 5.0))


def test_line_line_collinear_overlap():
    a = from_wkt("LINESTRING (0 0, 10 0)")
    b = from_wkt("LINESTRING (4 0, 14 0)")
    g = K.intersection(a, b)
    assert K.length(g) == pytest.approx(6.0)


def test_line_line_disjoint_and_touch():
    a = from_wkt("LINESTRING (0 0, 1 0)")
    b = from_wkt("LINESTRING (5 5, 6 6)")
    assert K.area(K.intersection(a, b)) == 0.0 and K.length(K.intersection(a, b)) == 0.0
    c = from_wkt("LINESTRING (1 0, 2 5)")  # touches a at (1,0)
    g = K.intersection(a, c)
    assert g.type_id == 1
    assert tuple(g.coords[:2]) == pytest.approx((1.0, 0.0))


def test_multiline_multiple_crossings():
    a = from_wkt("LINESTRING (0 5, 20 5)")
    b = from_wkt("MULTILINESTRING ((2 0, 2 10), (8 0, 8 10), (15 0, 15 10))")
    g = K.intersection(a, b)
    assert g.type_id == 4  # MULTIPOINT
    xs = sorted(p.coords[0] for p in g.parts)
    assert xs == pytest.approx([2.0, 8.0, 15.0])


# ---------------------------------------------------------------- buffer
# Closed forms: an n-gon disk (quad_segs q → 4q-gon) has area
# 0.5·4q·d²·sin(2π/4q); capsule end caps sample the same angle grid, so
# segment buffers and convex-corner wedges recompose exact n-gon fractions.

def _ngon_area(d, q=8):
    return 0.5 * (4 * q) * d * d * math.sin(2 * math.pi / (4 * q))


def test_buffer_segment_capsule_area():
    g = from_wkt("LINESTRING (0 0, 10 0)")
    assert A(K.buffer(g, 2.0)) == pytest.approx(2 * 2 * 10 + _ngon_area(2.0))


def test_buffer_right_angle_polyline():
    # L-shape: 2dL + disk + quarter-wedge outside − d² double-count inside
    g = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    expect = 2 * 2 * 20 + _ngon_area(2.0) + _ngon_area(2.0) / 4 - 4.0
    assert A(K.buffer(g, 2.0)) == pytest.approx(expect)


def test_buffer_box_positive():
    g = from_wkt("POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))")
    assert A(K.buffer(g, 2.0)) == pytest.approx(60 + 2 * 2 * 16 + _ngon_area(2.0))


def test_buffer_box_negative():
    g = from_wkt("POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))")
    assert A(K.buffer(g, -2.0)) == pytest.approx(6 * 2)
    assert K.buffer(g, -4.0).is_empty()  # beyond the inradius


def test_buffer_hole_dilate_erode():
    g = from_wkt(
        "POLYGON ((0 0, 20 0, 20 20, 0 20, 0 0), (8 8, 12 8, 12 12, 8 12, 8 8))"
    )
    # dilation: outer grows (rounded corners), hole shrinks to a square 2×2
    dil = 400 + 80 * 1 + _ngon_area(1.0) - 4
    assert A(K.buffer(g, 1.0)) == pytest.approx(dil)
    # erosion: outer shrinks square, hole grows with ROUNDED corners
    ero = 18 * 18 - (16 + 16 + _ngon_area(1.0))
    assert A(K.buffer(g, -1.0)) == pytest.approx(ero)


def test_buffer_overlapping_point_union_dissolved():
    g = from_wkt("MULTIPOINT (0 0, 1 0)")
    a = A(K.buffer(g, 2.0))
    assert _ngon_area(2.0) < a < 2 * _ngon_area(2.0)


def test_buffer_negative_on_line_and_point_empty():
    assert K.buffer(from_wkt("LINESTRING (0 0, 5 0)"), -1.0).is_empty()
    assert K.buffer(from_wkt("POINT (1 1)"), -1.0).is_empty()


def test_buffer_dwithin_consistency():
    # every point within d of the line is inside the buffer, and vice versa
    line = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    buf = K.buffer(line, 1.5, 16)  # fine arcs → tight approximation
    for px, py in [(5, 1.0), (10.5, 10.5), (-1.2, 0), (5, -1.4), (11.4, 5)]:
        p = from_wkt(f"POINT ({px} {py})")
        d = K.distance(p, line)
        if d < 1.45:
            assert K.intersects(buf, p), (px, py)
        elif d > 1.55:
            assert not K.intersects(buf, p), (px, py)


def test_buffer_cap_styles():
    seg = from_wkt("LINESTRING (0 0, 10 0)")
    # flat: pure rectangle
    assert A(K.buffer(seg, 2.0, cap="flat")) == pytest.approx(40.0)
    # square: rectangle extended d at both ends
    assert A(K.buffer(seg, 2.0, cap="square")) == pytest.approx(2 * 2 * 14)
    # round == default capsule
    assert A(K.buffer(seg, 2.0, cap="round")) == pytest.approx(
        A(K.buffer(seg, 2.0)))
    # point: flat → empty, square → 2d×2d square
    pt = from_wkt("POINT (3 3)")
    assert K.buffer(pt, 2.0, cap="flat").is_empty()
    assert A(K.buffer(pt, 2.0, cap="square")) == pytest.approx(16.0)


def test_buffer_rect_matches_general_path():
    # the closed-form rectangle tier and the generic capsule engine agree
    box = from_wkt("POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))")
    rot = from_wkt(
        "POLYGON ((0 0, 7.0710678 7.0710678, 0 14.1421356, "
        "-7.0710678 7.0710678, 0 0))"
    )  # same 10×10 square rotated 45° — takes the general path
    a_rect = A(K.buffer(box, 1.5))
    assert a_rect == pytest.approx(60 + 1.5 * 32 + 0.5 * 32 * 1.5**2
                                   * math.sin(2 * math.pi / 32))
    a_rot = A(K.buffer(rot, 1.5))
    assert a_rot == pytest.approx(100 + 1.5 * 40 + 0.5 * 32 * 1.5**2
                                  * math.sin(2 * math.pi / 32), rel=1e-6)


def test_buffer_join_styles_rect():
    # mitre join on a rectangle = the rectangle expanded d on every side
    box = from_wkt("POLYGON ((0 0, 10 0, 10 6, 0 6, 0 0))")
    assert A(K.buffer(box, 2.0, join="mitre", mitre_limit=5.0)) == pytest.approx(
        14 * 10)
    # bevel join: expanded sides + 4 corner triangles of area d²/2
    assert A(K.buffer(box, 2.0, join="bevel")) == pytest.approx(
        60 + 2 * 2 * (10 + 6) + 4 * 0.5 * 4)
    # mitre_limit 1.0 (reference default) clips the right-angle miter at
    # distance d from the corner — chops the spike beyond the bevel line
    a_lim = A(K.buffer(box, 2.0, join="mitre", mitre_limit=1.0))
    assert 60 + 64 + 8 < a_lim < 140
    # erosion is join-independent for a rectangle
    assert A(K.buffer(box, -1.0, join="mitre", mitre_limit=5.0)) == pytest.approx(32)


def test_buffer_join_styles_line():
    # right-angle polyline, flat caps: the two segment rects (2d wide)
    # overlap in a d×d square; mitre fills the d×d outer corner square
    ln = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    d = 2.0
    assert A(K.buffer(ln, d, cap="flat", join="mitre", mitre_limit=5.0)) == \
        pytest.approx(2 * d * 10 + 2 * d * 10 - d * d + d * d)
    # bevel: only half the outer corner square (triangle to the bevel edge)
    assert A(K.buffer(ln, d, cap="flat", join="bevel")) == pytest.approx(
        2 * d * 10 + 2 * d * 10 - d * d + d * d / 2)


def test_buffer_join_general_path_rotated():
    # rotated square (general path): mitre join = exact offset square
    rot = from_wkt(
        "POLYGON ((0 0, 7.0710678 7.0710678, 0 14.1421356, "
        "-7.0710678 7.0710678, 0 0))"
    )  # 10×10 square rotated 45°
    a = A(K.buffer(rot, 1.5, join="mitre", mitre_limit=5.0))
    assert a == pytest.approx(13 * 13, rel=1e-6)
    # bevel corner triangle at a right angle: d^2*sin(90)/2 = d^2/2 each
    a_b = A(K.buffer(rot, 1.5, join="bevel"))
    assert a_b == pytest.approx(100 + 1.5 * 40 + 4 * 0.5 * 1.5 ** 2,
                                rel=1e-6)


class TestMixedDimensionOverlay:
    """GEOS-parity union/difference across dimension pairs
    (st_union.cpp:65, st_difference.cpp:59 delegate to OverlayNG)."""

    def test_union_line_polygon(self):
        box = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        line = from_wkt("LINESTRING (-5 5, 15 5)")
        u = K.union(line, box)
        assert abs(K.area(u) - 100.0) < 1e-9
        assert abs(K.length(u) - 10.0) < 1e-9  # 5 outside each side

    def test_difference_line_minus_polygon(self):
        box = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        line = from_wkt("LINESTRING (-5 5, 15 5)")
        d = K.difference(line, box)
        assert abs(K.length(d) - 10.0) < 1e-9
        # fully inside → empty
        inner = from_wkt("LINESTRING (1 1, 9 9)")
        assert K.difference(inner, box).is_empty()

    def test_difference_polygon_minus_lowdim(self):
        box = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        line = from_wkt("LINESTRING (-5 5, 15 5)")
        pt = from_wkt("POINT (5 5)")
        assert abs(K.area(K.difference(box, line)) - 100.0) < 1e-12
        assert abs(K.area(K.difference(box, pt)) - 100.0) < 1e-12

    def test_line_line_union_crossing_nodes(self):
        l1 = from_wkt("LINESTRING (0 0, 10 10)")
        l2 = from_wkt("LINESTRING (0 10, 10 0)")
        u = K.union(l1, l2)
        assert abs(K.length(u) - K.length(l1) - K.length(l2)) < 1e-9
        assert len(list(u.flatten())) == 4  # noded at the crossing

    def test_line_line_union_collinear_overlap_counts_once(self):
        l1 = from_wkt("LINESTRING (0 0, 10 10)")
        l2 = from_wkt("LINESTRING (5 5, 20 20)")
        import math
        assert abs(K.length(K.union(l1, l2)) - 20 * math.sqrt(2)) < 1e-9
        d = K.difference(l1, l2)
        assert abs(K.length(d) - 5 * math.sqrt(2)) < 1e-9

    def test_union_points_melt_into_polygon(self):
        box = from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        inside = from_wkt("POINT (5 5)")
        outside = from_wkt("POINT (20 20)")
        assert K.union(box, inside).type_id == 3
        u = K.union(box, outside)
        kinds = sorted(p.type_id for p in u.flatten())
        assert kinds == [1, 3]

    def test_touches_overlaps_collinear_1d(self):
        l1 = from_wkt("LINESTRING (0 0, 10 10)")
        l2 = from_wkt("LINESTRING (5 5, 20 20)")
        assert not K.touches(l1, l2)
        assert K.overlaps(l1, l2)
        t = from_wkt("LINESTRING (5 5, 5 20)")
        assert K.touches(l1, t) and not K.overlaps(l1, t)
