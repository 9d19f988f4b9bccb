"""Pure-NumPy geometry kernels.

These reproduce the semantics of the reference's native + GEOS-backed scalar
functions (SURVEY §2.E-§2.G) without a GEOS binding (shapely is unavailable
in this environment). Kernels operate on one parsed ``Geometry`` at a time;
the Spark layer batches rows through them inside Arrow-paged pandas UDFs,
keeping the per-batch cost model of the reference's per-thread arena
(``docs/internals.md:12-13``).

Semantics notes (matched to the reference's golden tests):
  * area: planar shoelace, polygons only; collections sum polygon parts
    (test/sql/geometry/st_area.test:55-66); points/lines → 0.
  * length: linestrings only; polygons → 0 (st_length.cpp).
  * perimeter: polygon ring lengths; lines → 0 (st_perimeter.cpp).
  * ST_Contains(point on boundary) → false; ST_Covers → true (GEOS).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    collect,
)

EARTH_RADIUS_M = 6371000.0  # mean radius used by the reference's haversine
# (st_distance_sphere.cpp:18-38 uses 6371000m)


# ============================================================ measures

def ring_area_signed(ring: np.ndarray) -> float:
    """Shoelace; positive = CCW."""
    if len(ring) < 3:
        return 0.0
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def area(g: Geometry) -> float:
    if g.type_id == POLYGON:
        if not g.rings:
            return 0.0
        total = abs(ring_area_signed(g.rings[0]))
        for hole in g.rings[1:]:
            total -= abs(ring_area_signed(hole))
        return total
    if g.parts is not None:
        return sum(area(p) for p in g.parts)
    return 0.0


def _path_length(arr: np.ndarray) -> float:
    if len(arr) < 2:
        return 0.0
    d = np.diff(arr[:, :2], axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def length(g: Geometry) -> float:
    if g.type_id == LINESTRING:
        return _path_length(g.coords)
    if g.type_id in (MULTILINESTRING, GEOMETRYCOLLECTION):
        return sum(length(p) for p in g.parts or [])
    return 0.0


def perimeter(g: Geometry) -> float:
    if g.type_id == POLYGON:
        return sum(_path_length(r) for r in g.rings)
    if g.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        return sum(perimeter(p) for p in g.parts or [])
    return 0.0


def centroid(g: Geometry) -> Geometry:
    """Dimension-weighted centroid (GEOS semantics: highest topological
    dimension present wins)."""
    dim = g.topo_dimension() if not g.is_empty() else -1
    if dim < 0:
        return Geometry.empty(POINT)
    if dim == 2:
        sx = sy = sa = 0.0
        for poly in g.flatten():
            if poly.type_id != POLYGON or not poly.rings:
                continue
            for i, ring in enumerate(poly.rings):
                if len(ring) < 3:
                    continue
                x, y = ring[:, 0], ring[:, 1]
                x1, y1 = np.roll(x, -1), np.roll(y, -1)
                cross = x * y1 - x1 * y
                a = 0.5 * float(cross.sum())
                if a == 0.0:
                    continue
                cx = float(((x + x1) * cross).sum()) / (6.0 * a)
                cy = float(((y + y1) * cross).sum()) / (6.0 * a)
                sign = 1.0 if i == 0 else -1.0
                w = sign * abs(a) * (1.0 if a != 0 else 0.0)
                # orient-independent: weight by |a| with hole sign
                sx += w * cx
                sy += w * cy
                sa += w
        if sa != 0.0:
            return Geometry.point(sx / sa, sy / sa)
        dim = 1  # degenerate polygons fall through to length weighting
    if dim == 1:
        sx = sy = sl = 0.0
        for part in g.flatten():
            arrs = list(part.vertex_arrays()) if part.type_id == LINESTRING else []
            if part.type_id == POLYGON:
                arrs = part.rings
            for arr in arrs:
                if len(arr) < 2:
                    continue
                p0 = arr[:-1, :2]
                p1 = arr[1:, :2]
                seg = p1 - p0
                ln = np.sqrt((seg * seg).sum(axis=1))
                mid = (p0 + p1) / 2.0
                sx += float((mid[:, 0] * ln).sum())
                sy += float((mid[:, 1] * ln).sum())
                sl += float(ln.sum())
        if sl > 0:
            return Geometry.point(sx / sl, sy / sl)
        dim = 0
    # points: arithmetic mean of vertices
    tot = np.zeros(2)
    n = 0
    for arr in g.vertex_arrays():
        tot += arr[:, :2].sum(axis=0)
        n += len(arr)
    if n == 0:
        return Geometry.empty(POINT)
    return Geometry.point(tot[0] / n, tot[1] / n)


# ============================================================ low-level predicates

def _orient(ax, ay, bx, by, cx, cy) -> float:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_segment(px, py, ax, ay, bx, by) -> bool:
    if _orient(ax, ay, bx, by, px, py) != 0.0:
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _segments_intersect(a0, a1, b0, b1) -> int:
    """0 = disjoint, 1 = touch at endpoint/collinear-overlap, 2 = proper cross."""
    o1 = _orient(a0[0], a0[1], a1[0], a1[1], b0[0], b0[1])
    o2 = _orient(a0[0], a0[1], a1[0], a1[1], b1[0], b1[1])
    o3 = _orient(b0[0], b0[1], b1[0], b1[1], a0[0], a0[1])
    o4 = _orient(b0[0], b0[1], b1[0], b1[1], a1[0], a1[1])
    if o1 * o2 < 0 and o3 * o4 < 0:
        return 2
    if o1 == 0 and _on_segment(b0[0], b0[1], a0[0], a0[1], a1[0], a1[1]):
        return 1
    if o2 == 0 and _on_segment(b1[0], b1[1], a0[0], a0[1], a1[0], a1[1]):
        return 1
    if o3 == 0 and _on_segment(a0[0], a0[1], b0[0], b0[1], b1[0], b1[1]):
        return 1
    if o4 == 0 and _on_segment(a1[0], a1[1], b0[0], b0[1], b1[0], b1[1]):
        return 1
    return 0


def point_in_ring(px: float, py: float, ring: np.ndarray) -> int:
    """0 = outside, 1 = on boundary, 2 = inside. Vectorized crossing test."""
    n = len(ring)
    if n < 3:
        return 0
    x = ring[:, 0]
    y = ring[:, 1]
    x1 = np.roll(x, -1)
    y1 = np.roll(y, -1)
    # boundary check (vectorized collinear + bbox)
    cross = (x1 - x) * (py - y) - (y1 - y) * (px - x)
    on = (
        (cross == 0.0)
        & (px >= np.minimum(x, x1))
        & (px <= np.maximum(x, x1))
        & (py >= np.minimum(y, y1))
        & (py <= np.maximum(y, y1))
    )
    if bool(on.any()):
        return 1
    # ray casting
    cond = (y > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x + (py - y) * (x1 - x) / (y1 - y)
    hits = cond & (px < xint)
    return 2 if (int(hits.sum()) % 2 == 1) else 0


def point_in_polygon(px: float, py: float, poly: Geometry) -> int:
    """0 outside / 1 boundary / 2 interior, holes honored."""
    if not poly.rings:
        return 0
    r = point_in_ring(px, py, poly.rings[0])
    if r != 2:
        return r
    for hole in poly.rings[1:]:
        h = point_in_ring(px, py, hole)
        if h == 2:
            return 0
        if h == 1:
            return 1
    return 2


def _point_loc(px: float, py: float, g: Geometry) -> int:
    """Location of a point in any geometry: 0 ext / 1 boundary / 2 interior."""
    best = 0
    for part in g.flatten():
        if part.is_empty():
            continue
        if part.type_id == POINT:
            if px == part.coords[0] and py == part.coords[1]:
                return 2
        elif part.type_id == LINESTRING:
            arr = part.coords
            for i in range(len(arr) - 1):
                if _on_segment(px, py, arr[i, 0], arr[i, 1], arr[i + 1, 0], arr[i + 1, 1]):
                    closed = bool(np.array_equal(arr[0, :2], arr[-1, :2]))
                    is_endpoint = (
                        (px == arr[0, 0] and py == arr[0, 1])
                        or (px == arr[-1, 0] and py == arr[-1, 1])
                    )
                    loc = 2 if (closed or not is_endpoint) else 1
                    best = max(best, loc)
                    break
        elif part.type_id == POLYGON:
            best = max(best, point_in_polygon(px, py, part))
        if best == 2:
            return 2
    return best


def _segs(arr: np.ndarray):
    for i in range(len(arr) - 1):
        yield arr[i, :2], arr[i + 1, :2]


def _boundaries_cross(a: Geometry, b: Geometry) -> Tuple[bool, bool]:
    """(any_intersection, any_proper_cross) between 1D boundaries/paths."""
    touch = False
    a_arrays = list(a.vertex_arrays())
    b_arrays = list(b.vertex_arrays())
    for aa in a_arrays:
        if len(aa) == 1:
            continue
        for bb in b_arrays:
            if len(bb) == 1:
                continue
            for s0, s1 in _segs(aa):
                for t0, t1 in _segs(bb):
                    r = _segments_intersect(s0, s1, t0, t1)
                    if r == 2:
                        return True, True
                    if r == 1:
                        touch = True
    return touch, False


def _rep_point(g: Geometry) -> Optional[Tuple[float, float]]:
    """A point guaranteed on g (vertex, or interior-ish for polygons)."""
    if g.is_empty():
        return None
    for part in g.flatten():
        if part.is_empty():
            continue
        if part.type_id == POINT:
            return float(part.coords[0]), float(part.coords[1])
        if part.type_id == LINESTRING:
            a = part.coords
            return float((a[0, 0] + a[1, 0]) / 2), float((a[0, 1] + a[1, 1]) / 2)
        if part.type_id == POLYGON:
            p = point_on_surface(part)
            if not p.is_empty():
                return float(p.coords[0]), float(p.coords[1])
    return None


def bbox_intersects(a: Geometry, b: Geometry) -> bool:
    ba, bb = a.bounds(), b.bounds()
    if ba is None or bb is None:
        return False
    return ba[0] <= bb[2] and ba[2] >= bb[0] and ba[1] <= bb[3] and ba[3] >= bb[1]


def intersects(a: Geometry, b: Geometry) -> bool:
    if a is None or b is None or a.is_empty() or b.is_empty():
        return False
    if not bbox_intersects(a, b):
        return False
    # any point of a in b / of b in a
    for part in a.flatten():
        if part.type_id == POINT and not part.is_empty():
            if _point_loc(part.coords[0], part.coords[1], b) > 0:
                return True
    for part in b.flatten():
        if part.type_id == POINT and not part.is_empty():
            if _point_loc(part.coords[0], part.coords[1], a) > 0:
                return True
    touch, _cross = _boundaries_cross(a, b)
    if touch:
        return True
    # containment without boundary contact
    ra = _rep_point(a)
    if ra is not None and _point_loc(ra[0], ra[1], b) > 0:
        return True
    rb = _rep_point(b)
    if rb is not None and _point_loc(rb[0], rb[1], a) > 0:
        return True
    return False


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not intersects(a, b)


def _all_vertices_loc_at_least(g: Geometry, container: Geometry, min_loc: int) -> bool:
    for arr in g.vertex_arrays():
        for row in arr:
            if _point_loc(float(row[0]), float(row[1]), container) < min_loc:
                return False
    return True


def _midpoints_loc_at_least(g: Geometry, container: Geometry, min_loc: int) -> bool:
    """Check segment midpoints too — catches edges that dip outside between
    two inside vertices (sufficient for convex dips; heuristic otherwise)."""
    for arr in g.vertex_arrays():
        if len(arr) < 2:
            continue
        mids = (arr[:-1, :2] + arr[1:, :2]) / 2.0
        for row in mids:
            if _point_loc(float(row[0]), float(row[1]), container) < min_loc:
                return False
    return True


def covers(a: Geometry, b: Geometry) -> bool:
    """Every point of b is on a (boundary allowed)."""
    if a is None or b is None or a.is_empty() or b.is_empty():
        return False
    ba, bb = a.bounds(), b.bounds()
    if not (ba[0] <= bb[0] and ba[1] <= bb[1] and ba[2] >= bb[2] and ba[3] >= bb[3]):
        return False
    _touch, cross = _boundaries_cross(a, b)
    if cross:
        return False
    if not (_all_vertices_loc_at_least(b, a, 1) and _midpoints_loc_at_least(b, a, 1)):
        return False
    return not _hole_swallowed(a, b)


def _hole_swallowed(a: Geometry, b: Geometry) -> bool:
    """True when a hole of `a` lies strictly inside `b` — then part of b sits
    in the hole (outside a), defeating covers/contains. The hole ring cannot
    cross b's boundary here (callers reject boundary crossings first), so a
    single interior-point probe per hole decides it."""
    if b.topo_dimension() != 2:
        return False
    for part in a.flatten():
        if part.type_id == POLYGON and len(part.rings) > 1:
            for hole in part.rings[1:]:
                hp = _rep_point(Geometry(POLYGON, rings=[hole]))
                if hp is not None and _point_loc(hp[0], hp[1], b) == 2:
                    return True
    return False


def contains(a: Geometry, b: Geometry) -> bool:
    """covers + at least one interior-interior point (GEOS: boundary-only → false)."""
    if not covers(a, b):
        return False
    rp = _rep_point(b)
    if rp is None:
        return False
    if _point_loc(rp[0], rp[1], a) == 2:
        return True
    # probe all vertices for an interior hit
    for arr in b.vertex_arrays():
        for row in arr:
            if _point_loc(float(row[0]), float(row[1]), a) == 2:
                return True
    return False


def contains_properly(a: Geometry, b: Geometry) -> bool:
    """b entirely in a's interior (no boundary contact)."""
    if a is None or b is None or a.is_empty() or b.is_empty():
        return False
    _touch, cross = _boundaries_cross(a, b)
    if cross:
        return False
    if not (_all_vertices_loc_at_least(b, a, 2) and _midpoints_loc_at_least(b, a, 2)):
        return False
    return not _hole_swallowed(a, b)


def within(a: Geometry, b: Geometry) -> bool:
    return contains(b, a)


def covered_by(a: Geometry, b: Geometry) -> bool:
    return covers(b, a)


def touches(a: Geometry, b: Geometry) -> bool:
    """Boundaries meet, interiors don't."""
    if a is None or b is None or a.is_empty() or b.is_empty():
        return False
    if not intersects(a, b):
        return False
    # interior-interior test by probes
    for part in a.flatten():
        if part.type_id == POINT and not part.is_empty():
            if _point_loc(part.coords[0], part.coords[1], b) == 2:
                return False
    for part in b.flatten():
        if part.type_id == POINT and not part.is_empty():
            if _point_loc(part.coords[0], part.coords[1], a) == 2:
                return False
    _touch, cross = _boundaries_cross(a, b)
    if cross:
        return False
    da, db = a.topo_dimension(), b.topo_dimension()
    if da == 1 and db == 1 and _share_1d(a, b):
        # collinear shared length ⇒ the 1D interiors intersect — that is
        # overlaps (or containment), never touches (DE-9IM)
        return False
    if da == 2 and db >= 1:
        # any midpoint/vertex of b interior to a → not touches
        for arr in b.vertex_arrays():
            pts = arr[:, :2]
            if len(arr) >= 2:
                pts = np.vstack([pts, (arr[:-1, :2] + arr[1:, :2]) / 2.0])
            for row in pts:
                if _point_loc(float(row[0]), float(row[1]), a) == 2:
                    return False
    if db == 2 and da >= 1:
        for arr in a.vertex_arrays():
            pts = arr[:, :2]
            if len(arr) >= 2:
                pts = np.vstack([pts, (arr[:-1, :2] + arr[1:, :2]) / 2.0])
            for row in pts:
                if _point_loc(float(row[0]), float(row[1]), b) == 2:
                    return False
    if da == 2 and db == 2:
        rb = _rep_point(b)
        if rb and _point_loc(rb[0], rb[1], a) == 2:
            return False
        ra = _rep_point(a)
        if ra and _point_loc(ra[0], ra[1], b) == 2:
            return False
    return True


def crosses(a: Geometry, b: Geometry) -> bool:
    """Interiors intersect, intersection dim < max dim, neither contains other."""
    if a is None or b is None or a.is_empty() or b.is_empty():
        return False
    da, db = a.topo_dimension(), b.topo_dimension()
    if da == db == 2 or da == db == 0:
        return False
    if not intersects(a, b):
        return False
    if touches(a, b):
        return False
    if da == db == 1:
        _touch, cross = _boundaries_cross(a, b)
        return cross
    lo, hi = (a, b) if da < db else (b, a)
    if lo.topo_dimension() == 0:
        inside = outside = False
        for part in lo.flatten():
            if part.is_empty():
                continue
            loc = _point_loc(part.coords[0], part.coords[1], hi)
            if loc == 2:
                inside = True
            elif loc == 0:
                outside = True
        return inside and outside
    # line vs polygon: part in, part out
    if contains(hi, lo):
        return False
    # has interior presence and exterior presence
    has_in = False
    has_out = False
    for arr in lo.vertex_arrays():
        pts = arr[:, :2]
        if len(arr) >= 2:
            pts = np.vstack([pts, (arr[:-1, :2] + arr[1:, :2]) / 2.0])
        for row in pts:
            loc = _point_loc(float(row[0]), float(row[1]), hi)
            if loc == 2:
                has_in = True
            elif loc == 0:
                has_out = True
    if has_in and has_out:
        return True
    _touch, cross = _boundaries_cross(lo, hi)
    return cross


def _seg_collinear_overlap(p0, p1, q0, q1) -> bool:
    """Segments lie on one line and share a positive-length interval."""
    if _orient(p0[0], p0[1], p1[0], p1[1], q0[0], q0[1]) != 0:
        return False
    if _orient(p0[0], p0[1], p1[0], p1[1], q1[0], q1[1]) != 0:
        return False
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    ll = dx * dx + dy * dy
    if ll == 0.0:
        return False
    t0 = ((q0[0] - p0[0]) * dx + (q0[1] - p0[1]) * dy) / ll
    t1 = ((q1[0] - p0[0]) * dx + (q1[1] - p0[1]) * dy) / ll
    lo, hi = (t0, t1) if t0 <= t1 else (t1, t0)
    return min(1.0, hi) - max(0.0, lo) > 0.0


def _share_1d(a: Geometry, b: Geometry) -> bool:
    """Any collinear positive-length shared portion between paths of a, b."""
    for arr_a in a.vertex_arrays():
        if len(arr_a) < 2:
            continue
        for arr_b in b.vertex_arrays():
            if len(arr_b) < 2:
                continue
            for p0, p1 in _segs(arr_a):
                for q0, q1 in _segs(arr_b):
                    if _seg_collinear_overlap(p0, p1, q0, q1):
                        return True
    return False


def overlaps(a: Geometry, b: Geometry) -> bool:
    """Same dimension, interiors intersect in that same dimension, neither
    contains the other (DE-9IM: lines crossing at a point are `crosses`,
    not overlaps — dim(int∩int) must be 1 for 1D inputs)."""
    if a is None or b is None or a.is_empty() or b.is_empty():
        return False
    if a.topo_dimension() != b.topo_dimension():
        return False
    if not intersects(a, b):
        return False
    if contains(a, b) or contains(b, a) or touches(a, b):
        return False
    if a.topo_dimension() == 1:
        return _share_1d(a, b)
    return True


def equals(a: Geometry, b: Geometry) -> bool:
    """Topological equality approximated as mutual coverage."""
    if a is None or b is None:
        return False
    if a.is_empty() and b.is_empty():
        return True
    if a.is_empty() != b.is_empty():
        return False
    if a.type_id == POINT and b.type_id == POINT:
        return bool(np.array_equal(a.coords[:2], b.coords[:2]))
    return covers(a, b) and covers(b, a)


# ============================================================ distance

def _pt_seg_dist(px, py, ax, ay, bx, by) -> float:
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    if ll == 0.0:
        return math.hypot(px - ax, py - ay)
    t = max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / ll))
    return math.hypot(px - (ax + t * dx), py - (ay + t * dy))


def _pt_geom_dist(px, py, g: Geometry) -> float:
    loc = _point_loc(px, py, g)
    if loc > 0:
        return 0.0
    best = math.inf
    for part in g.flatten():
        if part.is_empty():
            continue
        if part.type_id == POINT:
            best = min(best, math.hypot(px - part.coords[0], py - part.coords[1]))
        elif part.type_id == LINESTRING:
            arr = part.coords
            x, y = arr[:, 0], arr[:, 1]
            best = min(best, _pts_seg_min(px, py, x, y))
        elif part.type_id == POLYGON:
            for ring in part.rings:
                best = min(best, _pts_seg_min(px, py, ring[:, 0], ring[:, 1]))
    return best


def _pts_seg_min(px, py, x, y) -> float:
    """Vectorized min distance from point to polyline (x,y arrays)."""
    if len(x) == 1:
        return math.hypot(px - x[0], py - y[0])
    ax, ay = x[:-1], y[:-1]
    bx, by = x[1:], y[1:]
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / ll
    t = np.where(ll == 0, 0.0, np.clip(t, 0.0, 1.0))
    cx = ax + t * dx
    cy = ay + t * dy
    return float(np.sqrt((px - cx) ** 2 + (py - cy) ** 2).min())


def distance(a: Geometry, b: Geometry) -> Optional[float]:
    if a is None or b is None or a.is_empty() or b.is_empty():
        return None
    if intersects(a, b):
        return 0.0
    best = math.inf
    for arr in a.vertex_arrays():
        for row in arr:
            best = min(best, _pt_geom_dist(float(row[0]), float(row[1]), b))
    for arr in b.vertex_arrays():
        for row in arr:
            best = min(best, _pt_geom_dist(float(row[0]), float(row[1]), a))
    return best


def dwithin(a: Geometry, b: Geometry, dist: float) -> bool:
    d = distance(a, b)
    return d is not None and d <= dist


def haversine(x1, y1, x2, y2, radius=EARTH_RADIUS_M) -> float:
    """Great-circle distance in degrees. Argument order matches the
    reference exactly: the point's X ordinate is the LATITUDE
    (st_distance_sphere.cpp:50-51 passes a_val as lat1)."""
    lat1, lat2 = math.radians(x1), math.radians(x2)
    dlat = lat2 - lat1
    dlon = math.radians(y2 - y1)
    h = math.sin(dlat / 2) ** 2 + math.cos(lat1) * math.cos(lat2) * math.sin(dlon / 2) ** 2
    return 2 * radius * math.asin(min(1.0, math.sqrt(h)))


# ============================================================ processing

def envelope(g: Geometry) -> Geometry:
    b = g.bounds()
    if b is None:
        return Geometry.empty(POLYGON)
    xmin, ymin, xmax, ymax = b
    if xmin == xmax and ymin == ymax:
        return Geometry.point(xmin, ymin)
    return Geometry.box_polygon(xmin, ymin, xmax, ymax)


def boundary(g: Geometry) -> Geometry:
    if g.type_id in (POINT, MULTIPOINT):
        return Geometry.empty(GEOMETRYCOLLECTION)
    if g.type_id == LINESTRING:
        if g.is_empty() or np.array_equal(g.coords[0, :2], g.coords[-1, :2]):
            return Geometry.empty(MULTIPOINT)
        return Geometry.collection(
            MULTIPOINT,
            [
                Geometry(POINT, coords=g.coords[0].copy(), has_z=g.has_z, has_m=g.has_m),
                Geometry(POINT, coords=g.coords[-1].copy(), has_z=g.has_z, has_m=g.has_m),
            ],
        )
    if g.type_id == POLYGON:
        lines = [
            Geometry(LINESTRING, coords=r.copy(), has_z=g.has_z, has_m=g.has_m)
            for r in g.rings
        ]
        if len(lines) == 1:
            return lines[0]
        return Geometry.collection(MULTILINESTRING, lines)
    if g.parts is not None:
        parts = [boundary(p) for p in g.parts]
        out = []
        for p in parts:
            if p.parts is not None:
                out.extend(p.parts)
            elif not p.is_empty():
                out.append(p)
        return collect(out)
    return Geometry.empty(GEOMETRYCOLLECTION)


def convex_hull(g: Geometry) -> Geometry:
    pts = [arr[:, :2] for arr in g.vertex_arrays() if len(arr)]
    if not pts:
        return Geometry.empty(GEOMETRYCOLLECTION)
    return convex_hull_xy(np.vstack(pts))


def convex_hull_xy(P: np.ndarray) -> Geometry:
    """Convex hull of an (n,2) point array. Large inputs get the
    Akl–Toussaint filter (vectorized reject of points inside the extreme-
    point quadrilateral) before the O(h·n') monotone chain."""
    P = np.unique(np.asarray(P, dtype=np.float64), axis=0)
    if len(P) > 64:
        quad = P[[P[:, 0].argmin(), P[:, 1].argmin(), P[:, 0].argmax(), P[:, 1].argmax()]]
        keep = np.zeros(len(P), dtype=bool)
        for i in range(4):
            a, b = quad[i], quad[(i + 1) % 4]
            cr = (b[0] - a[0]) * (P[:, 1] - a[1]) - (b[1] - a[1]) * (P[:, 0] - a[0])
            keep |= cr <= 0  # on/outside an edge of the CCW quad
        P = P[keep]
        P = P[np.lexsort((P[:, 1], P[:, 0]))]
    if len(P) == 1:
        return Geometry.point(P[0, 0], P[0, 1])
    if len(P) == 2:
        return Geometry(LINESTRING, coords=P.astype(np.float64))
    # Andrew monotone chain (P already lexicographically sorted by unique)
    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and _orient(
                out[-2][0], out[-2][1], out[-1][0], out[-1][1], p[0], p[1]
            ) <= 0:
                out.pop()
            out.append((float(p[0]), float(p[1])))
        return out

    lower = half(P)
    upper = half(P[::-1])
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return Geometry(LINESTRING, coords=np.asarray(hull + [hull[0]]))
    ring = np.asarray(hull + [hull[0]], dtype=np.float64)
    # CCW from monotone chain; reference/GEOS emits CCW shell too
    return Geometry(POLYGON, rings=[ring])


def point_on_surface(g: Geometry) -> Geometry:
    """A point guaranteed on the geometry (interior for polygons)."""
    if g.is_empty():
        return Geometry.empty(POINT)
    if g.topo_dimension() == 0:
        for p in g.flatten():
            if not p.is_empty():
                return Geometry.point(float(p.coords[0]), float(p.coords[1]))
    if g.topo_dimension() == 1:
        # GEOS InteriorPointLine: prefer interior VERTICES, fall back to
        # endpoints; pick the candidate closest to the centroid (first wins
        # ties) — postgis/st_pointonsurface.test
        cen = centroid(g)
        cx, cy = float(cen.coords[0]), float(cen.coords[1])
        interior: List = []
        ends: List = []
        for p in g.flatten():
            if p.type_id == LINESTRING and len(p.coords) >= 2:
                interior.extend(tuple(v[:2]) for v in p.coords[1:-1])
                ends.append(tuple(p.coords[0][:2]))
                ends.append(tuple(p.coords[-1][:2]))
        cands = interior or ends
        if cands:
            best = min(cands, key=lambda v: (v[0] - cx) ** 2 + (v[1] - cy) ** 2)
            return Geometry.point(float(best[0]), float(best[1]))
    # polygon: scanline at mid-y of the largest part, take midpoint of widest
    # interior span
    best_poly = None
    best_area = -1.0
    for p in g.flatten():
        if p.type_id == POLYGON and p.rings:
            a = area(p)
            if a > best_area:
                best_area = a
                best_poly = p
    if best_poly is None:
        return Geometry.empty(POINT)
    b = best_poly.bounds()
    centre_y = (b[1] + b[3]) / 2.0
    # GEOS InteriorPointArea "safe bisector": the scanline is the midpoint
    # of the vertex-ordinate gap containing the envelope centre, so it
    # never passes through (or near) a vertex — and it is what the
    # reference's expected points encode (postgis/st_pointonsurface.test)
    ys = np.concatenate([r[:, 1] for r in best_poly.rings])
    lo = ys[ys < centre_y]
    hi = ys[ys > centre_y]
    y_lo = float(lo.max()) if len(lo) else b[1]
    y_hi = float(hi.min()) if len(hi) else b[3]
    py = (y_lo + y_hi) / 2.0 if y_hi > y_lo else centre_y
    xs: List[float] = []
    for ring in best_poly.rings:
        x, y = ring[:, 0], ring[:, 1]
        x1, y1 = np.roll(x, -1), np.roll(y, -1)
        mask = (y > py) != (y1 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x + (py - y) * (x1 - x) / (y1 - y)
        xs.extend(float(v) for v in xi[mask])
    xs.sort()
    if len(xs) < 2:
        cx = (b[0] + b[2]) / 2.0
        return Geometry.point(cx, py)
    # widest span between alternating crossings
    best_w = -1.0
    best_x = (xs[0] + xs[1]) / 2.0
    for i in range(0, len(xs) - 1, 2):
        w = xs[i + 1] - xs[i]
        if w > best_w:
            best_w = w
            best_x = (xs[i] + xs[i + 1]) / 2.0
    return Geometry.point(best_x, py)


def reverse(g: Geometry) -> Geometry:
    if g.type_id == POINT:
        return g
    if g.type_id == LINESTRING:
        out = Geometry(LINESTRING, coords=g.coords[::-1].copy())
        out.has_z, out.has_m = g.has_z, g.has_m
        return out
    if g.type_id == POLYGON:
        out = Geometry(POLYGON, rings=[r[::-1].copy() for r in g.rings])
        out.has_z, out.has_m = g.has_z, g.has_m
        return out
    out = Geometry(g.type_id, parts=[reverse(p) for p in g.parts or []])
    out.has_z, out.has_m = g.has_z, g.has_m
    return out


def flip_coordinates(g: Geometry) -> Geometry:
    def f(arr):
        out = arr.copy()
        out[:, 0], out[:, 1] = arr[:, 1].copy(), arr[:, 0].copy()
        return out

    return g.map_coords(f)


def _dp(arr: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker vertex selection on an (n, k) coordinate array."""
    if len(arr) < 3:
        return arr
    keep = np.zeros(len(arr), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(arr) - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = arr[i, 0], arr[i, 1]
        bx, by = arr[j, 0], arr[j, 1]
        seg = arr[i + 1 : j, :2]
        dx, dy = bx - ax, by - ay
        ll = math.hypot(dx, dy)
        if ll == 0:
            d = np.sqrt(((seg - arr[i, :2]) ** 2).sum(axis=1))
        else:
            d = np.abs(dy * (seg[:, 0] - ax) - dx * (seg[:, 1] - ay)) / ll
        k = int(np.argmax(d))
        if d[k] > tol:
            idx = i + 1 + k
            keep[idx] = True
            stack.append((i, idx))
            stack.append((idx, j))
    return arr[keep]


def simplify(g: Geometry, tol: float) -> Geometry:
    """Douglas-Peucker (non-topology-preserving, like GEOS simplify)."""

    def dp(arr: np.ndarray) -> np.ndarray:
        return _dp(arr, tol)

    if g.type_id == POLYGON:
        rings = []
        for r in g.rings:
            s = dp(r)
            if len(s) >= 4:
                rings.append(s)
        out = Geometry(POLYGON, rings=rings, has_z=g.has_z, has_m=g.has_m)
        return out
    if g.type_id in (MULTIPOLYGON, MULTILINESTRING, GEOMETRYCOLLECTION):
        out = Geometry(g.type_id, parts=[simplify(p, tol) for p in g.parts or []])
        out.has_z, out.has_m = g.has_z, g.has_m
        return out
    if g.type_id == LINESTRING:
        return Geometry(LINESTRING, coords=dp(g.coords), has_z=g.has_z, has_m=g.has_m)
    return g


def simplify_preserve_topology(g: Geometry, tol: float) -> Geometry:
    """Topology-preserving variant (GEOS TopologyPreservingSimplifier /
    ST_SimplifyPreserveTopology): same Douglas-Peucker selection, but a
    component is restored to its original vertices when simplification
    would collapse it (ring <4 points / zero area) or introduce a
    self-intersection — no shell or hole is ever dropped and validity is
    kept."""

    def ring_ok(r: np.ndarray) -> bool:
        if len(r) < 4:
            return False
        x, y = r[:, 0], r[:, 1]
        if abs(float((x[:-1] * y[1:] - x[1:] * y[:-1]).sum())) == 0.0:
            return False
        return is_ring(Geometry(LINESTRING, coords=r))

    if g.type_id == POLYGON:
        rings = []
        for r in g.rings:
            s = _dp(np.asarray(r, dtype=np.float64), tol)
            rings.append(s if ring_ok(s) else r)
        return Geometry(POLYGON, rings=rings, has_z=g.has_z, has_m=g.has_m)
    if g.type_id in (MULTIPOLYGON, MULTILINESTRING, GEOMETRYCOLLECTION):
        out = Geometry(g.type_id, parts=[
            simplify_preserve_topology(p, tol) for p in g.parts or []
        ])
        out.has_z, out.has_m = g.has_z, g.has_m
        return out
    if g.type_id == LINESTRING:
        s = Geometry(LINESTRING, coords=_dp(g.coords, tol),
                     has_z=g.has_z, has_m=g.has_m)
        return s if len(s.coords) >= 2 and is_simple(s) else g
    return g


def remove_repeated_points(g: Geometry, tol: float = 0.0) -> Geometry:
    def dedup(arr: np.ndarray) -> np.ndarray:
        if len(arr) < 2:
            return arr
        d = np.sqrt(((np.diff(arr[:, :2], axis=0)) ** 2).sum(axis=1))
        keep = np.ones(len(arr), dtype=bool)
        keep[1:] = d > tol
        keep[-1] = True  # always keep the closing/last vertex
        return arr[keep]

    return g.map_coords(dedup)


def reduce_precision(g: Geometry, grid: float) -> Geometry:
    def f(arr):
        return np.round(arr / grid) * grid

    return g.map_coords(f)


def force_dims(g: Geometry, want_z: bool, want_m: bool, z: float = 0.0, m: float = 0.0) -> Geometry:
    """ST_Force2D/3DZ/3DM/4D (core/.../st_force.cpp)."""
    src_cols = [0, 1]
    if g.has_z:
        zcol = 2
    if g.has_m:
        mcol = 2 + int(g.has_z)

    def f(arr):
        n = len(arr)
        cols = [arr[:, 0], arr[:, 1]]
        if want_z:
            cols.append(arr[:, zcol] if g.has_z else np.full(n, z))
        if want_m:
            cols.append(arr[:, mcol] if g.has_m else np.full(n, m))
        return np.column_stack(cols)

    out = g.map_coords(f)

    def setflags(gg: Geometry):
        gg.has_z, gg.has_m = want_z, want_m
        for p in gg.parts or []:
            setflags(p)

    setflags(out)
    return out


def line_merge(g: Geometry, directed: bool = False) -> Geometry:
    """Merge connected linestrings (GEOS LineMerger). ``directed`` only
    joins a chain's END to another chain's START (no flipping)."""
    lines = [p for p in g.flatten() if p.type_id == LINESTRING and len(p.coords) >= 2]
    if not lines:
        return Geometry.empty(GEOMETRYCOLLECTION) if g.is_empty() else g
    chains = [l.coords[:, :2].copy() for l in lines]
    # GEOS LineMerger: lines join only THROUGH nodes of degree exactly 2 —
    # a 3-way junction stays a junction (postgis/st_linemerge.test)
    from collections import defaultdict

    deg: dict = defaultdict(int)
    for c in chains:
        deg[(float(c[0][0]), float(c[0][1]))] += 1
        deg[(float(c[-1][0]), float(c[-1][1]))] += 1

    def joinable(pt) -> bool:
        return deg[(float(pt[0]), float(pt[1]))] == 2

    merged = True
    while merged:
        merged = False
        out: List[np.ndarray] = []
        used = [False] * len(chains)
        for i in range(len(chains)):
            if used[i]:
                continue
            cur = chains[i]
            used[i] = True
            extended = True
            while extended:
                extended = False
                for j in range(len(chains)):
                    if used[j]:
                        continue
                    c = chains[j]
                    if np.array_equal(cur[-1], c[0]) and joinable(cur[-1]):
                        cur = np.vstack([cur, c[1:]])
                    elif not directed and np.array_equal(cur[-1], c[-1]) and joinable(cur[-1]):
                        cur = np.vstack([cur, c[::-1][1:]])
                    elif np.array_equal(cur[0], c[-1]) and joinable(cur[0]):
                        cur = np.vstack([c, cur[1:]])
                    elif not directed and np.array_equal(cur[0], c[0]) and joinable(cur[0]):
                        cur = np.vstack([c[::-1], cur[1:]])
                    else:
                        continue
                    used[j] = True
                    extended = True
                    merged = True
            out.append(cur)
        chains = out
    geoms = [Geometry(LINESTRING, coords=c) for c in chains]
    if len(geoms) == 1:
        return geoms[0]
    return Geometry.collection(MULTILINESTRING, geoms)


def collection_extract(g: Geometry, dim: Optional[int] = None) -> Geometry:
    """ST_CollectionExtract (core/.../st_collectionextract.cpp): keep parts
    of the requested dimension (1=point,2=line,3=polygon); default = highest
    present."""
    if dim is None:
        # highest dimension among NON-EMPTY parts (st_collectionextract.test:
        # EMPTY members don't count toward the auto dimension)
        dims = [p.topo_dimension() for p in g.flatten() if not p.is_empty()]
        if not dims:
            return g
        dim = max(dims) + 1
    want = {1: (POINT,), 2: (LINESTRING,), 3: (POLYGON,)}[dim]
    kept = [p for p in g.flatten() if p.type_id in want]
    if g.parts is None:  # non-collection: passthrough if matching else EMPTY
        return g if g.type_id in want else Geometry.empty(g.type_id, g.has_z, g.has_m)
    return collect(kept)


def make_valid(g: Geometry) -> Geometry:
    """Light-weight validity repair: drop degenerate rings/lines."""
    if g.type_id == LINESTRING:
        if len(g.coords) == 1:
            return Geometry(POINT, coords=g.coords[0].copy(), has_z=g.has_z, has_m=g.has_m)
        return g
    if g.type_id == POLYGON:
        rings = [r for r in g.rings if len(r) >= 4 and abs(ring_area_signed(r)) > 0]
        return Geometry(POLYGON, rings=rings, has_z=g.has_z, has_m=g.has_m)
    if g.parts is not None:
        out = Geometry(g.type_id, parts=[make_valid(p) for p in g.parts])
        out.has_z, out.has_m = g.has_z, g.has_m
        return out
    return g


def is_valid(g: Geometry) -> bool:
    """Pragmatic validity: rings closed, ≥4 points, non-zero area, no
    self-intersection of the shell (O(n²) segment check)."""
    if g.type_id == POLYGON:
        for ring in g.rings:
            if len(ring) < 4:
                return False
            if not np.array_equal(ring[0, :2], ring[-1, :2]):
                return False
            if abs(ring_area_signed(ring)) == 0.0:
                return False
            n = len(ring) - 1
            for i in range(n):
                for j in range(i + 1, n):
                    if abs(i - j) in (0, 1) or (i == 0 and j == n - 1):
                        continue
                    r = _segments_intersect(
                        ring[i, :2], ring[i + 1, :2], ring[j, :2], ring[j + 1, :2]
                    )
                    if r > 0:
                        return False
        return True
    if g.parts is not None:
        return all(is_valid(p) for p in g.parts)
    return True


def is_simple(g: Geometry) -> bool:
    if g.type_id == LINESTRING:
        arr = g.coords
        n = len(arr) - 1
        closed = n >= 1 and np.array_equal(arr[0, :2], arr[-1, :2])
        for i in range(n):
            for j in range(i + 1, n):
                r = _segments_intersect(arr[i, :2], arr[i + 1, :2], arr[j, :2], arr[j + 1, :2])
                if r == 2:
                    return False
                if r == 1 and j > i + 1:
                    if closed and i == 0 and j == n - 1:
                        continue
                    return False
        return True
    if g.parts is not None:
        return all(is_simple(p) for p in g.parts)
    return True


def is_ring(g: Geometry) -> bool:
    if g.type_id != LINESTRING or len(g.coords) < 4:
        return False
    return bool(np.array_equal(g.coords[0, :2], g.coords[-1, :2])) and is_simple(g)


def is_closed(g: Geometry) -> bool:
    if g.type_id == LINESTRING:
        return len(g.coords) > 0 and bool(np.array_equal(g.coords[0, :2], g.coords[-1, :2]))
    if g.type_id == MULTILINESTRING:
        return bool(g.parts) and all(is_closed(p) for p in g.parts)
    return False


def buffer_point(x: float, y: float, dist: float, segments: int = 8) -> Geometry:
    """Circle approximation with 4*segments vertices (GEOS quadsegs
    convention: ST_Buffer default 8 segments per quadrant)."""
    n = max(4, 4 * segments)
    ang = np.linspace(0.0, 2.0 * math.pi, n, endpoint=False)
    ring = np.column_stack([x + dist * np.cos(ang), y + dist * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    return Geometry(POLYGON, rings=[ring])


def buffer(g: Geometry, dist: float, segments: int = 8, cap: str = "round",
           join: str = "round", mitre_limit: float = 1.0) -> Geometry:
    """Full ST_Buffer (GEOS quadsegs convention; round/flat/square caps,
    round/mitre/bevel joins + mitre_limit — geos/.../st_buffer.cpp:64-104).
    Single positive-distance points keep the direct n-gon fast path;
    everything else (lines, polygons, collections, negative distances) runs
    the capsule-union/erosion engine in overlay.py."""
    if g.is_empty():
        return Geometry.empty(POLYGON)
    if dist == 0:
        return g
    if g.type_id == POINT and dist > 0 and cap == "round":
        return buffer_point(float(g.coords[0]), float(g.coords[1]), dist, segments)
    if (
        g.type_id == LINESTRING and dist > 0 and cap == "round"
        and g.coords is not None and len(g.coords) == 2
    ):
        # single-segment capsule in closed form: two half (4*segments)-gons
        # joined by the offset rectangle — identical vertex placement to the
        # capsule-union engine, ~15x cheaper
        ax, ay = float(g.coords[0][0]), float(g.coords[0][1])
        bx, by = float(g.coords[1][0]), float(g.coords[1][1])
        seg_len = math.hypot(bx - ax, by - ay)
        if seg_len == 0.0:
            return buffer_point(ax, ay, dist, segments)
        th = math.atan2(by - ay, bx - ax)
        half = max(2, 2 * segments)
        step = math.pi / half
        ang_b = th - math.pi / 2 + np.arange(half + 1) * step
        ang_a = th + math.pi / 2 + np.arange(half + 1) * step
        arc_b = np.column_stack([bx + dist * np.cos(ang_b), by + dist * np.sin(ang_b)])
        arc_a = np.column_stack([ax + dist * np.cos(ang_a), ay + dist * np.sin(ang_a)])
        ring = np.vstack([arc_b, arc_a, arc_b[:1]])
        return Geometry(POLYGON, rings=[ring])
    if dist < 0 and g.type_id in (POINT, MULTIPOINT, LINESTRING, MULTILINESTRING):
        return Geometry.empty(POLYGON)
    from .overlay import buffer_geometry

    return buffer_geometry(g, dist, segments, cap, join, mitre_limit)


# ============================================================ overlay (box clipping tier)

def clip_to_box(g: Geometry, xmin: float, ymin: float, xmax: float, ymax: float) -> Geometry:
    """Sutherland–Hodgman clip of polygons (and segment clip of lines /
    point filter) against an axis-aligned box — the overlay tier our join
    and tiling paths need. General polygon∩polygon overlay is round-2."""
    if g.type_id == POINT:
        if g.is_empty():
            return g
        x, y = g.coords[0], g.coords[1]
        if xmin <= x <= xmax and ymin <= y <= ymax:
            return g
        return Geometry.empty(POINT, g.has_z, g.has_m)
    if g.type_id == LINESTRING:
        segs = _clip_line_box(g.coords[:, :2], xmin, ymin, xmax, ymax)
        if not segs:
            return Geometry.empty(LINESTRING)
        if len(segs) == 1:
            return Geometry(LINESTRING, coords=segs[0])
        return Geometry.collection(
            MULTILINESTRING, [Geometry(LINESTRING, coords=s) for s in segs]
        )
    if g.type_id == POLYGON:
        rings = []
        for i, r in enumerate(g.rings):
            c = _sh_clip(r[:, :2], xmin, ymin, xmax, ymax)
            if len(c) >= 4:
                rings.append(c)
            elif i == 0:
                return Geometry.empty(POLYGON)
        return Geometry(POLYGON, rings=rings)
    if g.parts is not None:
        parts = [clip_to_box(p, xmin, ymin, xmax, ymax) for p in g.parts]
        parts = [p for p in parts if not p.is_empty()]
        return collect(parts) if parts else Geometry.empty(g.type_id)
    return g


def _sh_clip(ring: np.ndarray, xmin, ymin, xmax, ymax) -> np.ndarray:
    def clip_edge(poly, inside, intersect):
        out = []
        n = len(poly)
        for i in range(n):
            cur = poly[i]
            prv = poly[i - 1]
            cin, pin = inside(cur), inside(prv)
            if cin:
                if not pin:
                    out.append(intersect(prv, cur))
                out.append(cur)
            elif pin:
                out.append(intersect(prv, cur))
        return out

    poly = [tuple(p) for p in ring[:-1]] if len(ring) and np.array_equal(ring[0], ring[-1]) else [tuple(p) for p in ring]
    edges = [
        (lambda p: p[0] >= xmin, lambda a, b: _ix_v(a, b, xmin)),
        (lambda p: p[0] <= xmax, lambda a, b: _ix_v(a, b, xmax)),
        (lambda p: p[1] >= ymin, lambda a, b: _ix_h(a, b, ymin)),
        (lambda p: p[1] <= ymax, lambda a, b: _ix_h(a, b, ymax)),
    ]
    for inside, intersect in edges:
        poly = clip_edge(poly, inside, intersect)
        if not poly:
            return np.empty((0, 2))
    arr = np.asarray(poly + [poly[0]], dtype=np.float64)
    return arr


def _ix_v(a, b, x):
    t = (x - a[0]) / (b[0] - a[0])
    return (x, a[1] + t * (b[1] - a[1]))


def _ix_h(a, b, y):
    t = (y - a[1]) / (b[1] - a[1])
    return (a[0] + t * (b[0] - a[0]), y)


def _clip_line_box(arr: np.ndarray, xmin, ymin, xmax, ymax) -> List[np.ndarray]:
    """Liang-Barsky per segment; stitch consecutive kept segments."""
    out: List[List[Tuple[float, float]]] = []
    cur: List[Tuple[float, float]] = []
    for i in range(len(arr) - 1):
        seg = _lb_clip(arr[i], arr[i + 1], xmin, ymin, xmax, ymax)
        if seg is None:
            if len(cur) >= 2:
                out.append(cur)
            cur = []
            continue
        a, b = seg
        if cur and cur[-1] == a:
            cur.append(b)
        else:
            if len(cur) >= 2:
                out.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        out.append(cur)
    return [np.asarray(c, dtype=np.float64) for c in out]


def _lb_clip(p0, p1, xmin, ymin, xmax, ymax):
    x0, y0 = float(p0[0]), float(p0[1])
    dx, dy = float(p1[0]) - x0, float(p1[1]) - y0
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, x0 - xmin),
        (dx, xmax - x0),
        (-dy, y0 - ymin),
        (dy, ymax - y0),
    ):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    return (x0 + t0 * dx, y0 + t0 * dy), (x0 + t1 * dx, y0 + t1 * dy)


# ============================================================ misc processing

def normalize(g: Geometry) -> Geometry:
    """Canonical form: shells CCW, holes CW, rings start at lexicographically
    smallest vertex, collection parts sorted by WKB bytes (stable canonical
    order; matches GEOS normalize in spirit)."""

    def norm_ring(r: np.ndarray, want_ccw: bool) -> np.ndarray:
        if len(r) < 4:
            return r
        ccw = ring_area_signed(r) > 0
        rr = r if ccw == want_ccw else r[::-1]
        body = rr[:-1]
        idx = np.lexsort((body[:, 1], body[:, 0]))[0]
        rolled = np.vstack([body[idx:], body[:idx], body[idx : idx + 1]])
        return rolled

    if g.type_id == POLYGON:
        rings = [norm_ring(r, i == 0) for i, r in enumerate(g.rings)]
        out = Geometry(POLYGON, rings=rings, has_z=g.has_z, has_m=g.has_m)
        return out
    if g.parts is not None:
        from .wkb import to_wkb

        parts = sorted((normalize(p) for p in g.parts), key=lambda p: to_wkb(p))
        out = Geometry(g.type_id, parts=parts, has_z=g.has_z, has_m=g.has_m)
        return out
    return g


def _nearest_on_path(px, py, x, y):
    """(dist, qx, qy): closest point on polyline to (px,py)."""
    if len(x) == 1:
        return math.hypot(px - x[0], py - y[0]), float(x[0]), float(y[0])
    ax, ay = x[:-1], y[:-1]
    bx, by = x[1:], y[1:]
    dx, dy = bx - ax, by - ay
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - ax) * dx + (py - ay) * dy) / ll
    t = np.where(ll == 0, 0.0, np.clip(t, 0.0, 1.0))
    cx = ax + t * dx
    cy = ay + t * dy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    k = int(np.argmin(d2))
    return float(math.sqrt(d2[k])), float(cx[k]), float(cy[k])


def shortest_line(a: Geometry, b: Geometry) -> Optional[Geometry]:
    """LINESTRING between nearest points of a and b (GEOS ST_ShortestLine)."""
    if a is None or b is None or a.is_empty() or b.is_empty():
        return None
    best = (math.inf, 0.0, 0.0, 0.0, 0.0)

    def probe(src: Geometry, dst: Geometry, flip: bool):
        nonlocal best
        for arr in src.vertex_arrays():
            for row in arr:
                px, py = float(row[0]), float(row[1])
                if _point_loc(px, py, dst) > 0:
                    cand = (0.0, px, py, px, py)
                    if cand[0] < best[0]:
                        best = cand
                    return
                for part in dst.flatten():
                    if part.is_empty():
                        continue
                    if part.type_id == POINT:
                        d = math.hypot(px - part.coords[0], py - part.coords[1])
                        q = (d, px, py, float(part.coords[0]), float(part.coords[1]))
                    elif part.type_id == LINESTRING:
                        d, qx, qy = _nearest_on_path(px, py, part.coords[:, 0], part.coords[:, 1])
                        q = (d, px, py, qx, qy)
                    else:
                        d = math.inf
                        q = None
                        for ring in part.rings:
                            dd, qx, qy = _nearest_on_path(px, py, ring[:, 0], ring[:, 1])
                            if dd < d:
                                d = dd
                                q = (dd, px, py, qx, qy)
                        if q is None:
                            continue
                    if q[0] < best[0]:
                        best = q if not flip else (q[0], q[3], q[4], q[1], q[2])

    if intersects(a, b):
        # pick a shared point: representative of a inside b or vice versa
        ra = _rep_point(a)
        if ra and _point_loc(ra[0], ra[1], b) > 0:
            p = ra
        else:
            p = _rep_point(b)
        return Geometry(LINESTRING, coords=np.array([[p[0], p[1]], [p[0], p[1]]]))
    probe(a, b, False)
    probe(b, a, True)
    return Geometry(
        LINESTRING, coords=np.array([[best[1], best[2]], [best[3], best[4]]])
    )


def _is_axis_box(g: Geometry) -> Optional[Tuple[float, float, float, float]]:
    """If g is a single-ring axis-aligned rectangle, return its bounds."""
    if g.type_id != POLYGON or len(g.rings) != 1:
        return None
    r = g.rings[0]
    if len(r) != 5 or not np.array_equal(r[0, :2], r[-1, :2]):
        return None
    xs = np.unique(r[:, 0])
    ys = np.unique(r[:, 1])
    if len(xs) != 2 or len(ys) != 2:
        return None
    return float(xs[0]), float(ys[0]), float(xs[1]), float(ys[1])


def intersection(a: Geometry, b: Geometry) -> Geometry:
    """Binary intersection — v1 tiers: (1) disjoint → EMPTY, (2) either side
    an axis-aligned box → clip, (3) point/multipoint vs anything → point
    selection, else NotImplementedError (general overlay is round-2;
    reference delegates to GEOS, st_intersection.cpp)."""
    if a is None or b is None:
        return None
    if not intersects(a, b):
        return Geometry.empty(GEOMETRYCOLLECTION)
    if a.topo_dimension() == 0:
        pts = [p for p in a.flatten() if not p.is_empty()
               and _point_loc(p.coords[0], p.coords[1], b) > 0]
        return pts[0] if len(pts) == 1 else collect(pts)
    if b.topo_dimension() == 0:
        return intersection(b, a)
    box = _is_axis_box(b)
    if box is not None:
        return clip_to_box(a, *box)
    box = _is_axis_box(a)
    if box is not None:
        return clip_to_box(b, *box)
    if equals(a, b):
        return a
    if a.topo_dimension() == 2 and b.topo_dimension() == 2:
        from .overlay import polygon_intersection

        return polygon_intersection(a, b)
    if a.topo_dimension() == 1 and b.topo_dimension() == 2:
        from .overlay import line_region_intersection

        return line_region_intersection(a, b)
    if a.topo_dimension() == 2 and b.topo_dimension() == 1:
        from .overlay import line_region_intersection

        return line_region_intersection(b, a)
    if a.topo_dimension() == 1 and b.topo_dimension() == 1:
        from .overlay import line_line_intersection

        return line_line_intersection(a, b)
    raise NotImplementedError("unsupported dimension pair for intersection")


def union(a: Geometry, b: Geometry) -> Geometry:
    """Binary union — v1: disjoint or touching inputs → collected multi;
    equal/contained inputs → the container; else NotImplementedError."""
    if a is None or b is None:
        return None
    if a.is_empty():
        return b
    if b.is_empty():
        return a
    if covers(a, b):
        return a
    if covers(b, a):
        return b
    da, db = a.topo_dimension(), b.topo_dimension()
    if not intersects(a, b) or (touches(a, b) and {da, db} != {1, 2}):
        # line/region touching pairs fall through to the dissolve branch:
        # boundary-collinear line parts are covered by the region's point
        # set and must be absorbed (GEOS OverlayNG union semantics)
        parts = [p for g in (a, b) for p in g.flatten() if not p.is_empty()]
        return collect(parts)
    if da == 2 and db == 2:
        from .overlay import polygon_union

        return polygon_union(a, b)
    if da == 1 and db == 1:
        from .overlay import line_line_union

        return line_line_union(a, b)
    if {da, db} == {1, 2}:
        # GEOS-style mixed union: region + the line parts outside its
        # closure, collected (st_union.cpp:65 semantics)
        from .overlay import line_region_difference

        line, region = (a, b) if da == 1 else (b, a)
        outside = line_region_difference(line, region)
        parts = [g for g in region.flatten() if not g.is_empty()] + [
            g for g in outside.flatten() if not g.is_empty()
        ]
        return collect(parts)
    if da == 0 or db == 0:
        # points melt into any higher-dim geometry that covers them
        pt, other = (a, b) if da == 0 else (b, a)
        keep = [
            p for p in pt.flatten()
            if not p.is_empty()
            and _point_loc(p.coords[0], p.coords[1], other) == 0
        ]
        parts = [g for g in other.flatten() if not g.is_empty()] + keep
        return collect(parts)
    raise NotImplementedError(
        "union of these geometry types not yet implemented"
    )


def difference(a: Geometry, b: Geometry) -> Geometry:
    """Binary difference — v1: disjoint → a; a covered by b → EMPTY;
    points minus anything → point selection; else NotImplementedError."""
    if a is None or b is None:
        return None
    if not intersects(a, b):
        return a
    if covered_by(a, b):
        return Geometry.empty(a.type_id, a.has_z, a.has_m)
    if a.topo_dimension() == 0:
        pts = [p for p in a.flatten() if not p.is_empty()
               and _point_loc(p.coords[0], p.coords[1], b) == 0]
        if not pts:
            return Geometry.empty(a.type_id, a.has_z, a.has_m)
        return pts[0] if len(pts) == 1 else collect(pts)
    da, db = a.topo_dimension(), b.topo_dimension()
    if da == 2 and db == 2:
        from .overlay import polygon_difference

        return polygon_difference(a, b)
    if da == 1 and db == 2:
        from .overlay import line_region_difference

        return line_region_difference(a, b)
    if da == 1 and db == 1:
        from .overlay import line_line_difference

        return line_line_difference(a, b)
    if db < da:
        # subtracting a lower-dimension geometry removes no measure
        # (GEOS OverlayNG difference semantics, st_difference.cpp:59)
        return a
    raise NotImplementedError("difference of these geometry types not yet implemented")


# ============================================================ bulk (vectorized over many points)

def point_in_ring_bulk(xs: np.ndarray, ys: np.ndarray, ring: np.ndarray,
                       chunk: int = 4096) -> np.ndarray:
    """Vectorized point-in-ring for many points at once: 0 out / 1 boundary /
    2 in. Points×edges broadcasting, chunked to bound memory. This is the
    probe-side engine of the broadcast spatial join (the analog of the
    reference's prepared-geometry constant path, geos_executor.hpp:35-50)."""
    n = len(xs)
    out = np.zeros(n, dtype=np.int8)
    if len(ring) < 3:
        return out
    ex0x = ring[:-1, 0][None, :]
    ex0y = ring[:-1, 1][None, :]
    ex1x = ring[1:, 0][None, :]
    ex1y = ring[1:, 1][None, :]
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        px = xs[lo:hi][:, None]
        py = ys[lo:hi][:, None]
        cross = (ex1x - ex0x) * (py - ex0y) - (ex1y - ex0y) * (px - ex0x)
        on = (
            (cross == 0.0)
            & (px >= np.minimum(ex0x, ex1x)) & (px <= np.maximum(ex0x, ex1x))
            & (py >= np.minimum(ex0y, ex1y)) & (py <= np.maximum(ex0y, ex1y))
        ).any(axis=1)
        cond = (ex0y > py) != (ex1y > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ex0x + (py - ex0y) * (ex1x - ex0x) / (ex1y - ex0y)
        inside = ((cond & (px < xint)).sum(axis=1) % 2) == 1
        res = np.where(on, 1, np.where(inside, 2, 0)).astype(np.int8)
        out[lo:hi] = res
    return out


def points_in_polygon_bulk(xs: np.ndarray, ys: np.ndarray, poly: Geometry) -> np.ndarray:
    """0/1/2 location of many points vs one polygon (holes honored)."""
    if not poly.rings:
        return np.zeros(len(xs), dtype=np.int8)
    loc = point_in_ring_bulk(xs, ys, poly.rings[0])
    inside = loc == 2
    if inside.any():
        for hole in poly.rings[1:]:
            h = point_in_ring_bulk(xs[inside], ys[inside], hole)
            upd = loc[inside]
            upd[h == 2] = 0
            upd[h == 1] = 1
            loc[inside] = upd
            inside = loc == 2
            if not inside.any():
                break
    return loc


def points_in_geometry_bulk(xs: np.ndarray, ys: np.ndarray, g: Geometry) -> np.ndarray:
    """0/1/2 location of many points vs any geometry (max over parts)."""
    out = np.zeros(len(xs), dtype=np.int8)
    for part in g.flatten():
        if part.is_empty():
            continue
        if part.type_id == POLYGON:
            out = np.maximum(out, points_in_polygon_bulk(xs, ys, part))
        elif part.type_id == POINT:
            hit = (xs == part.coords[0]) & (ys == part.coords[1])
            out = np.maximum(out, np.where(hit, 2, 0).astype(np.int8))
        elif part.type_id == LINESTRING:
            arr = part.coords
            for i in range(len(arr) - 1):
                ax, ay, bx, by = arr[i, 0], arr[i, 1], arr[i + 1, 0], arr[i + 1, 1]
                cr = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
                on = (
                    (cr == 0.0)
                    & (xs >= min(ax, bx)) & (xs <= max(ax, bx))
                    & (ys >= min(ay, by)) & (ys <= max(ay, by))
                )
                out = np.maximum(out, np.where(on, 2, 0).astype(np.int8))
        if (out == 2).all():
            break
    return out
