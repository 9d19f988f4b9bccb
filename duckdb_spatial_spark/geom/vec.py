"""Vectorized batch WKB fast paths.

An Arrow/pandas UDF batch is very often *homogeneous*: every row is a
little-endian ISO-WKB blob of the same geometry type and byte length
(21-byte XY points, fixed-n linestrings, single-ring polygons with a common
vertex count — exactly what constructors like st_point / st_makeenvelope /
st_buffer(point) emit). These helpers detect such batches with O(1)-per-row
NumPy header checks and decode every coordinate in one ``frombuffer`` —
replacing the per-row ``Geometry`` object parse. This is the Spark-batch
analog of the reference's columnar native types (POINT_2D/LINESTRING_2D/
POLYGON_2D, docs/internals.md:6): "better compression and faster execution
in exchange for flexibility", with the generic WKB path as the fallback.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

_PT_HDR = b"\x01\x01\x00\x00\x00"
_LS_HDR = b"\x01\x02\x00\x00\x00"
_PG_HDR = b"\x01\x03\x00\x00\x00"


def fixed_matrix(s: pd.Series) -> Optional[np.ndarray]:
    """(n, size) uint8 matrix when every value is a same-length bytes blob
    with no nulls; None → caller falls back to the generic per-row path."""
    vals = s.to_numpy(dtype=object)
    n = len(vals)
    if n == 0:
        return None
    first = vals[0]
    if not isinstance(first, (bytes, bytearray)):
        return None
    size = len(first)
    if size == 0:
        return None
    for v in vals:
        if v is None or len(v) != size:
            return None
    buf = b"".join(vals)
    return np.frombuffer(buf, dtype=np.uint8).reshape(n, size)


def _f8(mat: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """View byte columns [lo:hi) of the matrix as little-endian doubles."""
    sub = np.ascontiguousarray(mat[:, lo:hi])
    return sub.view("<f8").reshape(len(mat), (hi - lo) // 8)


def _hdr_match(mat: np.ndarray, hdr: bytes) -> bool:
    want = np.frombuffer(hdr, dtype=np.uint8)
    return bool((mat[:, : len(want)] == want).all())


def decode_points(mat: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(x, y) when the batch is uniform LE XY POINT WKB."""
    if mat.shape[1] != 21 or not _hdr_match(mat, _PT_HDR):
        return None
    xy = _f8(mat, 5, 21)
    return xy[:, 0], xy[:, 1]


def decode_linestrings(mat: np.ndarray) -> Optional[np.ndarray]:
    """(n, npts, 2) coords when the batch is uniform LE XY LINESTRING WKB
    with a common vertex count."""
    if mat.shape[1] < 9 or not _hdr_match(mat, _LS_HDR):
        return None
    counts = np.ascontiguousarray(mat[:, 5:9]).view("<u4").ravel()
    npts = int(counts[0])
    if not (counts == npts).all() or mat.shape[1] != 9 + 16 * npts:
        return None
    coords = _f8(mat, 9, 9 + 16 * npts)
    return coords.reshape(len(mat), npts, 2)


def decode_polygons_1ring(mat: np.ndarray) -> Optional[np.ndarray]:
    """(n, npts, 2) shell coords when the batch is uniform LE XY POLYGON WKB
    with exactly one ring of a common vertex count."""
    if mat.shape[1] < 13 or not _hdr_match(mat, _PG_HDR):
        return None
    nrings = np.ascontiguousarray(mat[:, 5:9]).view("<u4").ravel()
    if not (nrings == 1).all():
        return None
    counts = np.ascontiguousarray(mat[:, 9:13]).view("<u4").ravel()
    npts = int(counts[0])
    if not (counts == npts).all() or mat.shape[1] != 13 + 16 * npts:
        return None
    coords = _f8(mat, 13, 13 + 16 * npts)
    return coords.reshape(len(mat), npts, 2)


_MP_HDR = b"\x01\x04\x00\x00\x00"
_PT_HDR_ARR = np.frombuffer(_PT_HDR, dtype=np.uint8)


def multipoint_xy(buf: bytes) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(x, y) arrays when a single WKB blob is a uniform LE XY MULTIPOINT —
    decodes k points in one frombuffer instead of k Geometry objects
    (the dominant shape out of st_collect_agg over point tables)."""
    if len(buf) < 9 or buf[:5] != _MP_HDR:
        return None
    n = int.from_bytes(buf[5:9], "little")
    if n == 0 or len(buf) != 9 + 21 * n:
        return None
    mat = np.frombuffer(buf, dtype=np.uint8, count=21 * n, offset=9).reshape(n, 21)
    if not (mat[:, :5] == _PT_HDR_ARR).all():
        return None
    xy = np.ascontiguousarray(mat[:, 5:21]).view("<f8").reshape(n, 2)
    return xy[:, 0], xy[:, 1]


# ----------------------------------------------------------------- encoders

def encode_points(x: np.ndarray, y: np.ndarray) -> List[bytes]:
    n = len(x)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, :5] = np.frombuffer(_PT_HDR, dtype=np.uint8)
    buf[:, 5:13] = np.ascontiguousarray(x, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.ascontiguousarray(y, dtype="<f8").view(np.uint8).reshape(n, 8)
    return [r.tobytes() for r in buf]


def encode_linestrings(coords: np.ndarray) -> List[bytes]:
    """coords (n, npts, 2) → uniform LE LINESTRING WKB blobs."""
    n, npts, _ = coords.shape
    size = 9 + 16 * npts
    buf = np.empty((n, size), dtype=np.uint8)
    buf[:, :5] = np.frombuffer(_LS_HDR, dtype=np.uint8)
    buf[:, 5:9] = np.frombuffer(np.uint32(npts).tobytes(), dtype=np.uint8)
    buf[:, 9:] = (
        np.ascontiguousarray(coords, dtype="<f8").view(np.uint8).reshape(n, 16 * npts)
    )
    return [r.tobytes() for r in buf]


def encode_polygons_1ring(coords: np.ndarray) -> List[bytes]:
    """coords (n, npts, 2), first==last per ring → LE POLYGON WKB blobs."""
    n, npts, _ = coords.shape
    size = 13 + 16 * npts
    buf = np.empty((n, size), dtype=np.uint8)
    buf[:, :5] = np.frombuffer(_PG_HDR, dtype=np.uint8)
    buf[:, 5:9] = np.frombuffer(np.uint32(1).tobytes(), dtype=np.uint8)
    buf[:, 9:13] = np.frombuffer(np.uint32(npts).tobytes(), dtype=np.uint8)
    buf[:, 13:] = (
        np.ascontiguousarray(coords, dtype="<f8").view(np.uint8).reshape(n, 16 * npts)
    )
    return [r.tobytes() for r in buf]


# ----------------------------------------------------------------- measures

def length_of_lines(coords: np.ndarray) -> np.ndarray:
    """Row-wise polyline length for (n, npts, 2) coords."""
    d = np.diff(coords, axis=1)
    return np.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2).sum(axis=1)


def shoelace_area(coords: np.ndarray) -> np.ndarray:
    """Row-wise |shoelace|/2 for closed rings (n, npts, 2)."""
    x, y = coords[..., 0], coords[..., 1]
    s = x[:, :-1] * y[:, 1:] - x[:, 1:] * y[:, :-1]
    return np.abs(s.sum(axis=1)) * 0.5


# ------------------------------------------------- rectangle/point predicates

def rect_bounds(mat: np.ndarray) -> Optional[np.ndarray]:
    """(n, 4) [xmin ymin xmax ymax] when the batch is uniform single-ring
    5-vertex polygons that are all axis-aligned rectangles with positive
    area; None otherwise."""
    ring = decode_polygons_1ring(mat)
    if ring is None or ring.shape[1] != 5:
        return None
    x, y = ring[..., 0], ring[..., 1]
    xmin, xmax = x.min(axis=1), x.max(axis=1)
    ymin, ymax = y.min(axis=1), y.max(axis=1)
    ok = (
        (ring[:, 0] == ring[:, 4]).all()
        and ((x == xmin[:, None]) | (x == xmax[:, None])).all()
        and ((y == ymin[:, None]) | (y == ymax[:, None])).all()
        and bool(((xmax > xmin) & (ymax > ymin)).all())
    )
    if not ok:
        return None
    return np.stack([xmin, ymin, xmax, ymax], axis=1)


def seg_predicate(pred: str, A: np.ndarray, B: np.ndarray) -> Optional[np.ndarray]:
    """Closed-form topological predicates between uniform batches of 2-point
    segments (``A``/``B`` = (n, 2, 2) coords). Only claims the batch when no
    pair is parallel/degenerate (cross of directions ≠ 0 everywhere) — there
    a segment pair meets in at most one point, so every DE-9IM predicate
    reduces to orientation tests: crosses = proper interior crossing,
    touches = meeting at an endpoint, equals/contains/overlaps/… = False
    (they all require collinearity). Exact same float math (cross-product
    orientations) as the per-row kernels."""
    if pred not in _RECT_PREDS and pred != "intersects":
        return None
    a0, a1 = A[:, 0], A[:, 1]
    b0, b1 = B[:, 0], B[:, 1]
    r = a1 - a0
    s = b1 - b0
    rxs = r[:, 0] * s[:, 1] - r[:, 1] * s[:, 0]
    if bool((rxs == 0).any()):
        return None  # parallel/collinear/degenerate rows → per-row kernels

    def orient(p, q, t):
        return (q[:, 0] - p[:, 0]) * (t[:, 1] - p[:, 1]) - \
               (q[:, 1] - p[:, 1]) * (t[:, 0] - p[:, 0])

    def on_seg(p, q, t):
        # collinear point t within segment p→q (bounding-box containment)
        return (
            (t[:, 0] >= np.minimum(p[:, 0], q[:, 0]))
            & (t[:, 0] <= np.maximum(p[:, 0], q[:, 0]))
            & (t[:, 1] >= np.minimum(p[:, 1], q[:, 1]))
            & (t[:, 1] <= np.maximum(p[:, 1], q[:, 1]))
        )

    o1 = orient(a0, a1, b0)
    o2 = orient(a0, a1, b1)
    o3 = orient(b0, b1, a0)
    o4 = orient(b0, b1, a1)
    proper = (o1 * o2 < 0) & (o3 * o4 < 0)
    touching = (
        ((o1 == 0) & on_seg(a0, a1, b0))
        | ((o2 == 0) & on_seg(a0, a1, b1))
        | ((o3 == 0) & on_seg(b0, b1, a0))
        | ((o4 == 0) & on_seg(b0, b1, a1))
    )
    inter = proper | touching
    if pred == "intersects":
        return inter
    if pred == "disjoint":
        return ~inter
    if pred == "crosses":
        return proper
    if pred == "touches":
        return touching
    # equals / contains / containsproperly / within / covers / coveredby /
    # overlaps all require the segments to be collinear — excluded above
    return np.zeros(len(A), dtype=bool)


def buffer_rects(rb: np.ndarray, d: float, quad_segs: int, join: str,
                 mitre_limit: float) -> Optional[List[bytes]]:
    """Closed-form ST_Buffer of a uniform batch of axis-aligned rectangles
    (``rb`` = (n, 4) [xmin ymin xmax ymax]) for every join style — the
    batch analog of overlay._buffer_rect. Dilation: expanded rect (mitre,
    limit ≥ √2), corner-beveled octagon (bevel), or 4-arc rounded rect
    (round, quad_segs per corner). Erosion: shrunk rect when every row
    survives. Returns None for cases the caller must run per-row
    (limited mitre below √2, any-empty erosion, d == 0)."""
    import math

    xmin, ymin, xmax, ymax = rb[:, 0], rb[:, 1], rb[:, 2], rb[:, 3]
    n = len(rb)
    if d == 0:
        return None
    if d < 0:
        dd = -d
        if not bool(((xmax - xmin > 2 * dd) & (ymax - ymin > 2 * dd)).all()):
            return None
        ring = np.empty((n, 5, 2))
        ring[:, 0] = ring[:, 4] = np.stack([xmin + dd, ymin + dd], axis=1)
        ring[:, 1] = np.stack([xmax - dd, ymin + dd], axis=1)
        ring[:, 2] = np.stack([xmax - dd, ymax - dd], axis=1)
        ring[:, 3] = np.stack([xmin + dd, ymax - dd], axis=1)
        return encode_polygons_1ring(ring)
    if join == "mitre":
        if mitre_limit < math.sqrt(2.0):
            return None
        ring = np.empty((n, 5, 2))
        ring[:, 0] = ring[:, 4] = np.stack([xmin - d, ymin - d], axis=1)
        ring[:, 1] = np.stack([xmax + d, ymin - d], axis=1)
        ring[:, 2] = np.stack([xmax + d, ymax + d], axis=1)
        ring[:, 3] = np.stack([xmin - d, ymax + d], axis=1)
        return encode_polygons_1ring(ring)
    if join == "bevel":
        ring = np.empty((n, 9, 2))
        ring[:, 0] = ring[:, 8] = np.stack([xmin, ymin - d], axis=1)
        ring[:, 1] = np.stack([xmax, ymin - d], axis=1)
        ring[:, 2] = np.stack([xmax + d, ymin], axis=1)
        ring[:, 3] = np.stack([xmax + d, ymax], axis=1)
        ring[:, 4] = np.stack([xmax, ymax + d], axis=1)
        ring[:, 5] = np.stack([xmin, ymax + d], axis=1)
        ring[:, 6] = np.stack([xmin - d, ymax], axis=1)
        ring[:, 7] = np.stack([xmin - d, ymin], axis=1)
        return encode_polygons_1ring(ring)
    # round: CCW ring of 4 sides + 4 quarter arcs, quad_segs segments each
    qs = max(1, int(quad_segs))
    npts = 4 * (qs + 1) + 1
    ring = np.empty((n, npts, 2))
    ring[:, 0] = np.stack([xmin, ymin - d], axis=1)
    t = np.linspace(0.0, math.pi / 2, qs + 1)
    pos = 1
    for cx, cy, a0 in ((xmax, ymin, -math.pi / 2), (xmax, ymax, 0.0),
                       (xmin, ymax, math.pi / 2), (xmin, ymin, math.pi)):
        ang = a0 + t
        ring[:, pos:pos + qs + 1, 0] = cx[:, None] + d * np.cos(ang)[None, :]
        ring[:, pos:pos + qs + 1, 1] = cy[:, None] + d * np.sin(ang)[None, :]
        pos += qs + 1
    ring[:, -1] = ring[:, 0]
    return encode_polygons_1ring(ring)


def point_bounds(mat: np.ndarray) -> Optional[np.ndarray]:
    """(n, 4) degenerate bounds for a uniform XY point batch."""
    pt = decode_points(mat)
    if pt is None:
        return None
    x, y = pt
    return np.stack([x, y, x, y], axis=1)


_RECT_PREDS = frozenset({
    "intersects", "disjoint", "contains", "containsproperly", "within",
    "covers", "coveredby", "equals", "touches", "overlaps", "crosses",
})


def rect_predicate(pred: str, A: np.ndarray, B: np.ndarray,
                   a_point: bool, b_point: bool) -> Optional[np.ndarray]:
    """Closed-form topological predicates between axis-aligned rectangles
    (positive area) and/or points, from (n,4) bounds. Returns bool array or
    None when the predicate isn't supported for the kind combination.

    This is the engine's analog of the reference's native fast paths
    (core/.../st_intersects.cpp BOX_2D overlap, st_contains.cpp PiP) —
    hit whenever a uniform batch of envelope/tile rectangles meets points
    or other rectangles, which is the dominant shape in bbox workloads."""
    if pred not in _RECT_PREDS:
        return None
    ax0, ay0, ax1, ay1 = A[:, 0], A[:, 1], A[:, 2], A[:, 3]
    bx0, by0, bx1, by1 = B[:, 0], B[:, 1], B[:, 2], B[:, 3]

    inter = (ax0 <= bx1) & (bx0 <= ax1) & (ay0 <= by1) & (by0 <= ay1)
    if pred == "intersects":
        return inter
    if pred == "disjoint":
        return ~inter

    # interiors intersect (interior of a point is the point itself)
    if a_point and b_point:
        int_int = (ax0 == bx0) & (ay0 == by0)
    elif a_point:
        int_int = (ax0 > bx0) & (ax0 < bx1) & (ay0 > by0) & (ay0 < by1)
    elif b_point:
        int_int = (bx0 > ax0) & (bx0 < ax1) & (by0 > ay0) & (by0 < ay1)
    else:
        int_int = (ax0 < bx1) & (bx0 < ax1) & (ay0 < by1) & (by0 < ay1)

    cov_ab = (bx0 >= ax0) & (bx1 <= ax1) & (by0 >= ay0) & (by1 <= ay1)  # B ⊆ A
    cov_ba = (ax0 >= bx0) & (ax1 <= bx1) & (ay0 >= by0) & (ay1 <= by1)  # A ⊆ B

    if pred == "covers":
        return cov_ab if not a_point else cov_ab & (bx0 == bx1) & (by0 == by1)
    if pred == "coveredby":
        return cov_ba if not b_point else cov_ba & (ax0 == ax1) & (ay0 == ay1)
    if pred == "contains":
        return cov_ab & int_int
    if pred == "within":
        return cov_ba & int_int
    if pred == "containsproperly":
        if a_point:
            return cov_ab & int_int
        return (bx0 > ax0) & (bx1 < ax1) & (by0 > ay0) & (by1 < ay1)
    if pred == "equals":
        if a_point != b_point:
            return np.zeros(len(A), dtype=bool)
        return (ax0 == bx0) & (ay0 == by0) & (ax1 == bx1) & (ay1 == by1)
    if pred == "touches":
        return inter & ~int_int
    if pred == "overlaps":
        if a_point != b_point:  # different topological dimension
            return np.zeros(len(A), dtype=bool)
        if a_point:
            return np.zeros(len(A), dtype=bool)
        return int_int & ~cov_ab & ~cov_ba
    if pred == "crosses":
        # 0-vs-2 dim and 2-vs-2 dim combinations can never cross
        return np.zeros(len(A), dtype=bool)
    return None
