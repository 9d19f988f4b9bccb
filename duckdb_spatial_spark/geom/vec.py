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
