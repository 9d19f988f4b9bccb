"""NTv2 grid-shift (.gsb) codec and datum-shift application.

The reference reaches grid-shifted datum transformations through the PROJ
library it embeds (spatial/src/spatial/proj/functions.cpp:487-513 registers
ST_Transform over PROJ, which consumes NTv2 grids via +nadgrids). This
module implements the public NTv2 binary format directly — the "National
Transformation version 2" layout published by Natural Resources Canada and
used unchanged by PROJ/GDAL for NAD27→NAD83, OSTN-style corrections, and
most national densification grids:

    overview header : 11 records x 16 bytes (8-byte ASCII key + 8-byte value;
                      ints are int32 + 4 pad bytes, reals are float64)
                      NUM_OREC NUM_SREC NUM_FILE GS_TYPE VERSION SYSTEM_F
                      SYSTEM_T MAJOR_F MINOR_F MAJOR_T MINOR_T
    sub-grid header : 11 records — SUB_NAME PARENT CREATED UPDATED
                      S_LAT N_LAT E_LONG W_LONG LAT_INC LONG_INC GS_COUNT
                      (extents/increments in arc-seconds, longitude POSITIVE
                      WEST — the NTv2 convention)
    nodes           : GS_COUNT x 4 float32 (lat_shift, lon_shift, lat_acc,
                      lon_acc) in arc-seconds, rows south→north, columns
                      east→west (increasing west longitude fastest)

Application convention (matches PROJ's ntv2 handling): for east-positive
degrees, forward (SYSTEM_F → SYSTEM_T) is

    lat' = lat + Δφ/3600        lon' = lon − Δλ/3600

(the sign flip because the stored lon shift is west-positive); the inverse
is the standard fixed-point iteration on the forward shift.

Shifts are bilinearly interpolated inside the finest sub-grid containing
the point; points outside every sub-grid pass through unshifted (PROJ's
behavior for out-of-grid coordinates with a non-mandatory grid).

Endianness is auto-detected from NUM_OREC (== 11 in the true byte order);
the writer emits little-endian by default and big-endian on request so the
codec's detection path is testable.
"""
from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["Ntv2Grid", "Ntv2SubGrid", "read_gsb", "write_gsb", "grid_for_path"]


@dataclass(frozen=True)
class Ntv2SubGrid:
    name: str
    parent: str
    s_lat: float      # arc-seconds
    n_lat: float
    e_long: float     # arc-seconds, positive west
    w_long: float
    lat_inc: float
    long_inc: float
    lat_shift: np.ndarray   # (nrows, ncols) arc-seconds
    lon_shift: np.ndarray   # (nrows, ncols) arc-seconds, positive west

    @property
    def nrows(self) -> int:
        return self.lat_shift.shape[0]

    @property
    def ncols(self) -> int:
        return self.lat_shift.shape[1]

    def contains(self, lat_sec: np.ndarray, lon_west_sec: np.ndarray) -> np.ndarray:
        return (
            (lat_sec >= self.s_lat) & (lat_sec <= self.n_lat)
            & (lon_west_sec >= self.e_long) & (lon_west_sec <= self.w_long)
        )

    def interpolate(self, lat_sec: np.ndarray, lon_west_sec: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Bilinear (Δφ, Δλ_west) in arc-seconds at the given positions
        (callers guarantee containment)."""
        fr = (lat_sec - self.s_lat) / self.lat_inc
        fc = (lon_west_sec - self.e_long) / self.long_inc
        r0 = np.clip(np.floor(fr).astype(np.int64), 0, self.nrows - 2) \
            if self.nrows > 1 else np.zeros(fr.shape, np.int64)
        c0 = np.clip(np.floor(fc).astype(np.int64), 0, self.ncols - 2) \
            if self.ncols > 1 else np.zeros(fc.shape, np.int64)
        tr = np.clip(fr - r0, 0.0, 1.0)
        tc = np.clip(fc - c0, 0.0, 1.0)
        r1 = np.minimum(r0 + 1, self.nrows - 1)
        c1 = np.minimum(c0 + 1, self.ncols - 1)

        def bilin(a: np.ndarray) -> np.ndarray:
            return (
                a[r0, c0] * (1 - tr) * (1 - tc)
                + a[r1, c0] * tr * (1 - tc)
                + a[r0, c1] * (1 - tr) * tc
                + a[r1, c1] * tr * tc
            )

        return bilin(self.lat_shift), bilin(self.lon_shift)


@dataclass(frozen=True)
class Ntv2Grid:
    system_f: str
    system_t: str
    major_f: float
    minor_f: float
    major_t: float
    minor_t: float
    subgrids: Tuple[Ntv2SubGrid, ...]

    def _pick(self, lat_sec: np.ndarray, lon_west_sec: np.ndarray) -> np.ndarray:
        """Index of the finest containing sub-grid per point, -1 if none.
        Sub-grids are ranked by cell area (smallest increment = densest =
        deepest child wins), which reproduces the parent/child resolution
        rule without walking the PARENT links."""
        choice = np.full(lat_sec.shape, -1, dtype=np.int64)
        best = np.full(lat_sec.shape, np.inf)
        for i, sg in enumerate(self.subgrids):
            m = sg.contains(lat_sec, lon_west_sec)
            fine = sg.lat_inc * sg.long_inc
            take = m & (fine < best)
            choice[take] = i
            best[take] = fine
        return choice

    def shift(self, lonlat_deg: np.ndarray) -> np.ndarray:
        """Forward datum shift SYSTEM_F → SYSTEM_T of (n,2) east-positive
        lon/lat degrees; out-of-grid points pass through."""
        lon = np.asarray(lonlat_deg[:, 0], dtype=np.float64)
        lat = np.asarray(lonlat_deg[:, 1], dtype=np.float64)
        lat_sec = lat * 3600.0
        lon_w = -lon * 3600.0
        idx = self._pick(lat_sec, lon_w)
        out = np.stack([lon.copy(), lat.copy()], axis=1)
        for i, sg in enumerate(self.subgrids):
            m = idx == i
            if not m.any():
                continue
            dphi, dlam_w = sg.interpolate(lat_sec[m], lon_w[m])
            out[m, 1] += dphi / 3600.0
            out[m, 0] -= dlam_w / 3600.0
        return out

    def shift_inverse(self, lonlat_deg: np.ndarray, iterations: int = 4
                      ) -> np.ndarray:
        """Inverse shift (SYSTEM_T → SYSTEM_F) by fixed-point iteration:
        guess = target, then repeatedly subtract the forward residual —
        converges in 2-4 rounds for arc-second-scale shifts."""
        target = np.asarray(lonlat_deg, dtype=np.float64)
        guess = target.copy()
        for _ in range(iterations):
            fwd = self.shift(guess)
            guess = guess - (fwd - target)
        return guess


# ----------------------------------------------------------------- binary IO

_INT_KEYS = {"NUM_OREC", "NUM_SREC", "NUM_FILE", "GS_COUNT"}


def _read_records(buf: bytes, off: int, n: int, endian: str):
    kv = {}
    order = []
    for _ in range(n):
        name = buf[off:off + 8].decode("ascii", "replace").strip()
        raw = buf[off + 8:off + 16]
        if name.upper() in _INT_KEYS:
            kv[name.upper()] = struct.unpack(endian + "i", raw[:4])[0]
        elif name.upper() in ("GS_TYPE", "VERSION", "SYSTEM_F", "SYSTEM_T",
                              "SUB_NAME", "PARENT", "CREATED", "UPDATED"):
            kv[name.upper()] = raw.decode("ascii", "replace").strip()
        else:
            kv[name.upper()] = struct.unpack(endian + "d", raw)[0]
        order.append(name.upper())
        off += 16
    return kv, order, off


def read_gsb(path: str) -> Ntv2Grid:
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 16 or buf[:8].decode("ascii", "replace").strip() != "NUM_OREC":
        raise ValueError(f"{path}: not an NTv2 .gsb file (missing NUM_OREC)")
    endian = "<"
    if struct.unpack("<i", buf[8:12])[0] != 11:
        if struct.unpack(">i", buf[8:12])[0] != 11:
            raise ValueError(f"{path}: NUM_OREC is neither 11 LE nor 11 BE")
        endian = ">"
    hdr, _, off = _read_records(buf, 0, 11, endian)
    n_srec = int(hdr.get("NUM_SREC", 11))
    n_file = int(hdr.get("NUM_FILE", 0))
    subs: List[Ntv2SubGrid] = []
    for _ in range(n_file):
        sh, _, off = _read_records(buf, off, n_srec, endian)
        count = int(sh["GS_COUNT"])
        nodes = np.frombuffer(buf, dtype=endian + "f4", count=count * 4,
                              offset=off).reshape(count, 4)
        off += count * 16
        ncols = int(round((sh["W_LONG"] - sh["E_LONG"]) / sh["LONG_INC"])) + 1
        nrows = int(round((sh["N_LAT"] - sh["S_LAT"]) / sh["LAT_INC"])) + 1
        if nrows * ncols != count:
            raise ValueError(
                f"{path}: sub-grid {sh.get('SUB_NAME')}: GS_COUNT {count} != "
                f"{nrows}x{ncols} from extents/increments")
        subs.append(Ntv2SubGrid(
            name=sh.get("SUB_NAME", ""), parent=sh.get("PARENT", "NONE"),
            s_lat=sh["S_LAT"], n_lat=sh["N_LAT"],
            e_long=sh["E_LONG"], w_long=sh["W_LONG"],
            lat_inc=sh["LAT_INC"], long_inc=sh["LONG_INC"],
            lat_shift=np.ascontiguousarray(
                nodes[:, 0].astype(np.float64).reshape(nrows, ncols)),
            lon_shift=np.ascontiguousarray(
                nodes[:, 1].astype(np.float64).reshape(nrows, ncols)),
        ))
    return Ntv2Grid(
        system_f=hdr.get("SYSTEM_F", ""), system_t=hdr.get("SYSTEM_T", ""),
        major_f=float(hdr.get("MAJOR_F", 6378137.0)),
        minor_f=float(hdr.get("MINOR_F", 6356752.314)),
        major_t=float(hdr.get("MAJOR_T", 6378137.0)),
        minor_t=float(hdr.get("MINOR_T", 6356752.314)),
        subgrids=tuple(subs),
    )


def _rec_str(name: str, val: str) -> bytes:
    return name.ljust(8)[:8].encode() + val.ljust(8)[:8].encode()


def _rec_int(name: str, val: int, endian: str) -> bytes:
    return name.ljust(8)[:8].encode() + struct.pack(endian + "i", val) + b"\x00" * 4


def _rec_dbl(name: str, val: float, endian: str) -> bytes:
    return name.ljust(8)[:8].encode() + struct.pack(endian + "d", val)


def write_gsb(
    path: str,
    subgrids: Sequence[dict],
    system_f: str = "LOCAL",
    system_t: str = "WGS84",
    big_endian: bool = False,
) -> None:
    """Write an NTv2 .gsb file. Each sub-grid dict: name, parent (opt),
    s_lat/n_lat/e_long/w_long/lat_inc/long_inc (arc-seconds, lon west-
    positive), lat_shift/lon_shift ((nrows, ncols) arc-second arrays,
    row 0 = south, col 0 = east)."""
    endian = ">" if big_endian else "<"
    out = bytearray()
    out += _rec_int("NUM_OREC", 11, endian)
    out += _rec_int("NUM_SREC", 11, endian)
    out += _rec_int("NUM_FILE", len(subgrids), endian)
    out += _rec_str("GS_TYPE", "SECONDS")
    out += _rec_str("VERSION", "NTv2.0")
    out += _rec_str("SYSTEM_F", system_f)
    out += _rec_str("SYSTEM_T", system_t)
    out += _rec_dbl("MAJOR_F", 6378137.0, endian)
    out += _rec_dbl("MINOR_F", 6356752.314, endian)
    out += _rec_dbl("MAJOR_T", 6378137.0, endian)
    out += _rec_dbl("MINOR_T", 6356752.314, endian)
    for sg in subgrids:
        lat_shift = np.asarray(sg["lat_shift"], dtype=np.float64)
        lon_shift = np.asarray(sg["lon_shift"], dtype=np.float64)
        nrows, ncols = lat_shift.shape
        exp_cols = int(round((sg["w_long"] - sg["e_long"]) / sg["long_inc"])) + 1
        exp_rows = int(round((sg["n_lat"] - sg["s_lat"]) / sg["lat_inc"])) + 1
        if (nrows, ncols) != (exp_rows, exp_cols):
            raise ValueError(
                f"sub-grid {sg.get('name')}: array {nrows}x{ncols} != "
                f"{exp_rows}x{exp_cols} from extents/increments")
        out += _rec_str("SUB_NAME", str(sg["name"]))
        out += _rec_str("PARENT", str(sg.get("parent", "NONE")))
        out += _rec_str("CREATED", "")
        out += _rec_str("UPDATED", "")
        out += _rec_dbl("S_LAT", float(sg["s_lat"]), endian)
        out += _rec_dbl("N_LAT", float(sg["n_lat"]), endian)
        out += _rec_dbl("E_LONG", float(sg["e_long"]), endian)
        out += _rec_dbl("W_LONG", float(sg["w_long"]), endian)
        out += _rec_dbl("LAT_INC", float(sg["lat_inc"]), endian)
        out += _rec_dbl("LONG_INC", float(sg["long_inc"]), endian)
        out += _rec_int("GS_COUNT", nrows * ncols, endian)
        nodes = np.zeros((nrows * ncols, 4), dtype=endian + "f4")
        nodes[:, 0] = lat_shift.reshape(-1).astype(np.float32)
        nodes[:, 1] = lon_shift.reshape(-1).astype(np.float32)
        out += nodes.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(out))


@lru_cache(maxsize=32)
def _grid_cached(path: str, mtime_ns: int) -> Ntv2Grid:
    return read_gsb(path)


def grid_for_path(path: str) -> Optional[Ntv2Grid]:
    """Per-process cached grid load (keyed on path+mtime so executors
    re-read a replaced file); None when the file doesn't exist — callers
    fall back exactly as for any other unresolvable CRS machinery."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    try:
        return _grid_cached(os.path.abspath(path), st.st_mtime_ns)
    except ValueError:
        return None
