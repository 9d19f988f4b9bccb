"""Native CRS projection engine — the PROJ tier (reference:
spatial/src/spatial/proj/functions.cpp, which embeds PROJ + its EPSG db).

This engine implements the projection *math* natively (vectorized NumPy over
(n,2) lon/lat or x/y arrays) for the projected-CRS families that cover the
overwhelming share of real usage:

* geographic lon/lat (EPSG:4326 and friends)
* spherical Web Mercator (EPSG:3857)
* ellipsoidal Transverse Mercator via the Krüger n-series to n⁶
  (Karney 2011, "Transverse Mercator with an accuracy of a few nanometers")
  → every UTM zone (EPSG:326xx / 327xx, ETRS89 EPSG:258xx) and arbitrary
  TM definitions
* Lambert Conformal Conic 2SP (Snyder 1987, formulas 15-1…15-11)
  → e.g. EPSG:2154 (RGF93 / Lambert-93)
* Albers Equal-Area Conic (Snyder 14-1…14-11) → e.g. EPSG:5070 (NAD83 /
  Conus Albers)

Datum model: WGS84/GRS80-class datums (ETRS89, NAD83) are treated as
coincident (their ellipsoids differ by <0.1 mm in flattening). CRS on other
datums carry a 7-parameter Helmert position-vector transformation to WGS84
(EPSG method 9606) applied through geodetic↔ECEF conversion — this covers
OSGB36 (EPSG:4277 / British National Grid EPSG:27700, single-Helmert
accuracy ~2-3 m vs the OSTN grid) and ED50 (EPSG:4230, 23028-23038).
Grid-shift (NTv2/NADCON) transformations remain out of scope; those CRS
fall back to pyproj when available.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import numpy as np

# ----------------------------------------------------------------- ellipsoids

WGS84 = (6378137.0, 1.0 / 298.257223563)
GRS80 = (6378137.0, 1.0 / 298.257222101)
AIRY1830 = (6377563.396, 1.0 / 299.3249646)
INTL1924 = (6378388.0, 1.0 / 297.0)  # International (Hayford), ED50


# ----------------------------------------------------- datum shifts (Helmert)

@dataclass(frozen=True)
class Datum:
    """A non-WGS84 geodetic datum: its ellipsoid plus the 7-parameter
    Helmert position-vector transformation (EPSG method 9606) FROM this
    datum TO WGS84. Rotations in arc-seconds, scale in ppm."""

    a: float
    f: float
    tx: float = 0.0
    ty: float = 0.0
    tz: float = 0.0
    rx_as: float = 0.0
    ry_as: float = 0.0
    rz_as: float = 0.0
    s_ppm: float = 0.0


# OSGB36 → WGS84: inverse of the published WGS84→OSGB36 set in OS's
# "A guide to coordinate systems in Great Britain" (6.6)
OSGB36 = Datum(*AIRY1830, tx=446.448, ty=-125.157, tz=542.060,
               rx_as=0.1502, ry_as=0.2470, rz_as=0.8421, s_ppm=-20.4894)
# ED50 → WGS84 mean-European 3-parameter shift (EPSG:1311-class)
ED50 = Datum(*INTL1924, tx=-87.0, ty=-98.0, tz=-121.0)


def _geodetic_to_ecef(lonlat: np.ndarray, a: float, f: float) -> np.ndarray:
    e2 = f * (2.0 - f)
    lam = np.radians(lonlat[:, 0])
    phi = np.radians(lonlat[:, 1])
    s, c = np.sin(phi), np.cos(phi)
    N = a / np.sqrt(1.0 - e2 * s * s)
    return np.stack([N * c * np.cos(lam), N * c * np.sin(lam),
                     N * (1.0 - e2) * s], axis=1)


def _ecef_to_geodetic(xyz: np.ndarray, a: float, f: float) -> np.ndarray:
    # Bowring's method with two refinement iterations (sub-mm at h≈0)
    e2 = f * (2.0 - f)
    b = a * (1.0 - f)
    ep2 = (a * a - b * b) / (b * b)
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    p = np.hypot(x, y)
    theta = np.arctan2(z * a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(theta) ** 3,
                     p - e2 * a * np.cos(theta) ** 3)
    for _ in range(2):
        s = np.sin(phi)
        N = a / np.sqrt(1.0 - e2 * s * s)
        phi = np.arctan2(z + e2 * N * s, p)
    return np.stack([np.degrees(np.arctan2(y, x)), np.degrees(phi)], axis=1)


def _helmert(xyz: np.ndarray, d: Datum, inverse: bool = False) -> np.ndarray:
    asr = math.pi / (180.0 * 3600.0)
    rx, ry, rz = d.rx_as * asr, d.ry_as * asr, d.rz_as * asr
    s = 1.0 + d.s_ppm * 1e-6
    t = np.array([d.tx, d.ty, d.tz])
    # position-vector rotation matrix (small-angle exact form)
    R = np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
    if not inverse:
        return (s * (xyz @ R.T)) + t
    return ((xyz - t) / s) @ np.linalg.inv(R).T


class DatumShifted:
    """Wrap a projection defined on a non-WGS84 datum so that its
    forward/inverse interchange coordinates as WGS84 lon/lat — the
    composition contract of native_transform."""

    def __init__(self, proj, datum: Datum):
        self._proj = proj
        self._datum = datum

    def forward(self, lonlat_wgs84: np.ndarray) -> np.ndarray:
        d = self._datum
        ecef = _geodetic_to_ecef(lonlat_wgs84, *WGS84)
        local = _ecef_to_geodetic(_helmert(ecef, d, inverse=True), d.a, d.f)
        return self._proj.forward(local)

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        d = self._datum
        local = self._proj.inverse(xy)
        ecef = _helmert(_geodetic_to_ecef(local, d.a, d.f), d)
        return _ecef_to_geodetic(ecef, *WGS84)


class UnitScaled:
    """Wrap a projection whose published axis unit is not the metre
    (+units=ft/us-ft/km or +to_meter): forward divides the metre result by
    ``to_meter`` AFTER false offsets, inverse multiplies before — exactly
    PROJ's convention (+x_0/+y_0 stay metres)."""

    def __init__(self, proj, to_meter: float):
        self._proj = proj
        self._to_meter = float(to_meter)

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        return self._proj.forward(lonlat) / self._to_meter

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        return self._proj.inverse(np.asarray(xy, dtype=np.float64)
                                  * self._to_meter)


class GridShifted:
    """Wrap a projection defined on a grid-shifted datum (+nadgrids NTv2):
    the grid maps the CRS's local geodetic coordinates (SYSTEM_F) to the
    WGS84-class frame (SYSTEM_T), so the wgs84→local leg of ``forward`` is
    the grid's inverse shift and the local→wgs84 leg of ``inverse`` is its
    forward shift — the grid analog of DatumShifted's Helmert legs."""

    def __init__(self, proj, grid):
        self._proj = proj
        self._grid = grid

    def forward(self, lonlat_wgs84: np.ndarray) -> np.ndarray:
        return self._proj.forward(self._grid.shift_inverse(lonlat_wgs84))

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        return self._grid.shift(self._proj.inverse(xy))


# ------------------------------------------------------- conformal latitude

def _conformal_tau(phi: np.ndarray, e: float) -> np.ndarray:
    """tan(conformal latitude) from geodetic latitude (radians).
    arctanh(±1) at the exact poles is a well-defined ±inf → sinh gives
    ±inf, the correct pole limit — suppress only the noisy warning."""
    s = np.sin(phi)
    with np.errstate(divide="ignore"):
        return np.sinh(np.arctanh(s) - e * np.arctanh(e * s))


def _inv_conformal(tau_p: np.ndarray, e: float) -> np.ndarray:
    """Geodetic latitude (radians) from tan(conformal latitude) — fixed-point
    iteration on the isometric latitude, vectorized (converges to 1e-14 rad
    in ≤6 rounds for |phi| ≤ 89.9°)."""
    psi = np.arcsinh(tau_p)
    phi = 2.0 * np.arctan(np.exp(psi)) - math.pi / 2.0
    for _ in range(8):
        s = np.sin(phi)
        phi_new = 2.0 * np.arctan(np.exp(psi + e * np.arctanh(e * s))) - math.pi / 2.0
        if np.max(np.abs(phi_new - phi)) < 1e-14:
            phi = phi_new
            break
        phi = phi_new
    return phi


# ------------------------------------------- Transverse Mercator (Krüger n⁶)

def _kruger_coeffs(n: float) -> Tuple[np.ndarray, np.ndarray, float]:
    """alpha (fwd), beta (inv) series coefficients and the rectifying radius
    factor A/a for third-flattening n (Karney 2011 eqs. 12/35/36)."""
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    alpha = np.array([
        n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
        + 7891 * n6 / 37800,
        13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
        - 1983433 * n6 / 1935360,
        61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
        49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
        34729 * n5 / 80640 - 3418889 * n6 / 1995840,
        212378941 * n6 / 319334400,
    ])
    beta = np.array([
        n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
        + 96199 * n6 / 604800,
        n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
        17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
        4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
        4583 * n5 / 161280 - 108847 * n6 / 3991680,
        20648693 * n6 / 638668800,
    ])
    a_factor = (1 + n2 / 4 + n4 / 64 + n6 / 256) / (1 + n)
    return alpha, beta, a_factor


@dataclass(frozen=True)
class TransverseMercator:
    a: float
    f: float
    lon0_deg: float
    k0: float
    false_e: float
    false_n: float

    def _setup(self):
        n = self.f / (2.0 - self.f)
        alpha, beta, a_factor = _kruger_coeffs(n)
        A = self.a * a_factor
        e = math.sqrt(self.f * (2.0 - self.f))
        return alpha, beta, A, e

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        alpha, beta, A, e = self._setup()
        lam = np.radians(lonlat[:, 0] - self.lon0_deg)
        phi = np.radians(lonlat[:, 1])
        tau = _conformal_tau(phi, e)
        h = np.hypot(tau, np.cos(lam))
        xi_p = np.arctan2(tau, np.cos(lam))
        eta_p = np.arcsinh(np.sin(lam) / h)
        j = np.arange(1, 7)[:, None]
        xi = xi_p + (alpha[:, None] * np.sin(2 * j * xi_p[None, :])
                     * np.cosh(2 * j * eta_p[None, :])).sum(axis=0)
        eta = eta_p + (alpha[:, None] * np.cos(2 * j * xi_p[None, :])
                       * np.sinh(2 * j * eta_p[None, :])).sum(axis=0)
        out = lonlat.copy()
        out[:, 0] = self.false_e + self.k0 * A * eta
        out[:, 1] = self.false_n + self.k0 * A * xi
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        alpha, beta, A, e = self._setup()
        xi = (xy[:, 1] - self.false_n) / (self.k0 * A)
        eta = (xy[:, 0] - self.false_e) / (self.k0 * A)
        j = np.arange(1, 7)[:, None]
        xi_p = xi - (beta[:, None] * np.sin(2 * j * xi[None, :])
                     * np.cosh(2 * j * eta[None, :])).sum(axis=0)
        eta_p = eta - (beta[:, None] * np.cos(2 * j * xi[None, :])
                       * np.sinh(2 * j * eta[None, :])).sum(axis=0)
        tau_p = np.sin(xi_p) / np.hypot(np.sinh(eta_p), np.cos(xi_p))
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        phi = _inv_conformal(tau_p, e)
        out = xy.copy()
        out[:, 0] = self.lon0_deg + np.degrees(lam)
        out[:, 1] = np.degrees(phi)
        return out


# -------------------------------------------- Lambert Conformal Conic (2SP)

@dataclass(frozen=True)
class LambertConformal2SP:
    a: float
    f: float
    lat1_deg: float
    lat2_deg: float
    lat0_deg: float
    lon0_deg: float
    false_e: float
    false_n: float
    k0: float = 1.0   # 1SP scale factor (Snyder 15-x: rho = a k0 F t^n)

    def _setup(self):
        e = math.sqrt(self.f * (2.0 - self.f))

        def m(phi):
            return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

        def t(phi):
            s = math.sin(phi)
            return math.tan(math.pi / 4 - phi / 2) / (
                (1 - e * s) / (1 + e * s)) ** (e / 2)

        p1, p2 = math.radians(self.lat1_deg), math.radians(self.lat2_deg)
        p0 = math.radians(self.lat0_deg)
        m1, m2 = m(p1), m(p2)
        t1, t2, t0 = t(p1), t(p2), t(p0)
        if abs(p1 - p2) > 1e-12:
            nn = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        else:
            nn = math.sin(p1)
        F_ = self.k0 * m1 / (nn * t1 ** nn)
        rho0 = self.a * F_ * t0 ** nn
        return e, nn, F_, rho0

    def _t_arr(self, phi: np.ndarray, e: float) -> np.ndarray:
        s = np.sin(phi)
        return np.tan(math.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e, nn, F_, rho0 = self._setup()
        phi = np.radians(lonlat[:, 1])
        theta = nn * np.radians(lonlat[:, 0] - self.lon0_deg)
        rho = self.a * F_ * self._t_arr(phi, e) ** nn
        out = lonlat.copy()
        out[:, 0] = self.false_e + rho * np.sin(theta)
        out[:, 1] = self.false_n + rho0 - rho * np.cos(theta)
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e, nn, F_, rho0 = self._setup()
        x = xy[:, 0] - self.false_e
        y = rho0 - (xy[:, 1] - self.false_n)
        rho = np.sign(nn) * np.hypot(x, y)
        theta = np.arctan2(np.sign(nn) * x, np.sign(nn) * y)
        tt = (rho / (self.a * F_)) ** (1.0 / nn)
        # invert t(phi): phi = pi/2 − 2 atan(t·((1−e sinφ)/(1+e sinφ))^{e/2})
        phi = math.pi / 2 - 2.0 * np.arctan(tt)
        for _ in range(8):
            s = np.sin(phi)
            phi_new = math.pi / 2 - 2.0 * np.arctan(
                tt * ((1 - e * s) / (1 + e * s)) ** (e / 2))
            if np.max(np.abs(phi_new - phi)) < 1e-14:
                phi = phi_new
                break
            phi = phi_new
        out = xy.copy()
        out[:, 0] = self.lon0_deg + np.degrees(theta / nn)
        out[:, 1] = np.degrees(phi)
        return out


# ------------------------------------------------- Albers Equal-Area Conic

@dataclass(frozen=True)
class AlbersEqualArea:
    a: float
    f: float
    lat1_deg: float
    lat2_deg: float
    lat0_deg: float
    lon0_deg: float
    false_e: float
    false_n: float

    def _setup(self):
        e = math.sqrt(self.f * (2.0 - self.f))
        e2 = e * e

        def m(phi):
            return math.cos(phi) / math.sqrt(1 - e2 * math.sin(phi) ** 2)

        def q(phi):
            s = math.sin(phi)
            return (1 - e2) * (s / (1 - e2 * s * s)
                               - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))

        p1, p2 = math.radians(self.lat1_deg), math.radians(self.lat2_deg)
        p0 = math.radians(self.lat0_deg)
        m1, m2 = m(p1), m(p2)
        q1, q2, q0 = q(p1), q(p2), q(p0)
        nn = (m1 * m1 - m2 * m2) / (q2 - q1)
        C = m1 * m1 + nn * q1
        rho0 = self.a * math.sqrt(C - nn * q0) / nn
        return e, nn, C, rho0

    def _q_arr(self, phi: np.ndarray, e: float) -> np.ndarray:
        e2 = e * e
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e, nn, C, rho0 = self._setup()
        phi = np.radians(lonlat[:, 1])
        theta = nn * np.radians(lonlat[:, 0] - self.lon0_deg)
        rho = self.a * np.sqrt(C - nn * self._q_arr(phi, e)) / nn
        out = lonlat.copy()
        out[:, 0] = self.false_e + rho * np.sin(theta)
        out[:, 1] = self.false_n + rho0 - rho * np.cos(theta)
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e, nn, C, rho0 = self._setup()
        e2 = e * e
        x = xy[:, 0] - self.false_e
        y = rho0 - (xy[:, 1] - self.false_n)
        # Snyder p.101: when n is negative (both standard parallels in the
        # southern hemisphere) the signs of x, ρ0−y and ρ reverse before
        # the arctan — without this the inverse lands ~2·lon0 away
        sgn = 1.0 if nn >= 0 else -1.0
        rho = sgn * np.hypot(x, y)
        theta = np.arctan2(sgn * x, sgn * y)
        qq = (C - (rho * nn / self.a) ** 2) / nn
        # invert q(phi) by Newton (Snyder 3-16)
        phi = np.arcsin(np.clip(qq / 2.0, -1.0, 1.0))
        for _ in range(10):
            s = np.sin(phi)
            den = 1 - e2 * s * s
            f_val = self._q_arr(phi, e) - qq
            f_der = (1 - e2) * np.cos(phi) / (den * den) * 2.0
            step = f_val / np.where(np.abs(f_der) < 1e-300, 1e-300, f_der)
            phi = phi - step
            if np.max(np.abs(step)) < 1e-14:
                break
        out = xy.copy()
        out[:, 0] = self.lon0_deg + np.degrees(theta / nn)
        out[:, 1] = np.degrees(phi)
        return out


# ----------------------------- Mollweide & Equal Earth (equal-area)

def _authalic_setup(a: float, f: float):
    """(R_authalic, to_authalic(phi), from_authalic(beta)) — the sphere
    with the ellipsoid's area and the latitude mapping that preserves
    area (Snyder 3-11…3-13)."""
    if f == 0.0:
        ident = lambda x: x  # noqa: E731
        return a, ident, ident
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def q_of(phi):
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           + np.arctanh(e * s) / e)

    qp = float(q_of(np.array([math.pi / 2]))[0])
    R = a * math.sqrt(qp / 2.0)

    def to_auth(phi):
        return np.arcsin(np.clip(q_of(phi) / qp, -1.0, 1.0))

    def from_auth(beta):
        # Newton on q(phi) = qp sin(beta)
        target = qp * np.sin(beta)
        phi = np.asarray(beta, dtype=np.float64).copy()
        for _ in range(8):
            s = np.sin(phi)
            fv = q_of(phi) - target
            fd = 2 * (1 - e2) * np.cos(phi) / (1 - e2 * s * s) ** 2
            step = fv / np.maximum(fd, 1e-300)
            phi = phi - step
            if np.max(np.abs(step)) < 1e-15:
                break
        return phi

    return R, to_auth, from_auth


@dataclass(frozen=True)
class Mollweide:
    """Mollweide (Snyder ch.31) on the authalic sphere — equal-area."""

    a: float
    f: float
    lon0_deg: float
    false_e: float
    false_n: float

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        R, to_auth, _ = _authalic_setup(self.a, self.f)
        beta = to_auth(np.radians(lonlat[:, 1]))
        # 2θ + sin2θ = π sinβ (Newton, quadratic convergence)
        theta = beta.copy()
        target = math.pi * np.sin(beta)
        for _ in range(12):
            step = ((2 * theta + np.sin(2 * theta) - target)
                    / np.maximum(2 + 2 * np.cos(2 * theta), 1e-12))
            theta = theta - step
            if np.max(np.abs(step)) < 1e-15:
                break
        out = lonlat.copy()
        out[:, 0] = (self.false_e + 2 * math.sqrt(2) / math.pi * R
                     * np.radians(lonlat[:, 0] - self.lon0_deg)
                     * np.cos(theta))
        out[:, 1] = self.false_n + math.sqrt(2) * R * np.sin(theta)
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        R, _, from_auth = _authalic_setup(self.a, self.f)
        theta = np.arcsin(np.clip(
            (xy[:, 1] - self.false_n) / (math.sqrt(2) * R), -1.0, 1.0))
        beta = np.arcsin(np.clip(
            (2 * theta + np.sin(2 * theta)) / math.pi, -1.0, 1.0))
        out = xy.copy()
        out[:, 0] = self.lon0_deg + np.degrees(
            math.pi * (xy[:, 0] - self.false_e)
            / (2 * math.sqrt(2) * R * np.maximum(np.cos(theta), 1e-12)))
        out[:, 1] = np.degrees(from_auth(beta))
        return out


# Equal Earth polynomial coefficients (Šavrič, Patterson & Jenny 2018)
_EE_A1, _EE_A2, _EE_A3, _EE_A4 = 1.340264, -0.081106, 0.000893, 0.003796
_EE_M = math.sqrt(3) / 2.0


@dataclass(frozen=True)
class EqualEarth:
    """Equal Earth (EPSG:8857, method 1078) on the authalic sphere."""

    a: float
    f: float
    lon0_deg: float
    false_e: float
    false_n: float

    @staticmethod
    def _ybar(theta):
        t2 = theta * theta
        return theta * (_EE_A1 + _EE_A2 * t2
                        + t2 ** 3 * (_EE_A3 + _EE_A4 * t2))

    @staticmethod
    def _dybar(theta):
        t2 = theta * theta
        return (_EE_A1 + 3 * _EE_A2 * t2
                + t2 ** 3 * (7 * _EE_A3 + 9 * _EE_A4 * t2))

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        R, to_auth, _ = _authalic_setup(self.a, self.f)
        beta = to_auth(np.radians(lonlat[:, 1]))
        theta = np.arcsin(_EE_M * np.sin(beta))
        out = lonlat.copy()
        out[:, 0] = (self.false_e
                     + R * np.radians(lonlat[:, 0] - self.lon0_deg)
                     * np.cos(theta) / (_EE_M * self._dybar(theta)))
        out[:, 1] = self.false_n + R * self._ybar(theta)
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        R, _, from_auth = _authalic_setup(self.a, self.f)
        yb = (xy[:, 1] - self.false_n) / R
        theta = yb / _EE_A1  # good start; Newton to machine precision
        for _ in range(12):
            step = (self._ybar(theta) - yb) / self._dybar(theta)
            theta = theta - step
            if np.max(np.abs(step)) < 1e-15:
                break
        beta = np.arcsin(np.clip(np.sin(theta) / _EE_M, -1.0, 1.0))
        out = xy.copy()
        out[:, 0] = self.lon0_deg + np.degrees(
            (xy[:, 0] - self.false_e) * _EE_M * self._dybar(theta)
            / (R * np.maximum(np.cos(theta), 1e-12)))
        out[:, 1] = np.degrees(from_auth(beta))
        return out


# -------------------- Equidistant Cylindrical & Sinusoidal

def _merid_coeffs(f: float):
    """Meridian-arc series: M(phi) = a_fact*a*(mu) via the Krüger
    rectifying-latitude machinery (alpha fwd / beta inv coefficients)."""
    n = f / (2.0 - f)
    alpha, beta, a_factor = _kruger_coeffs(n)
    return alpha, beta, a_factor


def _merid_arc(phi: np.ndarray, a: float, f: float) -> np.ndarray:
    """Ellipsoidal meridian distance from the equator (Karney's
    rectifying-latitude series — same coefficients as the TM engine)."""
    alpha, _beta, a_factor = _merid_coeffs(f)
    A = a * a_factor
    mu = phi.copy().astype(np.float64)
    # rectifying latitude: mu = phi - sum(c_j sin(2j phi)) with the
    # inverse-series relation; use conformal-free direct series:
    # M(phi)/A = phi + sum_j alpha-like terms — derive via quadrature-free
    # classic series (Snyder 3-21) for robustness instead:
    e2 = f * (2 - f)
    e4, e6 = e2 * e2, e2 ** 3
    M = a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * mu
             - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * mu)
             + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * mu)
             - (35 * e6 / 3072) * np.sin(6 * mu))
    _ = A
    return M


def _inv_merid_arc(M: np.ndarray, a: float, f: float) -> np.ndarray:
    """phi from meridian distance (Snyder 3-26 footpoint series)."""
    e2 = f * (2 - f)
    e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    mu = M / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 ** 3 / 256))
    phi = (mu
           + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
           + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
           + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
           + (1097 * e1 ** 4 / 512) * np.sin(8 * mu))
    # two Newton steps on the exact arc (series alone leaves ~3e-9°)
    for _ in range(2):
        s = np.sin(phi)
        mp = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        phi = phi - (_merid_arc(phi, a, f) - M) / mp
    return phi


@dataclass(frozen=True)
class EquidistantCylindrical:
    """Equidistant Cylindrical / Plate Carrée (EPSG method 1028/1029,
    Snyder ch.12): x = nu1·cos(lat_ts)·dlam, y = meridian arc."""

    a: float
    f: float
    lat_ts_deg: float
    lon0_deg: float
    false_e: float
    false_n: float

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e2 = self.f * (2 - self.f)
        p1 = math.radians(self.lat_ts_deg)
        nu1cos = self.a * math.cos(p1) / math.sqrt(
            1 - e2 * math.sin(p1) ** 2)
        out = lonlat.copy()
        out[:, 0] = self.false_e + nu1cos * np.radians(
            lonlat[:, 0] - self.lon0_deg)
        out[:, 1] = self.false_n + _merid_arc(
            np.radians(lonlat[:, 1]), self.a, self.f)
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e2 = self.f * (2 - self.f)
        p1 = math.radians(self.lat_ts_deg)
        nu1cos = self.a * math.cos(p1) / math.sqrt(
            1 - e2 * math.sin(p1) ** 2)
        out = xy.copy()
        out[:, 0] = self.lon0_deg + np.degrees(
            (xy[:, 0] - self.false_e) / nu1cos)
        out[:, 1] = np.degrees(_inv_merid_arc(
            xy[:, 1] - self.false_n, self.a, self.f))
        return out


@dataclass(frozen=True)
class Sinusoidal:
    """Sinusoidal (Sanson–Flamsteed; Snyder ch.30) — equal-area; the
    spherical form on R=6371007.181 is the MODIS tiling grid."""

    a: float
    f: float
    lon0_deg: float
    false_e: float
    false_n: float

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        phi = np.radians(lonlat[:, 1])
        out = lonlat.copy()
        if self.f == 0.0:
            out[:, 0] = (self.false_e + self.a * np.radians(
                lonlat[:, 0] - self.lon0_deg) * np.cos(phi))
            out[:, 1] = self.false_n + self.a * phi
            return out
        e2 = self.f * (2 - self.f)
        out[:, 0] = (self.false_e
                     + self.a * np.cos(phi) * np.radians(
                         lonlat[:, 0] - self.lon0_deg)
                     / np.sqrt(1 - e2 * np.sin(phi) ** 2))
        out[:, 1] = self.false_n + _merid_arc(phi, self.a, self.f)
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        out = xy.copy()
        if self.f == 0.0:
            phi = (xy[:, 1] - self.false_n) / self.a
            out[:, 0] = self.lon0_deg + np.degrees(
                (xy[:, 0] - self.false_e)
                / (self.a * np.maximum(np.cos(phi), 1e-12)))
            out[:, 1] = np.degrees(phi)
            return out
        e2 = self.f * (2 - self.f)
        phi = _inv_merid_arc(xy[:, 1] - self.false_n, self.a, self.f)
        out[:, 0] = self.lon0_deg + np.degrees(
            (xy[:, 0] - self.false_e) * np.sqrt(1 - e2 * np.sin(phi) ** 2)
            / (self.a * np.maximum(np.cos(phi), 1e-12)))
        out[:, 1] = np.degrees(phi)
        return out


# ------------------------------ Hotine Oblique Mercator (omerc)

@dataclass(frozen=True)
class HotineObliqueMercator:
    """Hotine Oblique Mercator (EPSG methods 9812 'variant A' and 9815
    'variant B'; Snyder 9-x): aposphere-based oblique cylinder defined by
    a center (lat_c, lon_c), azimuth alpha_c and rectified grid angle
    gamma_c. ``no_uoff=True`` is variant A (natural-origin false
    coordinates); False is variant B (false coordinates at the center).
    Validated against the EPSG Guidance Note worked example (Timbalai
    1948 / RSO Borneo)."""

    a: float
    f: float
    latc_deg: float
    lonc_deg: float
    alpha_deg: float
    gamma_deg: float
    k0: float
    false_e: float
    false_n: float
    no_uoff: bool = False

    def _setup(self):
        e2 = self.f * (2.0 - self.f)
        e = math.sqrt(e2)
        phic = math.radians(self.latc_deg)
        lamc = math.radians(self.lonc_deg)
        alphac = math.radians(self.alpha_deg)
        gammac = math.radians(self.gamma_deg)
        B = math.sqrt(1 + e2 * math.cos(phic) ** 4 / (1 - e2))
        A = self.a * B * self.k0 * math.sqrt(1 - e2) / (
            1 - e2 * math.sin(phic) ** 2)
        t0 = math.tan(math.pi / 4 - phic / 2) / (
            (1 - e * math.sin(phic)) / (1 + e * math.sin(phic))) ** (e / 2)
        D = B * math.sqrt(1 - e2) / (
            math.cos(phic) * math.sqrt(1 - e2 * math.sin(phic) ** 2))
        D2 = max(D * D, 1.0)
        sgn = math.copysign(1.0, phic) if phic != 0 else 1.0
        Fc = D + math.sqrt(D2 - 1.0) * sgn
        H = Fc * t0 ** B
        G = (Fc - 1.0 / Fc) / 2.0
        gamma0 = math.asin(math.sin(alphac) / D)
        lam0 = lamc - math.asin(G * math.tan(gamma0)) / B
        uc = 0.0
        if not self.no_uoff:
            uc = (A / B) * math.atan2(math.sqrt(D2 - 1.0),
                                      math.cos(alphac)) * sgn
        return e, A, B, H, gamma0, gammac, lam0, uc, sgn

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e, A, B, H, gamma0, gammac, lam0, uc, sgn = self._setup()
        phi = np.radians(lonlat[:, 1])
        lam = np.radians(lonlat[:, 0])
        sp = np.sin(phi)
        t = np.tan(math.pi / 4 - phi / 2) / (
            (1 - e * sp) / (1 + e * sp)) ** (e / 2)
        Q = H / t ** B
        S = (Q - 1.0 / Q) / 2.0
        T = (Q + 1.0 / Q) / 2.0
        V = np.sin(B * (lam - lam0))
        U = (-V * math.cos(gamma0) + S * math.sin(gamma0)) / T
        v = A * np.log((1 - U) / (1 + U)) / (2.0 * B)
        u = (A * np.arctan2(S * math.cos(gamma0) + V * math.sin(gamma0),
                            np.cos(B * (lam - lam0))) / B) - abs(uc) * sgn
        out = lonlat.copy()
        out[:, 0] = v * math.cos(gammac) + u * math.sin(gammac) + self.false_e
        out[:, 1] = u * math.cos(gammac) - v * math.sin(gammac) + self.false_n
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e, A, B, H, gamma0, gammac, lam0, uc, sgn = self._setup()
        e2 = self.f * (2.0 - self.f)
        vp = ((xy[:, 0] - self.false_e) * math.cos(gammac)
              - (xy[:, 1] - self.false_n) * math.sin(gammac))
        up = ((xy[:, 1] - self.false_n) * math.cos(gammac)
              + (xy[:, 0] - self.false_e) * math.sin(gammac)) + abs(uc) * sgn
        Qp = np.exp(-B * vp / A)
        Sp = (Qp - 1.0 / Qp) / 2.0
        Tp = (Qp + 1.0 / Qp) / 2.0
        Vp = np.sin(B * up / A)
        Up = (Vp * math.cos(gamma0) + Sp * math.sin(gamma0)) / Tp
        tp = (H / np.sqrt((1 + Up) / (1 - Up))) ** (1.0 / B)
        # invert t(phi) as in LCC
        phi = math.pi / 2 - 2.0 * np.arctan(tp)
        for _ in range(10):
            spv = np.sin(phi)
            phi_new = math.pi / 2 - 2.0 * np.arctan(
                tp * ((1 - e * spv) / (1 + e * spv)) ** (e / 2))
            if np.max(np.abs(phi_new - phi)) < 1e-14:
                phi = phi_new
                break
            phi = phi_new
        lam = lam0 - np.arctan2(Sp * math.cos(gamma0) - Vp * math.sin(gamma0),
                                np.cos(B * up / A)) / B
        out = xy.copy()
        out[:, 0] = np.degrees(lam)
        out[:, 1] = np.degrees(phi)
        _ = e2
        return out


# --------------------------------- Swiss Oblique Mercator (somerc)

@dataclass(frozen=True)
class SwissObliqueMercator:
    """Swiss Oblique Mercator (EPSG method 9814; swisstopo's published
    formulas): Gauss conformal sphere at the origin, rotation of the
    origin to the pseudo-equator, then spherical Mercator. CH1903/LV03
    (EPSG:21781) and CH1903+/LV95 (EPSG:2056)."""

    a: float
    f: float
    lat0_deg: float
    lon0_deg: float
    k0: float
    false_e: float
    false_n: float

    def _setup(self):
        e2 = self.f * (2.0 - self.f)
        e = math.sqrt(e2)
        p0 = math.radians(self.lat0_deg)
        s0 = math.sin(p0)
        R = self.a * math.sqrt(1 - e2) / (1 - e2 * s0 * s0) * self.k0
        alpha = math.sqrt(1 + e2 / (1 - e2) * math.cos(p0) ** 4)
        b0 = math.asin(s0 / alpha)

        def q_ell(phi):
            sp = math.sin(phi)
            return math.log(math.tan(math.pi / 4 + phi / 2)
                            * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))

        K = math.log(math.tan(math.pi / 4 + b0 / 2)) - alpha * q_ell(p0)
        return e, e2, R, alpha, b0, K

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e, e2, R, alpha, b0, K = self._setup()
        phi = np.radians(lonlat[:, 1])
        sp = np.sin(phi)
        S = alpha * np.log(np.tan(math.pi / 4 + phi / 2)
                           * ((1 - e * sp) / (1 + e * sp)) ** (e / 2)) + K
        b = 2.0 * (np.arctan(np.exp(S)) - math.pi / 4)
        l = alpha * np.radians(lonlat[:, 0] - self.lon0_deg)
        sb, cb = np.sin(b), np.cos(b)
        sbb = math.cos(b0) * sb - math.sin(b0) * cb * np.cos(l)
        lbar = np.arctan2(cb * np.sin(l),
                          math.sin(b0) * sb + math.cos(b0) * cb * np.cos(l))
        out = lonlat.copy()
        out[:, 0] = self.false_e + R * lbar
        out[:, 1] = self.false_n + R / 2.0 * np.log((1 + sbb) / (1 - sbb))
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e, e2, R, alpha, b0, K = self._setup()
        lbar = (xy[:, 0] - self.false_e) / R
        xbar = (xy[:, 1] - self.false_n) / R
        bbar = 2.0 * (np.arctan(np.exp(xbar)) - math.pi / 4)
        sb = math.cos(b0) * np.sin(bbar) + math.sin(b0) * np.cos(bbar) * np.cos(lbar)
        b = np.arcsin(sb)
        l = np.arctan2(np.cos(bbar) * np.sin(lbar),
                       math.cos(b0) * np.cos(bbar) * np.cos(lbar)
                       - math.sin(b0) * np.sin(bbar))
        lam = np.degrees(l / alpha) + self.lon0_deg
        # invert the Gauss mapping: S known from b, iterate phi
        S = np.log(np.tan(math.pi / 4 + b / 2))
        psi = (S - K) / alpha        # ellipsoidal isometric latitude
        phi = 2.0 * np.arctan(np.exp(psi)) - math.pi / 2
        for _ in range(12):
            spv = np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + math.pi / 4)
                           * ((1 - e * spv) / (1 + e * spv)) ** (e / 2))
            dphi = (psi - psi_i) * np.cos(phi) * (1 - e2 * spv * spv) / (1 - e2)
            phi = phi + dphi
            if np.max(np.abs(dphi)) < 1e-14:
                break
        out = xy.copy()
        out[:, 0] = lam
        out[:, 1] = np.degrees(phi)
        return out


# ------------------------------------- Oblique Stereographic (double)

@dataclass(frozen=True)
class ObliqueStereographic:
    """Oblique Stereographic via the conformal sphere (EPSG method 9809,
    Guidance Note 7-2 — the "double stereographic" used by Dutch RD New,
    EPSG:28992)."""

    a: float
    f: float
    lat0_deg: float
    lon0_deg: float
    k0: float
    false_e: float
    false_n: float

    def _setup(self):
        e2 = self.f * (2.0 - self.f)
        e = math.sqrt(e2)
        p0 = math.radians(self.lat0_deg)
        s0 = math.sin(p0)
        rho0 = self.a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
        nu0 = self.a / math.sqrt(1 - e2 * s0 * s0)
        R = math.sqrt(rho0 * nu0)
        n = math.sqrt(1 + e2 * math.cos(p0) ** 4 / (1 - e2))
        S1 = (1 + s0) / (1 - s0)
        S2 = (1 - e * s0) / (1 + e * s0)
        w1 = (S1 * S2 ** e) ** n
        sin_chi00 = (w1 - 1) / (w1 + 1)
        c = ((n + s0) * (1 - sin_chi00)) / ((n - s0) * (1 + sin_chi00))
        w2 = c * w1
        chi0 = math.asin((w2 - 1) / (w2 + 1))
        lam0 = math.radians(self.lon0_deg)
        return e, e2, R, n, c, chi0, lam0

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e, e2, R, n, c, chi0, lam0 = self._setup()
        phi = np.radians(lonlat[:, 1])
        lam = np.radians(lonlat[:, 0])
        Lam = n * (lam - lam0) + lam0
        sp = np.sin(phi)
        Sa = (1 + sp) / (1 - sp)
        Sb = (1 - e * sp) / (1 + e * sp)
        w = c * (Sa * Sb ** e) ** n
        chi = np.arcsin((w - 1) / (w + 1))
        dl = Lam - lam0
        B = 1 + np.sin(chi) * math.sin(chi0) + np.cos(chi) * math.cos(chi0) * np.cos(dl)
        out = lonlat.copy()
        out[:, 0] = self.false_e + 2 * R * self.k0 * np.cos(chi) * np.sin(dl) / B
        out[:, 1] = self.false_n + 2 * R * self.k0 * (
            np.sin(chi) * math.cos(chi0)
            - np.cos(chi) * math.sin(chi0) * np.cos(dl)) / B
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e, e2, R, n, c, chi0, lam0 = self._setup()
        Ep = xy[:, 0] - self.false_e
        Np = xy[:, 1] - self.false_n
        g = 2 * R * self.k0 * math.tan(math.pi / 4 - chi0 / 2)
        hh = 4 * R * self.k0 * math.tan(chi0) + g
        i = np.arctan2(Ep, hh + Np)
        j = np.arctan2(Ep, g - Np) - i
        chi = chi0 + 2 * np.arctan2(Np - Ep * np.tan(j / 2), 2 * R * self.k0)
        Lam = j + 2 * i + lam0
        lam = (Lam - lam0) / n + lam0
        # isometric latitude on the ellipsoid from the conformal latitude
        psi = 0.5 * np.log((1 + np.sin(chi)) / (c * (1 - np.sin(chi)))) / n
        phi = 2.0 * np.arctan(np.exp(psi)) - math.pi / 2
        for _ in range(12):
            sp = np.sin(phi)
            psi_i = np.log(np.tan(phi / 2 + math.pi / 4)
                           * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
            dphi = (psi - psi_i) * np.cos(phi) * (1 - e2 * sp * sp) / (1 - e2)
            phi = phi + dphi
            if np.max(np.abs(dphi)) < 1e-14:
                break
        out = xy.copy()
        out[:, 0] = np.degrees(lam)
        out[:, 1] = np.degrees(phi)
        return out


# ----------------------------------------------- Polar Stereographic

@dataclass(frozen=True)
class PolarStereographic:
    """Polar Stereographic, ellipsoidal (Snyder 21-30…21-40; EPSG method
    9810 variant A via k0, variant B via lat_ts)."""

    a: float
    f: float
    south: bool
    lon0_deg: float
    k0: float = 1.0            # variant A scale at the pole
    lat_ts_deg: Optional[float] = None   # variant B standard parallel
    false_e: float = 0.0
    false_n: float = 0.0

    def _setup(self):
        e = math.sqrt(self.f * (2.0 - self.f))

        def t_of(phi):
            sp = math.sin(phi)
            return math.tan(math.pi / 4 - phi / 2) * (
                (1 + e * sp) / (1 - e * sp)) ** (e / 2)

        # lat_ts = ±90 degenerates (m1/t1 → 0/0) and is equivalent to the
        # k0 form — route it to variant A
        if self.lat_ts_deg is not None and abs(self.lat_ts_deg) < 90.0 - 1e-9:
            p1 = abs(math.radians(self.lat_ts_deg))
            m1 = math.cos(p1) / math.sqrt(1 - (e * math.sin(p1)) ** 2)
            rho_fac = self.a * m1 / t_of(p1)     # rho = rho_fac · t
        else:
            rho_fac = (2.0 * self.a * self.k0
                       / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e)))
        return e, rho_fac

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e, rho_fac = self._setup()
        sign = -1.0 if self.south else 1.0
        # work in the north-pole aspect: mirror latitudes/longitudes south
        phi = sign * np.radians(lonlat[:, 1])
        lam = sign * np.radians(lonlat[:, 0] - self.lon0_deg)
        sp = np.sin(phi)
        t = np.tan(math.pi / 4 - phi / 2) * (
            (1 + e * sp) / (1 - e * sp)) ** (e / 2)
        rho = rho_fac * t
        out = lonlat.copy()
        out[:, 0] = self.false_e + sign * rho * np.sin(lam)
        out[:, 1] = self.false_n - sign * rho * np.cos(lam)
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e, rho_fac = self._setup()
        sign = -1.0 if self.south else 1.0
        x = sign * (xy[:, 0] - self.false_e)
        y = -sign * (xy[:, 1] - self.false_n)
        rho = np.hypot(x, y)
        tp = rho / rho_fac
        phi = math.pi / 2 - 2.0 * np.arctan(tp)
        for _ in range(10):
            sp = np.sin(phi)
            phi_new = math.pi / 2 - 2.0 * np.arctan(
                tp * ((1 - e * sp) / (1 + e * sp)) ** (e / 2))
            if np.max(np.abs(phi_new - phi)) < 1e-14:
                phi = phi_new
                break
            phi = phi_new
        lam = np.arctan2(x, y)
        out = xy.copy()
        out[:, 0] = self.lon0_deg + sign * np.degrees(lam)
        out[:, 1] = sign * np.degrees(phi)
        return out


# ------------------------------------- Lambert Azimuthal Equal-Area (oblique)

@dataclass(frozen=True)
class LambertAzimuthalEqualArea:
    """Ellipsoidal oblique LAEA (Snyder 1987, 24-2…24-16 / inverse 24-16…).
    e.g. EPSG:3035 (ETRS89-extended / LAEA Europe)."""

    a: float
    f: float
    lat0_deg: float
    lon0_deg: float
    false_e: float
    false_n: float

    def _setup(self):
        e = math.sqrt(self.f * (2.0 - self.f))
        e2 = e * e

        def q_of(phi):
            s = math.sin(phi)
            return (1 - e2) * (s / (1 - e2 * s * s)
                               - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))

        phi0 = math.radians(self.lat0_deg)
        qp = q_of(math.pi / 2)
        q0 = q_of(phi0)
        beta1 = math.asin(q0 / qp)
        Rq = self.a * math.sqrt(qp / 2.0)
        m1 = math.cos(phi0) / math.sqrt(1 - e2 * math.sin(phi0) ** 2)
        D = self.a * m1 / (Rq * math.cos(beta1))
        return e, e2, qp, beta1, Rq, D

    def _q_arr(self, phi: np.ndarray, e: float) -> np.ndarray:
        e2 = e * e
        s = np.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s)))

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        e, _e2, qp, beta1, Rq, D = self._setup()
        lam = np.radians(lonlat[:, 0] - self.lon0_deg)
        phi = np.radians(lonlat[:, 1])
        beta = np.arcsin(np.clip(self._q_arr(phi, e) / qp, -1.0, 1.0))
        sb1, cb1 = math.sin(beta1), math.cos(beta1)
        B = Rq * np.sqrt(2.0 / (1.0 + sb1 * np.sin(beta)
                                + cb1 * np.cos(beta) * np.cos(lam)))
        out = lonlat.copy()
        out[:, 0] = self.false_e + B * D * np.cos(beta) * np.sin(lam)
        out[:, 1] = self.false_n + (B / D) * (cb1 * np.sin(beta)
                                              - sb1 * np.cos(beta) * np.cos(lam))
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        e, e2, qp, beta1, Rq, D = self._setup()
        sb1, cb1 = math.sin(beta1), math.cos(beta1)
        x = (xy[:, 0] - self.false_e) / D
        y = (xy[:, 1] - self.false_n) * D
        rho = np.hypot(x, y)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * Rq), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        with np.errstate(invalid="ignore", divide="ignore"):
            qq = qp * (cce * sb1 + np.where(rho == 0, 0.0, y * sce * cb1 / rho))
            lam = np.arctan2(x * sce, rho * cb1 * cce - y * sb1 * sce)
        # invert q(phi) by Newton (same scheme as Albers)
        phi = np.arcsin(np.clip(qq / 2.0, -1.0, 1.0))
        for _ in range(10):
            s = np.sin(phi)
            den = 1 - e2 * s * s
            f_val = self._q_arr(phi, e) - qq
            f_der = (1 - e2) * np.cos(phi) / (den * den) * 2.0
            step = f_val / np.where(np.abs(f_der) < 1e-300, 1e-300, f_der)
            phi = phi - step
            if np.max(np.abs(step)) < 1e-14:
                break
        out = xy.copy()
        out[:, 0] = self.lon0_deg + np.degrees(lam)
        out[:, 1] = np.degrees(phi)
        return out


# ------------------------------------------------------------ CRS registry

class _LonLat:
    def forward(self, arr: np.ndarray) -> np.ndarray:  # lonlat → lonlat
        return arr

    def inverse(self, arr: np.ndarray) -> np.ndarray:
        return arr


class _WebMercator:
    R = 6378137.0

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        out = lonlat.copy()
        out[:, 0] = np.radians(lonlat[:, 0]) * self.R
        out[:, 1] = self.R * np.log(np.tan(np.pi / 4 + np.radians(lonlat[:, 1]) / 2))
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        out = xy.copy()
        out[:, 0] = np.degrees(xy[:, 0] / self.R)
        out[:, 1] = np.degrees(2 * np.arctan(np.exp(xy[:, 1] / self.R)) - np.pi / 2)
        return out


class MercatorEllipsoidal:
    """Ellipsoidal Mercator (EPSG:3395 "World Mercator" semantics — what
    PROJ's +proj=merc means on an ellipsoid; the spherical form is the
    special case e = 0):

        x = a·k0·(λ − λ0)
        y = a·k0·ln( tan(π/4 + φ/2) · ((1 − e·sinφ)/(1 + e·sinφ))^{e/2} )

    Inverse solves the isometric-latitude relation by fixed point
    φ ← π/2 − 2·atan(exp(−ψ)·((1−e sinφ)/(1+e sinφ))^{e/2}), which
    converges to machine precision in <10 iterations everywhere |φ|<89.9°.
    +lat_ts support: k0 = cos(φts)/sqrt(1 − e²·sin²φts)."""

    def __init__(self, a: float, f: float, lon0_deg: float = 0.0,
                 k0: float = 1.0, lat_ts_deg: float = 0.0,
                 false_e: float = 0.0, false_n: float = 0.0):
        self.a, self.f = a, f
        self.e2 = f * (2.0 - f)
        self.e = math.sqrt(self.e2)
        if lat_ts_deg:
            ts = math.radians(lat_ts_deg)
            k0 = math.cos(ts) / math.sqrt(1.0 - self.e2 * math.sin(ts) ** 2)
        self.k0 = k0
        self.lon0 = lon0_deg
        self.fe, self.fn = false_e, false_n

    def forward(self, lonlat: np.ndarray) -> np.ndarray:
        out = np.empty_like(lonlat, dtype=np.float64)
        lat = np.clip(lonlat[:, 1], -89.9999999, 89.9999999)
        phi = np.radians(lat)
        sp = self.e * np.sin(phi)
        out[:, 0] = self.a * self.k0 * np.radians(lonlat[:, 0] - self.lon0) + self.fe
        out[:, 1] = self.a * self.k0 * (
            np.log(np.tan(np.pi / 4 + phi / 2))
            + 0.5 * self.e * np.log((1.0 - sp) / (1.0 + sp))
        ) + self.fn
        return out

    def inverse(self, xy: np.ndarray) -> np.ndarray:
        out = np.empty_like(xy, dtype=np.float64)
        out[:, 0] = np.degrees((xy[:, 0] - self.fe) / (self.a * self.k0)) + self.lon0
        psi = (xy[:, 1] - self.fn) / (self.a * self.k0)
        t = np.exp(-psi)
        phi = np.pi / 2 - 2.0 * np.arctan(t)
        for _ in range(12):
            sp = self.e * np.sin(phi)
            phi = np.pi / 2 - 2.0 * np.arctan(
                t * ((1.0 - sp) / (1.0 + sp)) ** (self.e / 2.0)
            )
        out[:, 1] = np.degrees(phi)
        return out


def tm_with_lat0(a: float, f: float, lat0_deg: float, lon0_deg: float,
                 k0: float, false_e: float, false_n: float) -> TransverseMercator:
    """TM with a non-equatorial latitude of origin: fold the meridian
    distance M(lat0) into the false northing (N = FN + k0·(M(φ)−M(φ0)),
    with M evaluated by the same Krüger series the projection uses)."""
    n = f / (2.0 - f)
    alpha, _beta, a_factor = _kruger_coeffs(n)
    A = a * a_factor
    e = math.sqrt(f * (2.0 - f))
    phi0 = math.radians(lat0_deg)
    tau0 = _conformal_tau(np.array([phi0]), e)[0]
    xi_p0 = math.atan2(tau0, 1.0)
    xi0 = xi_p0 + sum(alpha[j - 1] * math.sin(2 * j * xi_p0) for j in range(1, 7))
    m0 = A * xi0
    return TransverseMercator(a, f, lon0_deg=lon0_deg, k0=k0,
                              false_e=false_e, false_n=false_n - k0 * m0)


def _crs_for_epsg(code: int):
    """Projection object for an EPSG code, or None when not native."""
    if code in (4326, 4258, 4269):  # WGS84 / ETRS89 / NAD83 geographic
        return _LonLat()
    if code == 3857:
        return _WebMercator()
    if 32601 <= code <= 32660:  # WGS 84 / UTM N
        zone = code - 32600
        return TransverseMercator(*WGS84, lon0_deg=6 * zone - 183, k0=0.9996,
                                  false_e=500000.0, false_n=0.0)
    if 32701 <= code <= 32760:  # WGS 84 / UTM S
        zone = code - 32700
        return TransverseMercator(*WGS84, lon0_deg=6 * zone - 183, k0=0.9996,
                                  false_e=500000.0, false_n=10000000.0)
    if 25828 <= code <= 25838:  # ETRS89 / UTM N
        zone = code - 25800
        return TransverseMercator(*GRS80, lon0_deg=6 * zone - 183, k0=0.9996,
                                  false_e=500000.0, false_n=0.0)
    if 26901 <= code <= 26923:  # NAD83 / UTM N
        zone = code - 26900
        return TransverseMercator(*GRS80, lon0_deg=6 * zone - 183, k0=0.9996,
                                  false_e=500000.0, false_n=0.0)
    if code == 2154:  # RGF93 / Lambert-93
        return LambertConformal2SP(*GRS80, lat1_deg=49.0, lat2_deg=44.0,
                                   lat0_deg=46.5, lon0_deg=3.0,
                                   false_e=700000.0, false_n=6600000.0)
    if code == 5070:  # NAD83 / Conus Albers
        return AlbersEqualArea(*GRS80, lat1_deg=29.5, lat2_deg=45.5,
                               lat0_deg=23.0, lon0_deg=-96.0,
                               false_e=0.0, false_n=0.0)
    if code == 27700:  # OSGB36 / British National Grid (Helmert datum shift)
        return DatumShifted(
            tm_with_lat0(*AIRY1830, lat0_deg=49.0, lon0_deg=-2.0,
                         k0=0.9996012717, false_e=400000.0, false_n=-100000.0),
            OSGB36,
        )
    if code == 4277:  # OSGB36 geographic
        return DatumShifted(_LonLat(), OSGB36)
    if code == 4230:  # ED50 geographic
        return DatumShifted(_LonLat(), ED50)
    if 23028 <= code <= 23038:  # ED50 / UTM N
        zone = code - 23000
        return DatumShifted(
            TransverseMercator(*INTL1924, lon0_deg=6 * zone - 183, k0=0.9996,
                               false_e=500000.0, false_n=0.0),
            ED50,
        )
    if code == 3035:  # ETRS89-extended / LAEA Europe
        return LambertAzimuthalEqualArea(*GRS80, lat0_deg=52.0, lon0_deg=10.0,
                                         false_e=4321000.0, false_n=3210000.0)
    s = _EPSG_PROJ.get(code)
    if s is not None:
        return crs_from_proj_string(s)
    return None


# ESRI authority codes (the reference's own docs/example.md reprojects taxi
# rides through 'ESRI:102718'; its GDAL binding resolves the ESRI registry)
_ESRI_PROJ = {
    102718: 2263,     # NAD83 / New York Long Island (ftUS) — example.md
    102100: 3857,     # WGS 1984 Web Mercator (Auxiliary Sphere)
    102113: 3857,     # legacy Web Mercator id
    102039: 5070,     # USA Contiguous Albers (USGS version, NAD83)
    102003: ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=37.5 +lon_0=-96 "
             "+x_0=0 +y_0=0 +ellps=GRS80"),  # USA Contiguous Albers (ESRI)
}


def _crs_for_esri(code: int):
    v = _ESRI_PROJ.get(code)
    if v is None:
        return None
    if isinstance(v, int):
        return _crs_for_epsg(v)
    return crs_from_proj_string(v)


# EPSG → PROJ-string registry for codes whose projection family the native
# engine implements (tmerc/lcc/aea/laea/merc + optional Helmert shift).
# Parameter values are the public EPSG registry definitions (the reference
# gets them from PROJ's embedded db, proj/functions.cpp:487-513); here they
# are table-driven onto the same native engines crs_from_proj_string uses.
_EPSG_PROJ = {
    # world / polar
    3395: "+proj=merc +ellps=WGS84",                       # World Mercator
    8857: ("+proj=eqearth +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84"),
    4087: ("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 "
           "+ellps=WGS84"),            # WGS 84 / World Equidistant Cylindrical
    32662: ("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 "
            "+ellps=WGS84"),           # WGS 84 / Plate Carree (deprecated id)
    32661: ("+proj=stere +lat_0=90 +lat_ts=90 +lon_0=0 +k=0.994 "
            "+x_0=2000000 +y_0=2000000 +ellps=WGS84"),     # UPS North
    32761: ("+proj=stere +lat_0=-90 +lat_ts=-90 +lon_0=0 +k=0.994 "
            "+x_0=2000000 +y_0=2000000 +ellps=WGS84"),     # UPS South
    3413: ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
           "+ellps=WGS84"),                # NSIDC Sea Ice Polar Stereo North
    3976: ("+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 +x_0=0 +y_0=0 "
           "+ellps=WGS84"),                # NSIDC Sea Ice Polar Stereo South
    3031: ("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
           "+ellps=WGS84"),                # Antarctic Polar Stereographic
    # Europe
    3034: ("+proj=lcc +lat_1=35 +lat_2=65 +lat_0=52 +lon_0=10 "
           "+x_0=4000000 +y_0=2800000 +ellps=GRS80"),      # ETRS89 / LCC Europe
    2180: ("+proj=tmerc +lat_0=0 +lon_0=19 +k=0.9993 +x_0=500000 "
           "+y_0=-5300000 +ellps=GRS80"),                  # ETRS89 / Poland CS92
    2157: ("+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=0.99982 +x_0=600000 "
           "+y_0=750000 +ellps=GRS80"),                    # IRENET95 / Irish TM
    # Timbalai 1948 / RSO Borneo (m) — the EPSG guidance-note example CRS
    29873: ("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
            "+gamma=53.13010236111111 +k_0=0.99984 +x_0=590476.87 "
            "+y_0=442857.65 +a=6377298.556 +rf=300.8017 "
            "+towgs84=-679,669,-48,0,0,0,0"),
    # NAD83 / Alaska zone 1 (Hotine variant A: natural-origin offsets)
    26931: ("+proj=omerc +lat_0=57 +lonc=-133.6666666666667 "
            "+alpha=323.1301023611111 +gamma=323.1301023611111 +k_0=0.9999 "
            "+x_0=5000000 +y_0=-5000000 +no_uoff +ellps=GRS80"),
    21781: ("+proj=somerc +lat_0=46.95240555555556 "
            "+lon_0=7.439583333333333 +k_0=1 +x_0=600000 +y_0=200000 "
            "+ellps=bessel +towgs84=674.374,15.056,405.346,0,0,0,0"),
    2056: ("+proj=somerc +lat_0=46.95240555555556 "
           "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 "
           "+ellps=bessel +towgs84=674.374,15.056,405.346,0,0,0,0"),
    28992: ("+proj=sterea +lat_0=52.15616055555555 "
            "+lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 "
            "+ellps=bessel +towgs84=565.417,50.3319,465.552,-0.398957,"
            "0.343988,-1.8774,4.0725"),    # Amersfoort / RD New
    # NTF (Paris) / Lambert zones — 1SP LCC with k_0 on the Paris meridian
    27571: ("+proj=lcc +lat_1=49.5 +lat_0=49.5 +lon_0=0 +k_0=0.999877341 "
            "+x_0=600000 +y_0=1200000 +a=6378249.2 +b=6356515 "
            "+towgs84=-168,-60,320,0,0,0,0 +pm=paris"),    # Lambert zone I
    27572: ("+proj=lcc +lat_1=46.8 +lat_0=46.8 +lon_0=0 +k_0=0.99987742 "
            "+x_0=600000 +y_0=2200000 +a=6378249.2 +b=6356515 "
            "+towgs84=-168,-60,320,0,0,0,0 +pm=paris"),    # Lambert zone II
    27573: ("+proj=lcc +lat_1=44.1 +lat_0=44.1 +lon_0=0 +k_0=0.999877499 "
            "+x_0=600000 +y_0=3200000 +a=6378249.2 +b=6356515 "
            "+towgs84=-168,-60,320,0,0,0,0 +pm=paris"),    # Lambert zone III
    31467: ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 "
            "+ellps=bessel "
            "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7"),  # DHDN / GK z3
    31287: ("+proj=lcc +lat_1=49 +lat_2=46 +lat_0=47.5 "
            "+lon_0=13.33333333333333 +x_0=400000 +y_0=400000 +ellps=bessel "
            "+towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232"),
    31370: ("+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 +lat_0=90 "
            "+lon_0=4.367486666666666 +x_0=150000.013 +y_0=5400088.438 "
            "+ellps=intl +towgs84=-106.8686,52.2978,-103.7239,0.3366,"
            "-0.457,1.8422,-1.2747"),                      # Belgian Lambert 72
    # Americas
    3310: ("+proj=aea +lat_1=34 +lat_2=40.5 +lat_0=0 +lon_0=-120 "
           "+x_0=0 +y_0=-4000000 +ellps=GRS80"),           # California Albers
    26985: ("+proj=lcc +lat_1=39.45 +lat_2=38.3 +lat_0=37.66666666666666 "
            "+lon_0=-77 +x_0=400000 +y_0=0 +ellps=GRS80"),  # SP Maryland
    32118: ("+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666 "
            "+lat_0=40.16666666666666 +lon_0=-74 +x_0=300000 +y_0=0 "
            "+ellps=GRS80"),                               # SP NY Long Island
    # same LCC in US survey feet (x_0 stays metres per PROJ convention)
    2263: ("+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666 "
           "+lat_0=40.16666666666666 +lon_0=-74 +x_0=300000.0000000001 "
           "+y_0=0 +ellps=GRS80 +units=us-ft"),    # SP NY Long Island (ftUS)
    32139: ("+proj=lcc +lat_1=31.88333333333333 +lat_2=30.11666666666667 "
            "+lat_0=29.66666666666667 +lon_0=-100.3333333333333 "
            "+x_0=700000 +y_0=3000000 +ellps=GRS80"),      # SP Texas Central
    3347: ("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=63.390675 "
           "+lon_0=-91.86666666666666 +x_0=6200000 +y_0=3000000 "
           "+ellps=GRS80"),                                # StatsCan Lambert
    3978: ("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 "
           "+x_0=0 +y_0=0 +ellps=GRS80"),                  # Canada Atlas Lambert
    31983: "+proj=utm +zone=23 +south +ellps=GRS80",       # SIRGAS 2000 / 23S
    # Asia-Pacific
    2193: ("+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
           "+y_0=10000000 +ellps=GRS80"),                  # NZTM2000
    3112: ("+proj=lcc +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=134 "
           "+x_0=0 +y_0=0 +ellps=GRS80"),                  # GDA94 / GA Lambert
    3577: ("+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 "
           "+x_0=0 +y_0=0 +ellps=GRS80"),                  # Australian Albers
    5179: ("+proj=tmerc +lat_0=38 +lon_0=127.5 +k=0.9996 +x_0=1000000 "
           "+y_0=2000000 +ellps=GRS80"),                   # Korea 2000 Unified
    6677: ("+proj=tmerc +lat_0=36 +lon_0=139.8333333333333 +k=0.9999 "
           "+x_0=0 +y_0=0 +ellps=GRS80"),                  # JGD2011 zone IX
}


# named prime meridians (public PROJ registry, degrees east of Greenwich)
_PM_NAMED = {
    "greenwich": 0.0, "paris": 2.33722917, "lisbon": -9.13190611,
    "bogota": -74.08091667, "madrid": -3.687938889, "rome": 12.45233333,
    "bern": 7.439583333, "jakarta": 106.8077194, "ferro": -17.66666666667,
    "brussels": 4.367975, "stockholm": 18.05827778, "athens": 23.7163375,
    "oslo": 10.72291667,
}


class _LonLatShift:
    """Geographic CRS on a non-Greenwich prime meridian: stored longitudes
    are PM-relative; forward/inverse shift to/from Greenwich."""

    def __init__(self, pm: float):
        self.pm = pm

    def forward(self, lonlat):
        out = lonlat.copy()
        out[:, 0] = lonlat[:, 0] - self.pm
        return out

    def inverse(self, lonlat):
        out = lonlat.copy()
        out[:, 0] = lonlat[:, 0] + self.pm
        return out


# proj-string ellipsoid registry (public PROJ parameter values)
_ELLPS = {
    "WGS84": WGS84,
    "GRS80": GRS80,
    "AIRY": AIRY1830,
    "INTL": INTL1924,
    "CLRK66": (6378206.4, 1.0 / 294.9786982),
    "CLRK80": (6378249.145, 1.0 / 293.465),
    "CLRK80IGN": (6378249.2, 1.0 / 293.4660213),
    "BESSEL": (6377397.155, 1.0 / 299.1528128),
    "KRASS": (6378245.0, 1.0 / 298.3),
    "SPHERE": (6370997.0, 0.0),
}


def crs_from_proj_string(s: str):
    """Projection object from a PROJ-style string ('+proj=tmerc +lat_0=…'),
    covering the projection families the native engine implements: longlat,
    merc (spherical web / k0-scaled), utm, tmerc, lcc (1SP via lat_1=lat_0
    and 2SP), aea, laea; ellipsoids from +ellps/+a/+f/+rf; optional
    +towgs84 3/7-parameter Helmert datum shift. Returns None when the
    string needs machinery outside the native registry (grids, other
    projections, units other than metres)."""
    kv: Dict[str, str] = {}
    for tok in s.split():
        tok = tok.lstrip("+")
        if "=" in tok:
            k, v = tok.split("=", 1)
            kv[k.lower()] = v
        elif tok:
            kv[tok.lower()] = ""
    proj = kv.get("proj", "").lower()
    if not proj:
        return None
    # whitelist: any parameter outside the native model (+pm, +axis,
    # +to_meter, +geoidgrids, +alpha, …) means the string needs machinery
    # we don't implement — return None so the caller's pyproj fallback (or
    # explicit error) handles it instead of silently wrong coordinates.
    _KNOWN = {
        "proj", "ellps", "datum", "a", "b", "rf", "f", "es", "k", "k_0",
        "lat_0", "lon_0", "lat_1", "lat_2", "lat_ts", "x_0", "y_0",
        "zone", "south", "north", "towgs84", "units", "no_defs", "nadgrids",
        "wktext", "type", "over", "approx", "pm", "lonc", "alpha", "gamma",
        "no_uoff", "r", "to_meter",
    }
    unknown = set(kv) - _KNOWN
    if unknown:
        return None
    # oblique-Mercator-only parameters are silently-wrong elsewhere
    if proj != "omerc" and {"lonc", "alpha", "gamma", "no_uoff"} & set(kv):
        return None
    # linear units: projected outputs scale by 1/to_meter AFTER the false
    # offsets (PROJ semantics: +x_0/+y_0 are always metres). ftUS is the
    # exact survey foot 1200/3937 m; +to_meter overrides any named unit.
    _UNITS = {"m": 1.0, "meter": 1.0, "metre": 1.0, "ft": 0.3048,
              "us-ft": 1200.0 / 3937.0, "km": 1000.0}
    unit = 1.0
    if proj not in ("longlat", "latlong"):
        uname = kv.get("units", "m").lower()
        if uname not in _UNITS:
            return None
        unit = _UNITS[uname]
        if "to_meter" in kv:
            try:
                unit = float(kv["to_meter"])
            except ValueError:
                return None
        if unit <= 0:
            return None
    # +nadgrids: NTv2 .gsb grids are handled natively (geom/ntv2.py); the
    # value is a comma list of grid files — the first that exists wins
    # (PROJ's search order). Unresolvable grids → None (pyproj fallback),
    # never silently-unshifted output.
    ntv2_grid = None
    if "nadgrids" in kv and kv["nadgrids"] not in ("@null", "null", ""):
        from .ntv2 import grid_for_path

        for cand in kv["nadgrids"].split(","):
            cand = cand.strip().lstrip("@")
            if not cand:
                continue
            ntv2_grid = grid_for_path(cand)
            if ntv2_grid is not None:
                break
        if ntv2_grid is None:
            return None

    # ellipsoid
    if "r" in kv:
        kv = dict(kv)
        kv["a"] = kv.pop("r")
        kv.setdefault("f", "0")
    if "a" in kv:
        a = float(kv["a"])
        if "rf" in kv:
            f = 1.0 / float(kv["rf"])
        elif "f" in kv:
            f = float(kv["f"])
        elif "b" in kv:
            f = (a - float(kv["b"])) / a
        else:
            f = 0.0
    else:
        name = kv.get("ellps", kv.get("datum", "WGS84")).upper()
        if name == "NAD83":
            name = "GRS80"
        if name == "NAD27":
            name = "CLRK66"
        if name == "OSGB36":
            name = "AIRY"
        ell = _ELLPS.get(name)
        if ell is None:
            return None
        a, f = ell

    def fl(key, default=0.0):
        return float(kv.get(key, default))

    lat0, lon0 = fl("lat_0"), fl("lon_0")
    k0 = float(kv.get("k", kv.get("k_0", 1.0)))
    x0, y0 = fl("x_0"), fl("y_0")
    # prime meridian: +pm shifts the central meridian to Greenwich terms
    # (inputs to forward() are always Greenwich lon/lat)
    pm_raw = kv.get("pm", "0")
    pm = _PM_NAMED.get(pm_raw.lower())
    if pm is None:
        try:
            pm = float(pm_raw)
        except ValueError:
            return None
    lon0 += pm

    base = None
    if proj in ("longlat", "latlong", "lonlat"):
        base = _LonLat() if pm == 0.0 else _LonLatShift(pm)
    elif proj == "utm":
        zone = int(kv.get("zone", 0))
        if not 1 <= zone <= 60:
            return None
        south = "south" in kv
        base = TransverseMercator(a, f, lon0_deg=6 * zone - 183, k0=0.9996,
                                  false_e=500000.0,
                                  false_n=10000000.0 if south else 0.0)
    elif proj == "tmerc":
        if lat0 == 0.0:
            base = TransverseMercator(a, f, lon0_deg=lon0, k0=k0,
                                      false_e=x0, false_n=y0)
        else:
            base = tm_with_lat0(a, f, lat0_deg=lat0, lon0_deg=lon0, k0=k0,
                                false_e=x0, false_n=y0)
    elif proj == "webmerc":
        # spherical Mercator on the ellipsoid's a (web-Mercator semantics)
        if k0 != 1.0 or lat0 != 0.0:
            return None
        wm = _WebMercator()
        if a != WGS84[0] or lon0 != 0.0 or x0 != 0.0 or y0 != 0.0:
            class _Merc:
                def forward(self, lonlat):
                    out = np.empty_like(lonlat)
                    out[:, 0] = a * np.radians(lonlat[:, 0] - lon0) + x0
                    lat = np.clip(lonlat[:, 1], -89.9999999, 89.9999999)
                    out[:, 1] = a * np.arctanh(np.sin(np.radians(lat))) + y0
                    return out

                def inverse(self, xy):
                    out = np.empty_like(xy)
                    out[:, 0] = np.degrees((xy[:, 0] - x0) / a) + lon0
                    out[:, 1] = np.degrees(np.arcsin(np.tanh((xy[:, 1] - y0) / a)))
                    return out

            wm = _Merc()
        base = wm
    elif proj == "merc":
        # PROJ's merc on an ellipsoid is ELLIPSOIDAL Mercator (EPSG:3395
        # semantics) — the spherical form is only correct when f == 0, and
        # differs by tens of km in y at high latitudes
        if lat0 != 0.0:
            return None
        base = MercatorEllipsoidal(
            a, f, lon0_deg=lon0, k0=k0, lat_ts_deg=fl("lat_ts"),
            false_e=x0, false_n=y0,
        )
    elif proj == "lcc":
        lat1 = fl("lat_1", lat0)
        lat2 = fl("lat_2", lat1)
        base = LambertConformal2SP(a, f, lat1_deg=lat1, lat2_deg=lat2,
                                   lat0_deg=lat0, lon0_deg=lon0,
                                   false_e=x0, false_n=y0, k0=k0)
    elif proj == "aea":
        base = AlbersEqualArea(a, f, lat1_deg=fl("lat_1"), lat2_deg=fl("lat_2"),
                               lat0_deg=lat0, lon0_deg=lon0,
                               false_e=x0, false_n=y0)
    elif proj == "laea":
        base = LambertAzimuthalEqualArea(a, f, lat0_deg=lat0, lon0_deg=lon0,
                                         false_e=x0, false_n=y0)
    elif proj == "moll":
        base = Mollweide(a, f, lon0_deg=lon0, false_e=x0, false_n=y0)
    elif proj == "eqearth":
        base = EqualEarth(a, f, lon0_deg=lon0, false_e=x0, false_n=y0)
    elif proj == "eqc":
        base = EquidistantCylindrical(a, f, lat_ts_deg=fl("lat_ts"),
                                      lon0_deg=lon0, false_e=x0, false_n=y0)
    elif proj == "sinu":
        base = Sinusoidal(a, f, lon0_deg=lon0, false_e=x0, false_n=y0)
    elif proj == "omerc":
        if "lonc" not in kv or "alpha" not in kv:
            return None
        alpha = float(kv["alpha"])
        gamma = float(kv.get("gamma", alpha))
        base = HotineObliqueMercator(
            a, f, latc_deg=lat0, lonc_deg=float(kv["lonc"]),
            alpha_deg=alpha, gamma_deg=gamma, k0=k0,
            false_e=x0, false_n=y0, no_uoff="no_uoff" in kv)
    elif proj == "somerc":
        base = SwissObliqueMercator(a, f, lat0_deg=lat0, lon0_deg=lon0,
                                    k0=k0, false_e=x0, false_n=y0)
    elif proj == "sterea":
        base = ObliqueStereographic(a, f, lat0_deg=lat0, lon0_deg=lon0,
                                    k0=k0, false_e=x0, false_n=y0)
    elif proj == "stere":
        # polar aspects only (lat_0 = ±90); use +proj=sterea for the
        # double-projection oblique form
        if abs(abs(lat0) - 90.0) > 1e-9:
            return None
        base = PolarStereographic(
            a, f, south=lat0 < 0, lon0_deg=lon0, k0=k0,
            lat_ts_deg=float(kv["lat_ts"]) if "lat_ts" in kv else None,
            false_e=x0, false_n=y0)
    elif proj == "ups":
        base = PolarStereographic(
            a, f, south="south" in kv, lon0_deg=0.0, k0=0.994,
            false_e=2000000.0, false_n=2000000.0)
    else:
        return None

    out = base
    if ntv2_grid is not None:
        # PROJ precedence: an applicable +nadgrids supersedes +towgs84
        out = GridShifted(base, ntv2_grid)
    else:
        tow = kv.get("towgs84")
        if tow:
            p = [float(v) for v in tow.split(",")]
            if len(p) == 3:
                p += [0.0, 0.0, 0.0, 0.0]
            if len(p) != 7:
                return None
            if any(p):
                out = DatumShifted(base, Datum(a, f, *p))
    if unit != 1.0:
        out = UnitScaled(out, unit)
    return out


# EPSG geographic 2D CRS are lat,lon in authority axis order (the
# reference's GDAL-backed ST_Transform is authority-compliant by default,
# test/sql/proj.test). Projected CRS are treated as easting,northing —
# the handful of authority N,E projected frames are NOT modeled; pass
# always_xy=True (the Python-API default) for unambiguous x,y semantics.
_GEOGRAPHIC_EPSG = {4326, 4258, 4269, 4277, 4230}


def authority_is_latlon(crs: str) -> bool:
    su = crs.strip().upper()
    if su.startswith("EPSG:"):
        try:
            return int(su[5:]) in _GEOGRAPHIC_EPSG
        except ValueError:
            return False
    return False


def native_transform(src: str, dst: str,
                     always_xy: bool = True) -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """(n,2)-array transform src→dst via lon/lat, or None when either CRS
    is outside the native registry. CRS strings: 'EPSG:nnnn' or PROJ
    '+proj=…' parameter strings. ``always_xy=False`` applies EPSG
    authority axis order (lat,lon) on geographic CRS, matching the
    reference's default."""

    def parse(s: str):
        st = s.strip()
        if st.startswith("+") or st.lower().startswith("proj="):
            return crs_from_proj_string(st)
        su = st.upper()
        if su.startswith("EPSG:"):
            try:
                return _crs_for_epsg(int(su[5:]))
            except ValueError:
                return None
        if su.startswith("ESRI:"):
            try:
                return _crs_for_esri(int(su[5:]))
            except ValueError:
                return None
        return None

    c_src, c_dst = parse(src), parse(dst)
    if c_src is None or c_dst is None:
        return None

    swap_in = not always_xy and authority_is_latlon(src)
    swap_out = not always_xy and authority_is_latlon(dst)

    def fn(arr: np.ndarray) -> np.ndarray:
        a = arr[:, ::-1] if swap_in else arr
        out = c_dst.forward(c_src.inverse(np.ascontiguousarray(a)))
        return np.ascontiguousarray(out[:, ::-1]) if swap_out else out

    return fn


def list_native_crs():
    """Rows describing every CRS the native engine projects — the analog of
    ST_List_Proj_CRS (proj/functions.cpp lists PROJ's crs db). (auth_name,
    code, name, kind, projection)."""
    rows = [("EPSG", 4326, "WGS 84", "geographic 2D", "lonlat"),
            ("EPSG", 4258, "ETRS89", "geographic 2D", "lonlat"),
            ("EPSG", 4269, "NAD83", "geographic 2D", "lonlat"),
            ("EPSG", 3857, "WGS 84 / Pseudo-Mercator", "projected", "webmerc"),
            ("EPSG", 2154, "RGF93 v1 / Lambert-93", "projected", "lcc"),
            ("EPSG", 5070, "NAD83 / Conus Albers", "projected", "aea")]
    for z in range(1, 61):
        rows.append(("EPSG", 32600 + z, f"WGS 84 / UTM zone {z}N", "projected", "tmerc"))
        rows.append(("EPSG", 32700 + z, f"WGS 84 / UTM zone {z}S", "projected", "tmerc"))
    for z in range(28, 39):
        rows.append(("EPSG", 25800 + z, f"ETRS89 / UTM zone {z}N", "projected", "tmerc"))
    for z in range(1, 24):
        rows.append(("EPSG", 26900 + z, f"NAD83 / UTM zone {z}N", "projected", "tmerc"))
    rows.append(("EPSG", 4277, "OSGB36", "geographic 2D", "lonlat+helmert"))
    rows.append(("EPSG", 27700, "OSGB36 / British National Grid", "projected",
                 "tmerc+helmert"))
    rows.append(("EPSG", 3035, "ETRS89-extended / LAEA Europe", "projected", "laea"))
    rows.append(("EPSG", 4230, "ED50", "geographic 2D", "lonlat+helmert"))
    for z in range(28, 39):
        rows.append(("EPSG", 23000 + z, f"ED50 / UTM zone {z}N", "projected",
                     "tmerc+helmert"))
    _EPSG_NAMES = {
        3395: "WGS 84 / World Mercator", 3034: "ETRS89 / LCC Europe",
        8857: "WGS 84 / Equal Earth Greenwich",
        4087: "WGS 84 / World Equidistant Cylindrical",
        32662: "WGS 84 / Plate Carree",
        32661: "WGS 84 / UPS North", 32761: "WGS 84 / UPS South",
        3413: "NSIDC Sea Ice Polar Stereographic North",
        3976: "NSIDC Sea Ice Polar Stereographic South",
        3031: "WGS 84 / Antarctic Polar Stereographic",
        2180: "ETRS89 / Poland CS92", 2157: "IRENET95 / Irish TM",
        31467: "DHDN / 3-degree Gauss-Kruger zone 3",
        31287: "MGI / Austria Lambert", 31370: "BD72 / Belgian Lambert 72",
        3310: "NAD83 / California Albers", 26985: "NAD83 / Maryland",
        32118: "NAD83 / New York Long Island", 32139: "NAD83 / Texas Central",
        2263: "NAD83 / New York Long Island (ftUS)",
        3347: "NAD83 / Statistics Canada Lambert",
        3978: "NAD83 / Canada Atlas Lambert", 31983: "SIRGAS 2000 / UTM 23S",
        28992: "Amersfoort / RD New",
        21781: "CH1903 / LV03", 2056: "CH1903+ / LV95",
        29873: "Timbalai 1948 / RSO Borneo (m)",
        26931: "NAD83 / Alaska zone 1",
        27571: "NTF (Paris) / Lambert zone I",
        27572: "NTF (Paris) / Lambert zone II",
        27573: "NTF (Paris) / Lambert zone III",
        2193: "NZGD2000 / NZTM2000", 3112: "GDA94 / Geoscience Aus Lambert",
        3577: "GDA94 / Australian Albers", 5179: "Korea 2000 / Unified CS",
        6677: "JGD2011 / Japan Plane Rectangular CS IX",
    }
    for code, pstr in _EPSG_PROJ.items():
        proj = pstr.split("+proj=")[1].split()[0]
        rows.append(("EPSG", code, _EPSG_NAMES.get(code, f"EPSG:{code}"),
                     "projected", proj))
    return rows
