"""Exact WGS84 geodesics — the engine behind the *_Spheroid tier
(reference: spatial/src/spatial/geographiclib/functions/*, which delegate
to GeographicLib; algorithms here follow C. F. F. Karney, "Algorithms for
geodesics", J. Geod. 87, 43-55 (2013) — a public algorithm — but evaluate
the geodesic integrals by Gauss-Legendre quadrature instead of truncated
series, so there are no series-order errors).

Formulation (Karney §2, exact relations on the auxiliary sphere):

* reduced latitude  tanβ = (1−f) tanφ;  Clairaut constant sinα0 = sinα cosβ
* sinβ = cosα0 sinσ,  tanω = sinα0 tanσ
* ds/dσ = b·w(σ),                w(σ) = sqrt(1 + k² sin²σ),  k = e' cosα0
* dλ/dσ = dω/dσ − e²·sinα0/((1−f)·w(σ) + 1)

The last identity is exact: dλ/dσ = (1−f)·sinα0·w/(1−cos²α0 sin²σ) and
(1−f)w − 1 = −e²(1−cos²α0 sin²σ)/((1−f)w+1), so the apparent pole
singularity cancels algebraically. The spherical part integrates in closed
form (ω12 via atan2), leaving a smooth bounded correction integrand —
20-node quadrature reaches machine precision.

The inverse problem is solved by monotone bisection of λ12(α1) on (0, π)
in Karney's canonical arrangement (|β1| ≥ |β2|, β1 ≤ 0, λ12 ∈ [0, π]),
vectorized across the whole Arrow batch. Equatorial, meridional, and
antipodal-lune special cases are dispatched closed-form first.

Ellipsoidal polygon area uses Green's theorem with the authalic function
q(φ): A = (a²/2)·∮ q(φ) dλ along the *geodesic* edges (quadrature in ω for
the spherical part, σ for the correction), with a winding correction when
a pole is enclosed.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
_A = WGS84_A
_F = WGS84_F
_B = _A * (1.0 - _F)
_E2 = _F * (2.0 - _F)          # e²
_EP2 = _E2 / (1.0 - _E2)       # e'²
_E = math.sqrt(_E2)

# Gauss-Legendre nodes/weights on [-1, 1]
_GL_X, _GL_W = np.polynomial.legendre.leggauss(20)
_GL_X_A, _GL_W_A = np.polynomial.legendre.leggauss(64)  # area edges

_TINY = 1e-14


def _w2(k2, sinsig):
    return np.sqrt(1.0 + k2 * sinsig * sinsig)


def _lam_correction(k2, sig1, sig2):
    """∫_{σ1}^{σ2} dσ/((1−f)·w(σ)+1), vectorized over rows (k2/sig arrays)."""
    mid = 0.5 * (sig1 + sig2)
    half = 0.5 * (sig2 - sig1)
    # nodes: (n, m)
    sig = mid[:, None] + half[:, None] * _GL_X[None, :]
    integ = 1.0 / ((1.0 - _F) * _w2(k2[:, None], np.sin(sig)) + 1.0)
    return half * (integ @ _GL_W)


def _s_integral(k2, sig1, sig2):
    """b·∫ w(σ) dσ — the geodesic length, vectorized."""
    mid = 0.5 * (sig1 + sig2)
    half = 0.5 * (sig2 - sig1)
    sig = mid[:, None] + half[:, None] * _GL_X[None, :]
    integ = _w2(k2[:, None], np.sin(sig))
    return _B * half * (integ @ _GL_W)


def _lam12(salp1, calp1, sbet1, cbet1, sbet2, cbet2):
    """λ12(α1) and the σ/k² state for the canonical configuration."""
    salp0 = salp1 * cbet1
    calp0 = np.hypot(calp1, salp1 * sbet1)
    # σ1, ω1
    ssig1u, csig1u = sbet1, calp1 * cbet1
    sig1 = np.arctan2(ssig1u, csig1u)
    omg1 = np.arctan2(salp0 * ssig1u, csig1u)
    # α2 (GeographicLib's stable positive form), σ2, ω2. The second term is
    # cbet2² − cbet1² = sbet1² − sbet2²; pick whichever difference is
    # well-conditioned per row (cbet cancels near the equator, sbet near
    # the poles) — without this, c = cosα1 = 0 hits a spurious λ12 spike.
    term = np.where(
        cbet1 < -sbet1,
        (cbet2 - cbet1) * (cbet2 + cbet1),
        (sbet1 - sbet2) * (sbet1 + sbet2),
    )
    calp2 = np.sqrt(np.maximum((calp1 * cbet1) ** 2 + term, 0.0)) / cbet2
    ssig2u, csig2u = sbet2, calp2 * cbet2
    sig2 = np.arctan2(ssig2u, csig2u)
    omg2 = np.arctan2(salp0 * ssig2u, csig2u)
    omg12 = omg2 - omg1
    k2 = _EP2 * calp0 * calp0
    lam12 = omg12 - _E2 * salp0 * _lam_correction(k2, sig1, sig2)
    return lam12, sig1, sig2, k2


def inverse_batch(lat1, lon1, lat2, lon2, iters: int = 70) -> np.ndarray:
    """Geodesic distances (m) on WGS84 for degree arrays. NaN-safe."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    n = len(lat1)
    out = np.full(n, np.nan)

    phi1 = np.radians(lat1)
    phi2 = np.radians(lat2)
    # reduced latitudes (atan2 form is pole-safe)
    bet1 = np.arctan2((1.0 - _F) * np.sin(phi1), np.cos(phi1))
    bet2 = np.arctan2((1.0 - _F) * np.sin(phi2), np.cos(phi2))
    # canonical: point 1 has |β1| ≥ |β2| and β1 ≤ 0
    swap = np.abs(bet1) < np.abs(bet2)
    b1 = np.where(swap, bet2, bet1)
    b2 = np.where(swap, bet1, bet2)
    neg = b1 > 0
    b1 = np.where(neg, -b1, b1)
    b2 = np.where(neg, -b2, b2)
    lam = np.radians(np.remainder(lon2 - lon1, 360.0))
    lam = np.where(lam > np.pi, 2 * np.pi - lam, lam)  # |Δλ| ∈ [0, π]

    sbet1, cbet1 = np.sin(b1), np.maximum(np.cos(b1), _TINY)
    sbet2, cbet2 = np.sin(b2), np.maximum(np.cos(b2), _TINY)

    valid = ~(np.isnan(lam) | np.isnan(b1) | np.isnan(b2))

    # --- equatorial lune: both on the equator (within ~1e-10 rad, i.e.
    # sub-mm — below that the σ↔β relations are ill-conditioned and the
    # equatorial arc is the geodesic to machine precision anyway)
    equat = (
        valid & (np.abs(sbet1) < 1e-10) & (np.abs(sbet2) < 1e-10)
        & (lam <= (1.0 - _F) * np.pi)
    )
    out[equat] = _A * lam[equat]

    # --- meridional (Δλ = 0): along-meridian arc, α0 = 0 ⇒ k² = e'², σ = β
    merid = valid & ~equat & (lam <= _TINY)
    if merid.any():
        k2m = np.full(merid.sum(), _EP2)
        out[merid] = np.abs(_s_integral(k2m, b1[merid], b2[merid]))

    # --- antipodal lune boundary (Δλ = π): over-the-pole meridian
    anti = valid & ~equat & ~merid & (lam >= np.pi - _TINY)
    if anti.any():
        k2m = np.full(anti.sum(), _EP2)
        dsig = np.pi + b1[anti] + b2[anti]  # southern route (β1 ≤ 0)
        out[anti] = np.abs(_s_integral(k2m, b1[anti] - dsig, b1[anti]))

    # --- general: bisection on α1 ∈ (0, π); λ12 monotone in the canonical
    #     arrangement (Karney §4)
    gen = valid & ~equat & ~merid & ~anti
    if gen.any():
        # equatorial start perturbation (GeographicLib's tiny trick)
        sb1 = np.where(sbet1[gen] == 0.0, -_TINY, sbet1[gen])
        cb1 = cbet1[gen]
        sb2, cb2 = sbet2[gen], cbet2[gen]
        tgt = lam[gen]
        # Bisect on c = cosα1, NOT on α1: near-equatorial geodesics put the
        # root at α1 ≈ π/2 where doubles resolve α1 only to ~2e-16 rad but
        # ds/dα1 ~ b·π/β → centimetre-level quantization error; c has
        # essentially unlimited absolute resolution near 0. λ12 decreases
        # monotonically in c (increases in α1).
        clo = np.full(len(tgt), -1.0 + 1e-15)
        chi = np.full(len(tgt), 1.0 - 1e-15)
        for _ in range(iters):
            mid = 0.5 * (clo + chi)
            salp = np.sqrt(np.maximum(0.0, 1.0 - mid * mid))
            l12, *_rest = _lam12(salp, mid, sb1, cb1, sb2, cb2)
            too_small = l12 < tgt  # need larger α1 ⇒ smaller c
            chi = np.where(too_small, mid, chi)
            clo = np.where(too_small, clo, mid)
        c = 0.5 * (clo + chi)
        salp = np.sqrt(np.maximum(0.0, 1.0 - c * c))
        _l, sig1, sig2, k2 = _lam12(salp, c, sb1, cb1, sb2, cb2)
        out[gen] = _s_integral(k2, sig1, sig2)

    # coincident points (avoid -tiny artifacts)
    same = valid & (lat1 == lat2) & (
        np.remainder(lon1 - lon2, 360.0) == 0.0
    )
    out[same] = 0.0
    return out


def inverse(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    return float(inverse_batch(
        np.array([lat1]), np.array([lon1]), np.array([lat2]), np.array([lon2])
    )[0])


# ------------------------------------------------------------------ area

def _authalic_q(sinphi):
    """q(φ) with A_band = (a²/2)·q·Δλ (standard authalic function)."""
    return (1.0 - _E2) * (
        sinphi / (1.0 - _E2 * sinphi * sinphi)
        + np.arctanh(_E * sinphi) / _E
    )


_Q_POLE = float(_authalic_q(np.array([1.0]))[0])


def _edge_area_terms(lat1, lon1, lat2, lon2) -> Tuple[float, float]:
    """(∮-contribution, Δλ) of one geodesic edge for Green's theorem:
    ∫ q(φ) dλ = ∫ q dω  −  e² sinα0 ∫ q/((1−f)w+1) dσ.
    The ω-part is integrated in ω (smooth there); the correction in σ."""
    # scalar inverse solve to get α1 (re-run the bisection for this edge)
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    bet1 = math.atan2((1 - _F) * math.sin(phi1), math.cos(phi1))
    bet2 = math.atan2((1 - _F) * math.sin(phi2), math.cos(phi2))
    dlon = math.radians(lon2 - lon1)
    # normalize to (-π, π]
    dlon = math.remainder(dlon, 2 * math.pi)
    if abs(dlon) < 1e-15:
        return 0.0, dlon  # meridional edge: dλ = 0 everywhere
    sgn = 1.0 if dlon > 0 else -1.0
    lamt = abs(dlon)

    # canonical arrangement bookkeeping (swap restores the same edge value
    # because the line integral only depends on the path and direction)
    swapped = abs(bet1) < abs(bet2)
    b1, b2 = (bet2, bet1) if swapped else (bet1, bet2)
    negged = b1 > 0
    if negged:
        b1, b2 = -b1, -b2
    sb1 = math.sin(b1) if math.sin(b1) != 0.0 else -_TINY
    cb1 = max(math.cos(b1), _TINY)
    sb2, cb2 = math.sin(b2), max(math.cos(b2), _TINY)

    sb1a = np.array([sb1]); cb1a = np.array([cb1])
    sb2a = np.array([sb2]); cb2a = np.array([cb2])
    clo, chi = -1.0 + 1e-15, 1.0 - 1e-15  # bisect on cosα1 (see inverse_batch)
    for _ in range(70):
        mid = 0.5 * (clo + chi)
        l12 = _lam12(np.array([math.sqrt(max(0.0, 1 - mid * mid))]),
                     np.array([mid]), sb1a, cb1a, sb2a, cb2a)[0][0]
        if l12 < lamt:
            chi = mid
        else:
            clo = mid
    calp1 = 0.5 * (clo + chi)
    salp1 = math.sqrt(max(0.0, 1 - calp1 * calp1))
    salp0 = salp1 * cb1
    calp0 = math.hypot(calp1, salp1 * sb1)
    k2 = _EP2 * calp0 * calp0
    sig1 = math.atan2(sb1, calp1 * cb1)
    omg1 = math.atan2(salp0 * sb1, calp1 * cb1)
    # same condition-selected identity as _lam12: cbet difference near the
    # poles, sbet difference near the equator (cures cosα1=0 ill-conditioning
    # in ring_area just as it does in the inverse solve)
    term = (
        (cb2 - cb1) * (cb2 + cb1)
        if cb1 < -sb1
        else (sb1 - sb2) * (sb1 + sb2)
    )
    calp2 = math.sqrt(max((calp1 * cb1) ** 2 + term, 0.0)) / cb2
    sig2 = math.atan2(sb2, calp2 * cb2)
    omg2 = math.atan2(salp0 * sb2, calp2 * cb2)

    # φ(σ): sinβ = cosα0 sinσ → sinφ = sinβ/sqrt(...) (inverse of reduced)
    def sinphi_of_sinbeta(sinbeta):
        return sinbeta / np.sqrt(1.0 - _E2 * (1.0 - sinbeta * sinbeta))

    # part 1: ∫ q dω, nodes in ω; σ(ω): tanσ = tanω/sinα0
    mid_o = 0.5 * (omg1 + omg2)
    half_o = 0.5 * (omg2 - omg1)
    om = mid_o + half_o * _GL_X_A
    so, co = np.sin(om), np.cos(om)
    # sinσ = sinω / sqrt(sin²ω + sinα0² cos²ω)
    denom = np.sqrt(so * so + (salp0 * co) ** 2)
    sinsig = np.where(denom > 0, so / np.maximum(denom, 1e-300), 0.0)
    sinbeta = calp0 * sinsig
    q1 = _authalic_q(sinphi_of_sinbeta(sinbeta))
    part1 = half_o * float(q1 @ _GL_W_A)

    # part 2: −e² sinα0 ∫ q/((1−f)w+1) dσ, nodes in σ
    mid_s = 0.5 * (sig1 + sig2)
    half_s = 0.5 * (sig2 - sig1)
    sg = mid_s + half_s * _GL_X_A
    ss = np.sin(sg)
    q2 = _authalic_q(sinphi_of_sinbeta(calp0 * ss))
    w = np.sqrt(1.0 + k2 * ss * ss)
    part2 = _E2 * salp0 * half_s * float((q2 / ((1.0 - _F) * w + 1.0)) @ _GL_W_A)

    val = part1 - part2
    # undo canonicalization: negating latitudes flips q's sign and the swap
    # reverses traversal; both flip the signed contribution
    if negged:
        val = -val
    if swapped:
        val = -val
    return sgn * val, dlon


def ring_area(lonlat: np.ndarray) -> float:
    """Unsigned ellipsoidal area of a closed ring (n, 2) of lon/lat degrees
    with geodesic edges. Pole-enclosing rings get the winding correction."""
    total = 0.0
    wind = 0.0
    m = len(lonlat)
    for i in range(m - 1):
        lon1, lat1 = float(lonlat[i, 0]), float(lonlat[i, 1])
        lon2, lat2 = float(lonlat[i + 1, 0]), float(lonlat[i + 1, 1])
        v, dl = _edge_area_terms(lat1, lon1, lat2, lon2)
        total += v
        wind += dl
    w = round(wind / (2 * math.pi))
    if w != 0:
        # enclosed pole (w>0 ⇒ north, w<0 ⇒ south): Stokes on the cylinder
        # misses the polar cap. q at the enclosed pole is ±_Q_POLE, and
        # w·q(enclosed) = |w|·_Q_POLE for both poles, so:
        total = w * 2 * math.pi * (_Q_POLE if w > 0 else -_Q_POLE) - total
    return abs(total) * _A * _A / 2.0
