"""CRS handling — pure-numpy reprojection kernels.

The reference reprojects via geopandas/rioxarray (pyproj under the hood)
whenever data and proxy CRS disagree, printing a warning
(disaggregate.py:40-44, 177-181; aggregate.py:45,59,66,86; raster.py:56).
pyproj is not in this environment, so the engine implements the
transforms it needs directly (public formulas):

* EPSG:4326        — WGS84 lon/lat (the identity reference frame here)
* EPSG:3857        — WebMercator (spherical; the standard tiling CRS)
* EPSG:326xx/327xx — UTM zone xx north/south (WGS84 ellipsoid,
                     transverse Mercator via the 6th-order Krüger series
                     — the same series proj uses; sub-micron roundtrip
                     inside a zone).  Also accepts "UTM:33N" spelling.
* EPSG:3035        — ETRS89-extended / LAEA Europe (the reference's EU
                     energy-domain CRS): ellipsoidal Lambert azimuthal
                     equal-area per Snyder (Map Projections — A Working
                     Manual, USGS PP 1395, pp. 187-190), GRS80 ellipsoid,
                     origin 52°N 10°E, FE 4321000, FN 3210000.
* EPSG:3034        — ETRS89-extended / LCC Europe: ellipsoidal Lambert
                     conformal conic, 2 standard parallels (35°N/65°N)
                     per Snyder PP 1395 pp. 107-109, GRS80, origin
                     52°N 10°E, FE 4000000, FN 2800000 — the conic
                     member of the projection families (cylindrical /
                     azimuthal / conic all covered).
* EPSG:4258        — ETRS89 lon/lat, treated as coincident with WGS84
                     (datum delta is epoch-dependent and sub-metre).
* EPSG:258xx       — ETRS89 / UTM zone xx north (GRS80), zones 28-38 —
                     the EU national grids (e.g. 25832 for Germany).

Any pair among these routes through lon/lat (src inverse → dst forward).
Everything is vectorized numpy, exposed both driver-side (ZoneSet) and
as an Arrow-batched pandas UDF for fact tables.  Unknown CRS pairs raise
rather than silently pass through.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

R = 6378137.0  # WGS84 / WebMercator sphere radius

# WGS84 ellipsoid (UTM); GRS80 differs only in the flattening's 12th digit
_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101


def _wgs84_to_webmercator(x: np.ndarray, y: np.ndarray):
    lon = np.asarray(x, dtype=np.float64)
    lat = np.clip(np.asarray(y, dtype=np.float64), -85.06, 85.06)
    mx = np.radians(lon) * R
    my = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return mx, my


def _webmercator_to_wgs84(x: np.ndarray, y: np.ndarray):
    mx = np.asarray(x, dtype=np.float64)
    my = np.asarray(y, dtype=np.float64)
    lon = np.degrees(mx / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(my / R)) - np.pi / 2.0)
    return lon, lat


# --------------------------------------------------------------------------
# Transverse Mercator — 6th-order Krüger series (Karney 2011, "Transverse
# Mercator with an accuracy of a few nanometers", public-domain formulas).
# Forward and inverse are series inverses of each other, so roundtrip error
# inside a UTM zone is ~nm — far below the 1e-9-degree test tolerance.
# --------------------------------------------------------------------------


def _tm_constants(a: float, f: float):
    n = f / (2.0 - f)
    n2, n3, n4, n5, n6 = n * n, n**3, n**4, n**5, n**6
    A = a / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0 + n6 / 256.0)
    alpha = np.array(
        [
            n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288
            + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630
            - 1983433 * n6 / 1935360,
            61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880
            + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ]
    )
    beta = np.array(
        [
            n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512
            + 96199 * n6 / 604800,
            n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105
            - 1118711 * n6 / 3870720,
            17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ]
    )
    e = np.sqrt(f * (2.0 - f))
    return A, alpha, beta, e


_TM_WGS84 = _tm_constants(_WGS84_A, _WGS84_F)
_TM_GRS80 = _tm_constants(_GRS80_A, _GRS80_F)
_UTM_K0 = 0.9996
_UTM_FE = 500_000.0
_UTM_FN_SOUTH = 10_000_000.0


def _tm_forward(lon_deg, lat_deg, lon0_deg: float, consts=_TM_WGS84):
    """Ellipsoidal transverse Mercator, origin at the equator on lon0."""
    _TM_A, _TM_ALPHA, _TM_BETA, _TM_E = consts
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    e = _TM_E
    sphi = np.sin(phi)
    # conformal latitude via the Gauss-Schreiber t
    t = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    xi, eta = xi_p.copy(), eta_p.copy()
    for j in range(6):
        m = 2.0 * (j + 1)
        xi += _TM_ALPHA[j] * np.sin(m * xi_p) * np.cosh(m * eta_p)
        eta += _TM_ALPHA[j] * np.cos(m * xi_p) * np.sinh(m * eta_p)
    return _TM_A * eta, _TM_A * xi  # (easting-from-CM, northing-from-equator)


def _tm_inverse(x, y, lon0_deg: float, consts=_TM_WGS84):
    _TM_A, _TM_ALPHA, _TM_BETA, _TM_E = consts
    eta = np.asarray(x, dtype=np.float64) / _TM_A
    xi = np.asarray(y, dtype=np.float64) / _TM_A
    xi_p, eta_p = xi.copy(), eta.copy()
    for j in range(6):
        m = 2.0 * (j + 1)
        xi_p -= _TM_BETA[j] * np.sin(m * xi) * np.cosh(m * eta)
        eta_p -= _TM_BETA[j] * np.cos(m * xi) * np.sinh(m * eta)
    t = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton-invert t = sinh(atanh(sin phi) - e atanh(e sin phi)) for phi
    e = _TM_E
    phi = np.arctan(t)
    for _ in range(8):
        sphi = np.sin(phi)
        ft = np.sinh(np.arctanh(sphi) - e * np.arctanh(e * sphi)) - t
        # d/dphi of the Gauss-Schreiber t
        dt = (
            np.cosh(np.arctanh(sphi) - e * np.arctanh(e * sphi))
            * (1.0 - e * e)
            / ((1.0 - (e * sphi) ** 2) * np.cos(phi))
        )
        phi = phi - ft / dt
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def _utm_forward(zone: int, south: bool, consts=_TM_WGS84):
    lon0 = -183.0 + 6.0 * zone

    def go(lon, lat):
        ex, ny = _tm_forward(lon, lat, lon0, consts)
        E = _UTM_FE + _UTM_K0 * ex
        N = (_UTM_FN_SOUTH if south else 0.0) + _UTM_K0 * ny
        return E, N

    return go


def _utm_inverse(zone: int, south: bool, consts=_TM_WGS84):
    lon0 = -183.0 + 6.0 * zone

    def go(E, N):
        ex = (np.asarray(E, dtype=np.float64) - _UTM_FE) / _UTM_K0
        ny = (
            np.asarray(N, dtype=np.float64) - (_UTM_FN_SOUTH if south else 0.0)
        ) / _UTM_K0
        return _tm_inverse(ex, ny, lon0, consts)

    return go


# --------------------------------------------------------------------------
# Lambert azimuthal equal-area (ellipsoidal, oblique aspect) — Snyder,
# USGS PP 1395 eqs. 3-12, 24-2..24-14, 3-16/3-18.  EPSG:3035 parameters.
# --------------------------------------------------------------------------

_LAEA_E = np.sqrt(_GRS80_F * (2.0 - _GRS80_F))
_LAEA_LAT0 = np.radians(52.0)
_LAEA_LON0 = 10.0
_LAEA_FE = 4_321_000.0
_LAEA_FN = 3_210_000.0


def _laea_q(sphi: np.ndarray) -> np.ndarray:
    e = _LAEA_E
    return (1.0 - e * e) * (
        sphi / (1.0 - (e * sphi) ** 2)
        - (1.0 / (2.0 * e)) * np.log((1.0 - e * sphi) / (1.0 + e * sphi))
    )


_LAEA_QP = float(_laea_q(np.array(1.0)))
_LAEA_RQ = _GRS80_A * np.sqrt(_LAEA_QP / 2.0)
_LAEA_BETA1 = np.arcsin(float(_laea_q(np.sin(_LAEA_LAT0))) / _LAEA_QP)
_LAEA_M1 = np.cos(_LAEA_LAT0) / np.sqrt(1.0 - (_LAEA_E * np.sin(_LAEA_LAT0)) ** 2)
_LAEA_D = _GRS80_A * _LAEA_M1 / (_LAEA_RQ * np.cos(_LAEA_BETA1))


def _laea_forward(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64) - _LAEA_LON0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    beta = np.arcsin(np.clip(_laea_q(np.sin(phi)) / _LAEA_QP, -1.0, 1.0))
    sb1, cb1 = np.sin(_LAEA_BETA1), np.cos(_LAEA_BETA1)
    B = _LAEA_RQ * np.sqrt(
        2.0 / (1.0 + sb1 * np.sin(beta) + cb1 * np.cos(beta) * np.cos(lam))
    )
    E = _LAEA_FE + B * _LAEA_D * np.cos(beta) * np.sin(lam)
    N = _LAEA_FN + (B / _LAEA_D) * (
        cb1 * np.sin(beta) - sb1 * np.cos(beta) * np.cos(lam)
    )
    return E, N


def _laea_inverse(E, N):
    x = (np.asarray(E, dtype=np.float64) - _LAEA_FE) / _LAEA_D
    y = (np.asarray(N, dtype=np.float64) - _LAEA_FN) * _LAEA_D
    rho = np.sqrt(x * x + y * y)
    ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * _LAEA_RQ), -1.0, 1.0))
    sb1, cb1 = np.sin(_LAEA_BETA1), np.cos(_LAEA_BETA1)
    with np.errstate(invalid="ignore", divide="ignore"):
        q = _LAEA_QP * (
            np.cos(ce) * sb1 + y * np.sin(ce) * cb1 / np.where(rho == 0, 1.0, rho)
        )
        lam = np.arctan2(
            x * np.sin(ce), rho * cb1 * np.cos(ce) - y * sb1 * np.sin(ce)
        )
    q = np.where(rho == 0, _LAEA_QP * sb1, q)
    lam = np.where(rho == 0, 0.0, lam)
    # Newton-invert q(phi) (Snyder 3-16); dq/dphi from eq. 3-12's derivative
    e = _LAEA_E
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(10):
        sphi = np.sin(phi)
        f = _laea_q(sphi) - q
        df = (
            (1.0 - e * e)
            * np.cos(phi)
            * 2.0
            / (1.0 - (e * sphi) ** 2) ** 2
        )
        step = np.where(np.abs(df) > 0, f / np.where(df == 0, 1.0, df), 0.0)
        phi = phi - step
    return np.degrees(lam) + _LAEA_LON0, np.degrees(phi)


# --------------------------------------------------------------------------
# Lambert conformal conic (ellipsoidal, 2 standard parallels) — Snyder,
# USGS PP 1395 pp. 107-109, eqs. 14-15, 15-1..15-11.  EPSG:3034
# (ETRS89-extended / LCC Europe) parameters: GRS80, standard parallels
# 35°N / 65°N, origin 52°N 10°E, FE 4 000 000, FN 2 800 000 — completes
# the projection-family coverage (cylindrical: Mercator/UTM; azimuthal:
# LAEA; conic: LCC).
# --------------------------------------------------------------------------

_LCC_E = np.sqrt(_GRS80_F * (2.0 - _GRS80_F))
_LCC_LON0 = 10.0
_LCC_FE = 4_000_000.0
_LCC_FN = 2_800_000.0


def _lcc_m(phi: np.ndarray) -> np.ndarray:
    return np.cos(phi) / np.sqrt(1.0 - (_LCC_E * np.sin(phi)) ** 2)


def _lcc_t(phi: np.ndarray) -> np.ndarray:
    e = _LCC_E
    sphi = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * sphi) / (1.0 + e * sphi)
    ) ** (e / 2.0)


_LCC_PHI1 = np.radians(35.0)
_LCC_PHI2 = np.radians(65.0)
_LCC_PHI0 = np.radians(52.0)
_LCC_N = (np.log(_lcc_m(_LCC_PHI1)) - np.log(_lcc_m(_LCC_PHI2))) / (
    np.log(_lcc_t(_LCC_PHI1)) - np.log(_lcc_t(_LCC_PHI2))
)
_LCC_F = _lcc_m(_LCC_PHI1) / (_LCC_N * _lcc_t(_LCC_PHI1) ** _LCC_N)
_LCC_RHO0 = _GRS80_A * _LCC_F * _lcc_t(_LCC_PHI0) ** _LCC_N


def _lcc_forward(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64) - _LCC_LON0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = _GRS80_A * _LCC_F * _lcc_t(phi) ** _LCC_N
    theta = _LCC_N * lam
    E = _LCC_FE + rho * np.sin(theta)
    N = _LCC_FN + _LCC_RHO0 - rho * np.cos(theta)
    return E, N


def _lcc_inverse(E, N):
    x = np.asarray(E, dtype=np.float64) - _LCC_FE
    y = _LCC_RHO0 - (np.asarray(N, dtype=np.float64) - _LCC_FN)
    # n > 0 for the northern-parallel EPSG:3034 setup
    rho = np.sqrt(x * x + y * y)
    t = (rho / (_GRS80_A * _LCC_F)) ** (1.0 / _LCC_N)
    theta = np.arctan2(x, y)
    lam = theta / _LCC_N
    # invert t(phi) by fixed point (Snyder eq. 7-9): converges in ~5 iters
    e = _LCC_E
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(10):
        sphi = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0)
        )
    return np.degrees(lam) + _LCC_LON0, np.degrees(phi)


# --------------------------------------------------------------------------
# Albers equal-area conic (ellipsoidal, 2 standard parallels) — Snyder,
# USGS PP 1395 pp. 101-102, eqs. 14-1..14-21.  EPSG:5070 (NAD83 / Conus
# Albers — the US federal analysis grid) parameters: GRS80, standard
# parallels 29.5°N / 45.5°N, origin 23°N 96°W, FE = FN = 0.  Completes
# the conic family with its EQUAL-AREA member (LCC is the conformal one);
# q(φ) is the same Snyder 3-12 authalic function LAEA uses (same GRS80 e).

_AEA_LON0 = -96.0
_AEA_PHI0 = np.radians(23.0)
_AEA_PHI1 = np.radians(29.5)
_AEA_PHI2 = np.radians(45.5)
_AEA_M1 = np.cos(_AEA_PHI1) / np.sqrt(1.0 - (_LAEA_E * np.sin(_AEA_PHI1)) ** 2)
_AEA_M2 = np.cos(_AEA_PHI2) / np.sqrt(1.0 - (_LAEA_E * np.sin(_AEA_PHI2)) ** 2)
_AEA_N = (_AEA_M1 * _AEA_M1 - _AEA_M2 * _AEA_M2) / (
    float(_laea_q(np.sin(_AEA_PHI2))) - float(_laea_q(np.sin(_AEA_PHI1)))
)
_AEA_C = _AEA_M1 * _AEA_M1 + _AEA_N * float(_laea_q(np.sin(_AEA_PHI1)))
_AEA_RHO0 = (
    _GRS80_A * np.sqrt(_AEA_C - _AEA_N * float(_laea_q(np.sin(_AEA_PHI0)))) / _AEA_N
)


def _aea_forward(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64) - _AEA_LON0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = _GRS80_A * np.sqrt(_AEA_C - _AEA_N * _laea_q(np.sin(phi))) / _AEA_N
    theta = _AEA_N * lam
    return rho * np.sin(theta), _AEA_RHO0 - rho * np.cos(theta)


def _aea_inverse(E, N):
    x = np.asarray(E, dtype=np.float64)
    y = _AEA_RHO0 - np.asarray(N, dtype=np.float64)
    rho = np.sqrt(x * x + y * y)
    theta = np.arctan2(x, y)  # n > 0 for the northern-parallel setup
    q = (_AEA_C - (rho * _AEA_N / _GRS80_A) ** 2) / _AEA_N
    # Newton-invert q(phi), identical scheme to the LAEA inverse
    e = _LAEA_E
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(10):
        sphi = np.sin(phi)
        f = _laea_q(sphi) - q
        df = (1.0 - e * e) * np.cos(phi) * 2.0 / (1.0 - (e * sphi) ** 2) ** 2
        phi = phi - np.where(df == 0, 0.0, f / np.where(df == 0, 1.0, df))
    return np.degrees(theta / _AEA_N) + _AEA_LON0, np.degrees(phi)


# --------------------------------------------------------------------------
# Polar stereographic, variant B (ellipsoidal, standard parallel) — Snyder,
# USGS PP 1395 pp. 160-161, eqs. 21-33..21-34, 15-9.  EPSG:3413 (WGS84 /
# NSIDC Sea Ice Polar Stereographic North — the polar remote-sensing grid)
# parameters: WGS84, lat_ts 70°N, lon0 45°W, FE = FN = 0.  Adds the
# azimuthal CONFORMAL member (LAEA is the equal-area one); t(φ) is the
# same Snyder 15-9 conformal function LCC uses, on the WGS84 e.

_PS_E = np.sqrt(_WGS84_F * (2.0 - _WGS84_F))
_PS_LON0 = -45.0
_PS_LAT_TS = np.radians(70.0)


def _ps_t(phi: np.ndarray) -> np.ndarray:
    e = _PS_E
    sphi = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / (
        (1.0 - e * sphi) / (1.0 + e * sphi)
    ) ** (e / 2.0)


_PS_MC = np.cos(_PS_LAT_TS) / np.sqrt(1.0 - (_PS_E * np.sin(_PS_LAT_TS)) ** 2)
_PS_TC = float(_ps_t(_PS_LAT_TS))


def _ps_forward(lon, lat):
    lam = np.radians(np.asarray(lon, dtype=np.float64) - _PS_LON0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    rho = _WGS84_A * _PS_MC * _ps_t(phi) / _PS_TC
    return rho * np.sin(lam), -rho * np.cos(lam)


def _ps_inverse(E, N):
    x = np.asarray(E, dtype=np.float64)
    y = np.asarray(N, dtype=np.float64)
    rho = np.sqrt(x * x + y * y)
    t = rho * _PS_TC / (_WGS84_A * _PS_MC)
    with np.errstate(invalid="ignore"):
        lam = np.arctan2(x, -y)
    lam = np.where(rho == 0, 0.0, lam)
    # invert t(phi) by fixed point (Snyder eq. 7-9), as in the LCC inverse
    e = _PS_E
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(10):
        sphi = np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - e * sphi) / (1.0 + e * sphi)) ** (e / 2.0)
        )
    return np.degrees(lam) + _PS_LON0, np.degrees(phi)


def _norm(crs: str) -> str:
    c = crs.upper().replace(" ", "")
    m = re.fullmatch(r"UTM:?(\d{1,2})([NS])", c)
    if m:
        zone, hemi = int(m.group(1)), m.group(2)
        return f"EPSG:{(32600 if hemi == 'N' else 32700) + zone}"
    return c


def _proj_pair(crs: str):
    """(forward lon/lat -> crs, inverse crs -> lon/lat) or None for 4326.

    EPSG:4258 (ETRS89 lon/lat) is treated as coincident with WGS84: the
    datum difference is time-dependent and sub-metre (plate drift since
    1989), far below this engine's use cases and unresolvable without an
    epoch — the same practical convention GIS tools default to."""
    if crs in ("EPSG:4326", "EPSG:4258"):
        return None
    if crs == "EPSG:3857":
        return _wgs84_to_webmercator, _webmercator_to_wgs84
    if crs == "EPSG:3035":
        return _laea_forward, _laea_inverse
    if crs == "EPSG:3034":
        return _lcc_forward, _lcc_inverse
    if crs == "EPSG:5070":
        return _aea_forward, _aea_inverse
    if crs == "EPSG:3413":
        return _ps_forward, _ps_inverse
    m = re.fullmatch(r"EPSG:32([67])(\d{2})", crs)
    if m:
        south = m.group(1) == "7"
        zone = int(m.group(2))
        if 1 <= zone <= 60:
            return _utm_forward(zone, south), _utm_inverse(zone, south)
    m = re.fullmatch(r"EPSG:258(\d{2})", crs)
    if m:  # ETRS89 / UTM zone NN north (GRS80 ellipsoid) — EU national grids
        zone = int(m.group(1))
        if 28 <= zone <= 38:
            return (
                _utm_forward(zone, False, _TM_GRS80),
                _utm_inverse(zone, False, _TM_GRS80),
            )
    raise ValueError(f"unsupported CRS {crs}")


def reproject(
    x: np.ndarray, y: np.ndarray, src: str, dst: str
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized coordinate transform; identity when src == dst.

    Routes src → lon/lat → dst, so every registered CRS pair works
    (the reference gets the same closure from pyproj)."""
    s, d = _norm(src), _norm(dst)
    if s == d:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    sp = _proj_pair(s)
    dp = _proj_pair(d)
    lon, lat = sp[1](x, y) if sp else (x, y)
    return dp[0](lon, lat) if dp else (
        np.asarray(lon, dtype=np.float64),
        np.asarray(lat, dtype=np.float64),
    )


def reproject_df(df, src: str, dst: str, x: str = "x", y: str = "y"):
    """Reproject coordinate columns in place (pandas UDF, Arrow-batched).

    Mirrors the reference's align-to-proxy-CRS step; prints the same kind
    of warning when CRSs differ (disaggregate.py:41-43)."""
    if _norm(src) == _norm(dst):
        return df
    print(f"Data CRS ({src}) differs from target CRS ({dst}). Reprojecting data.")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
        )
    )
    def go(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
        nx, ny = reproject(xs.to_numpy(np.float64), ys.to_numpy(np.float64), src, dst)
        return pd.DataFrame({"x": nx, "y": ny})

    tmp = df.withColumn("_xy", go(F.col(x), F.col(y)))
    return tmp.withColumn(x, F.col("_xy.x")).withColumn(y, F.col("_xy.y")).drop("_xy")


def reproject_zones(zones, src: str, dst: str):
    """Driver-side ZoneSet reprojection (returns a new ZoneSet)."""
    from ..model.zones import ZoneSet

    if _norm(src) == _norm(dst):
        return zones
    xs, ys = [], []
    for zx, zy in zip(zones.xs, zones.ys):
        nx, ny = reproject(zx, zy, src, dst)
        xs.append(nx)
        ys.append(ny)
    extra = None
    if zones.extra_rings is not None:
        extra = [
            [(*reproject(rx, ry, src, dst), hole) for rx, ry, hole in per_zone]
            for per_zone in zones.extra_rings
        ]
    return ZoneSet(zones.zone_ids.copy(), xs, ys, dict(zones.values), extra_rings=extra)
