"""Round-3 CRS generalization: UTM (any zone, Krüger series) and LAEA
EPSG:3035 (Snyder ellipsoidal) in pure numpy, routed through lon/lat so any
registered pair composes — parity target: the reference reprojects between
arbitrary pyproj CRSs (reference disaggregate.py:44,69,181,217,
aggregate.py:45-59); its EU energy examples live in EPSG:3035.

Verification strategy (pyproj absent from this env):
* roundtrip forward∘inverse at 1e-9 degrees over dense random samples
* UTM cross-checked against an INDEPENDENT formulation — Snyder's classic
  Taylor-series transverse Mercator (USGS PP 1395 eqs. 8-9..8-15), written
  here from the published formulas — agreement within 1 cm in-zone
* LAEA verified by its defining property: the Jacobian of (E,N) w.r.t.
  (lon,lat) equals the ellipsoidal area element everywhere (equal-area),
  plus exact false-origin anchors and longitudinal antisymmetry
"""

import numpy as np
import pytest

from gregor_spark.geo.crs import (
    _laea_forward,
    _laea_inverse,
    _norm,
    reproject,
)

RNG = np.random.RandomState(1234)


# ------------------------------------------------------------------ anchors


def test_laea_false_origin_exact():
    E, N = reproject(np.array([10.0]), np.array([52.0]), "EPSG:4326", "EPSG:3035")
    assert E[0] == pytest.approx(4_321_000.0, abs=1e-6)
    assert N[0] == pytest.approx(3_210_000.0, abs=1e-6)


def test_utm_central_meridian_anchors():
    # zone 31N: lon0 = 3E; equator on the central meridian -> (500000, 0)
    E, N = reproject(np.array([3.0]), np.array([0.0]), "EPSG:4326", "EPSG:32631")
    assert E[0] == pytest.approx(500_000.0, abs=1e-6)
    assert N[0] == pytest.approx(0.0, abs=1e-6)
    # south zone adds the 10,000 km false northing
    E, N = reproject(np.array([3.0]), np.array([0.0]), "EPSG:4326", "EPSG:32731")
    assert N[0] == pytest.approx(10_000_000.0, abs=1e-6)
    # scale on the central meridian is k0 = 0.9996: d(N)/d(arc) at the
    # equator where the meridian radius is a(1-e^2)
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    dphi = 1e-7
    _, N1 = reproject(np.array([3.0]), np.array([dphi]), "EPSG:4326", "EPSG:32631")
    arc = np.radians(dphi) * a * (1.0 - e2)  # meridian curvature radius at 0
    assert N1[0] / arc == pytest.approx(0.9996, rel=1e-9)


def test_utm_spelling_and_zone_parsing():
    assert _norm("UTM:33N") == "EPSG:32633"
    assert _norm("utm 7s") == "EPSG:32707"
    assert _norm("EPSG:3035") == "EPSG:3035"
    # out-of-range UTM zone digits (32699 would be "zone 99") and an
    # untabled code both raise rather than silently passing through
    with pytest.raises(ValueError):
        reproject(np.array([0.0]), np.array([0.0]), "EPSG:4326", "EPSG:32699")
    with pytest.raises(ValueError):
        reproject(np.array([0.0]), np.array([0.0]), "EPSG:4326", "EPSG:9999")


# --------------------------------------------------------------- roundtrips


@pytest.mark.parametrize("crs,lon_rng,lat_rng", [
    ("EPSG:32631", (0.0, 6.0), (-80.0, 84.0)),
    ("EPSG:32601", (-180.0, -174.0), (-80.0, 84.0)),
    ("EPSG:32660", (174.0, 180.0), (-80.0, 84.0)),
    ("EPSG:32733", (12.0, 18.0), (-80.0, 0.0)),
    ("EPSG:3035", (-10.0, 35.0), (30.0, 72.0)),
    ("EPSG:3857", (-179.0, 179.0), (-84.0, 84.0)),
])
def test_roundtrip_1e9_degrees(crs, lon_rng, lat_rng):
    lon = RNG.uniform(*lon_rng, 5000)
    lat = RNG.uniform(*lat_rng, 5000)
    x, y = reproject(lon, lat, "EPSG:4326", crs)
    lon2, lat2 = reproject(x, y, crs, "EPSG:4326")
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_cross_crs_routing_composes():
    """src->dst == (src->4326)->(4326->dst) — the routed path IS that
    composition, so check a 3857 -> 3035 trip against the two-hop one."""
    lon = RNG.uniform(-5, 20, 1000)
    lat = RNG.uniform(40, 60, 1000)
    mx, my = reproject(lon, lat, "EPSG:4326", "EPSG:3857")
    e1, n1 = reproject(mx, my, "EPSG:3857", "EPSG:3035")
    e2, n2 = reproject(lon, lat, "EPSG:4326", "EPSG:3035")
    assert np.abs(e1 - e2).max() < 1e-6
    assert np.abs(n1 - n2).max() < 1e-6


# ------------------------------------- UTM vs independent Snyder TM series


def _snyder_tm_forward(lon_deg, lat_deg, lon0_deg):
    """Snyder, Map Projections — A Working Manual (USGS PP 1395),
    eqs. 3-21 and 8-9..8-15: the classic Taylor-series ellipsoidal
    transverse Mercator, INDEPENDENT of the Krüger/Karney series the
    engine uses.  Accurate to ~mm inside a 6-degree zone."""
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    N = a / np.sqrt(1.0 - e2 * sin_p**2)
    T = tan_p**2
    C = ep2 * cos_p**2
    A = lam * cos_p
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
        - (35 * e2**3 / 3072) * np.sin(6 * phi)
    )
    k0 = 0.9996
    x = k0 * N * (
        A
        + (1 - T + C) * A**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    )
    y = k0 * (
        M
        + N * tan_p * (
            A**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return 500_000.0 + x, y


def test_utm_matches_independent_snyder_series():
    lon = RNG.uniform(0.5, 5.5, 5000)       # zone 31, interior
    lat = RNG.uniform(-80.0, 84.0, 5000)
    E1, N1 = reproject(lon, lat, "EPSG:4326", "EPSG:32631")
    E2, N2 = _snyder_tm_forward(lon, lat, 3.0)
    assert np.abs(E1 - E2).max() < 0.01  # two formula families agree to 1 cm
    assert np.abs(N1 - N2).max() < 0.01


# ------------------------------------------------ LAEA defining properties


def test_laea_is_equal_area():
    """|d(E,N)/d(lon_rad,lat_rad)| must equal the GRS80 area element
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 — the projection's
    defining property, checked by central finite differences."""
    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2.0 - f)
    lon = RNG.uniform(-8.0, 30.0, 2000)
    lat = RNG.uniform(35.0, 70.0, 2000)
    h = 1e-5
    El, Nl = _laea_forward(lon - h, lat)
    Er, Nr = _laea_forward(lon + h, lat)
    Ed, Nd = _laea_forward(lon, lat - h)
    Eu, Nu = _laea_forward(lon, lat + h)
    dr = np.radians(2 * h)
    J = np.abs((Er - El) * (Nu - Nd) - (Eu - Ed) * (Nr - Nl)) / (dr * dr)
    phi = np.radians(lat)
    truth = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
    assert np.abs(J / truth - 1).max() < 1e-5


def test_laea_longitudinal_antisymmetry():
    """E is odd and N even about the lon0=10E meridian."""
    d = RNG.uniform(0.1, 25.0, 2000)
    lat = RNG.uniform(30.0, 72.0, 2000)
    Ep, Np_ = _laea_forward(10.0 + d, lat)
    Em, Nm = _laea_forward(10.0 - d, lat)
    assert np.abs((Ep - 4_321_000.0) + (Em - 4_321_000.0)).max() < 1e-6
    assert np.abs(Np_ - Nm).max() < 1e-6


def test_laea_inverse_at_origin_singularity():
    lon, lat = _laea_inverse(np.array([4_321_000.0]), np.array([3_210_000.0]))
    assert lon[0] == pytest.approx(10.0, abs=1e-12)
    assert lat[0] == pytest.approx(52.0, abs=1e-12)


# ------------------------------------------------------ Spark-side plumbing


def test_reproject_df_laea(spark):
    from gregor_spark.geo.crs import reproject_df

    rows = [(i, -8.0 + 0.7 * i, 36.0 + 0.6 * i) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = reproject_df(df, "EPSG:4326", "EPSG:3035").orderBy("id").collect()
    lon = np.array([r[1] for r in rows])
    lat = np.array([r[2] for r in rows])
    E, N = _laea_forward(lon, lat)
    got_x = np.array([r["x"] for r in out])
    got_y = np.array([r["y"] for r in out])
    assert np.abs(got_x - E).max() < 1e-6
    assert np.abs(got_y - N).max() < 1e-6


def test_reproject_zones_utm():
    from gregor_spark.geo.crs import reproject_zones
    from gregor_spark.model.zones import ZoneSet

    xs = [np.array([0.5, 1.5, 1.5, 0.5])]
    ys = [np.array([45.0, 45.0, 46.0, 46.0])]
    z = ZoneSet(np.array([1]), xs, ys, {1: 10.0})
    zp = reproject_zones(z, "EPSG:4326", "UTM:31N")
    E, N = reproject(xs[0], ys[0], "EPSG:4326", "EPSG:32631")
    assert np.abs(zp.xs[0] - E).max() < 1e-9
    assert np.abs(zp.ys[0] - N).max() < 1e-9


# ----------------------------------------- ETRS89 / EPSG:258xx (round 3b)


def test_etrs89_utm_roundtrip_and_ellipsoid():
    """EPSG:25832 (GRS80) round-trips at 1e-9° and differs from
    EPSG:32632 (WGS84) by the sub-mm ellipsoid delta — present (the
    GRS80 constants really are used) but tiny."""
    lon = RNG.uniform(6.5, 11.5, 4000)
    lat = RNG.uniform(47.0, 55.0, 4000)
    E, N = reproject(lon, lat, "EPSG:4258", "EPSG:25832")
    lon2, lat2 = reproject(E, N, "EPSG:25832", "EPSG:4258")
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    E2, N2 = reproject(lon, lat, "EPSG:4326", "EPSG:32632")
    dN = np.abs(N - N2)
    assert dN.max() < 1e-3       # sub-mm: same zone, different ellipsoid
    assert dN.max() > 1e-6       # ...but NOT identical constants


def test_etrs89_identity_and_zone_range():
    lon = np.array([10.0]); lat = np.array([52.0])
    same = reproject(lon, lat, "EPSG:4326", "EPSG:4258")
    assert same[0][0] == 10.0 and same[1][0] == 52.0
    with pytest.raises(ValueError):
        reproject(lon, lat, "EPSG:4326", "EPSG:25820")  # outside 28-38


# ------------------------------------------------- LCC EPSG:3034 (round 4)


def test_lcc_false_origin_exact():
    """Snyder 15-2: at the projection origin ρ = ρ0 and θ = 0, so the
    grid coordinates are exactly the false easting/northing."""
    E, N = reproject(np.array([10.0]), np.array([52.0]), "EPSG:4326", "EPSG:3034")
    assert E[0] == pytest.approx(4_000_000.0, abs=1e-6)
    assert N[0] == pytest.approx(2_800_000.0, abs=1e-6)


def test_lcc_roundtrip_1e9():
    lon = RNG.uniform(-12.0, 35.0, 4000)
    lat = RNG.uniform(30.0, 72.0, 4000)
    E, N = reproject(lon, lat, "EPSG:4326", "EPSG:3034")
    lon2, lat2 = reproject(E, N, "EPSG:3034", "EPSG:4326")
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_lcc_unit_scale_on_standard_parallels():
    """The defining property of a 2SP conic: point scale factor
    k = ρ·n / (a·m(φ)) is EXACTLY 1 along both standard parallels and
    > 1 outside / < 1 between them (Snyder eq. 15-4)."""
    from gregor_spark.geo.crs import _GRS80_A, _LCC_F, _LCC_N, _lcc_m, _lcc_t

    def k(lat_deg):
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        rho = _GRS80_A * _LCC_F * _lcc_t(phi) ** _LCC_N
        return rho * _LCC_N / (_GRS80_A * _lcc_m(phi))

    assert k(35.0) == pytest.approx(1.0, abs=1e-12)
    assert k(65.0) == pytest.approx(1.0, abs=1e-12)
    assert k(50.0) < 1.0          # between the parallels
    assert k(30.0) > 1.0 and k(70.0) > 1.0  # outside


def test_lcc_is_conformal():
    """Conformality is the projection's defining property and an
    INDEPENDENT check of the implementation: the numerical Jacobian of
    (E, N) w.r.t. ellipsoidal isometric coordinates must be a scaled
    rotation (J^T J = k² I, off-diagonals ~0) at random points."""
    from gregor_spark.geo.crs import _LCC_E, _lcc_forward

    lon = RNG.uniform(-10.0, 30.0, 200)
    lat = RNG.uniform(32.0, 70.0, 200)
    # isometric latitude psi: d(psi) matches d(lon_rad) metrically on the
    # ellipsoid, so a conformal map has a scaled-rotation Jacobian in
    # (lon_rad, psi)
    e = _LCC_E

    def psi(lat_deg):
        phi = np.radians(lat_deg)
        s = np.sin(phi)
        return np.log(np.tan(np.pi / 4 + phi / 2)) - (e / 2) * np.log(
            (1 + e * s) / (1 - e * s)
        )

    h = 1e-7
    E0, N0 = _lcc_forward(lon, lat)
    # d/d lon (in radians)
    E1, N1 = _lcc_forward(lon + np.degrees(h), lat)
    dE_dl, dN_dl = (E1 - E0) / h, (N1 - N0) / h
    # d/d psi via a lat step converted to the psi step it causes
    dlat = 1e-6
    E2, N2 = _lcc_forward(lon, lat + dlat)
    dpsi = psi(lat + dlat) - psi(lat)
    dE_dp, dN_dp = (E2 - E0) / dpsi, (N2 - N0) / dpsi
    # scaled rotation: columns orthogonal and equal-length
    dot = dE_dl * dE_dp + dN_dl * dN_dp
    n1 = np.hypot(dE_dl, dN_dl)
    n2 = np.hypot(dE_dp, dN_dp)
    assert np.max(np.abs(dot) / (n1 * n2)) < 1e-4
    assert np.max(np.abs(n1 / n2 - 1.0)) < 1e-4


def test_lcc_routes_through_other_crs():
    """Composition 3034 -> 3035 -> 3034 is identity to numerical noise
    (both route through lon/lat)."""
    lon = RNG.uniform(0.0, 20.0, 500)
    lat = RNG.uniform(40.0, 60.0, 500)
    E, N = reproject(lon, lat, "EPSG:4326", "EPSG:3034")
    E2, N2 = reproject(*reproject(E, N, "EPSG:3034", "EPSG:3035"), "EPSG:3035", "EPSG:3034")
    assert np.max(np.abs(E2 - E)) < 1e-5
    assert np.max(np.abs(N2 - N)) < 1e-5


# --------------------------- Albers equal-area conic (EPSG:5070), r6


def test_albers_roundtrip_1e9():
    lon = RNG.uniform(-125.0, -66.0, 4000)   # CONUS box
    lat = RNG.uniform(24.0, 50.0, 4000)
    E, N = reproject(lon, lat, "EPSG:4326", "EPSG:5070")
    lon2, lat2 = reproject(E, N, "EPSG:5070", "EPSG:4326")
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_albers_origin_and_known_point():
    """FE = FN = 0 at the 23N 96W origin; Denver matches the published
    NAD83/Conus-Albers coordinate to the metre (independent of this
    implementation's formula path)."""
    from gregor_spark.geo.crs import _aea_forward

    E, N = _aea_forward(np.array([-96.0]), np.array([23.0]))
    assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6
    E, N = _aea_forward(np.array([-104.99]), np.array([39.74]))
    assert E[0] == pytest.approx(-762375.21, abs=1.0)
    assert N[0] == pytest.approx(1893930.44, abs=1.0)


def test_albers_is_equal_area():
    """The defining property: |d(E,N)/d(lon_rad,lat_rad)| equals the
    GRS80 area element, same finite-difference check as LAEA."""
    from gregor_spark.geo.crs import _aea_forward

    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = f * (2.0 - f)
    lon = RNG.uniform(-120.0, -70.0, 2000)
    lat = RNG.uniform(25.0, 49.0, 2000)
    h = 1e-5
    El, Nl = _aea_forward(lon - h, lat)
    Er, Nr = _aea_forward(lon + h, lat)
    Ed, Nd = _aea_forward(lon, lat - h)
    Eu, Nu = _aea_forward(lon, lat + h)
    dr = np.radians(2 * h)
    J = np.abs((Er - El) * (Nu - Nd) - (Eu - Ed) * (Nr - Nl)) / (dr * dr)
    phi = np.radians(lat)
    truth = a * a * (1 - e2) * np.cos(phi) / (1 - e2 * np.sin(phi) ** 2) ** 2
    assert np.abs(J / truth - 1).max() < 1e-5


def test_albers_unit_scale_on_standard_parallels():
    """Along-parallel scale k = rho*n/(a*m(phi)) is exactly 1 on both
    standard parallels, < 1 between and > 1 outside (Snyder 14-16)."""
    from gregor_spark.geo.crs import (
        _AEA_C, _AEA_N, _GRS80_A, _LAEA_E, _laea_q,
    )

    def k(lat_deg):
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        rho = _GRS80_A * np.sqrt(_AEA_C - _AEA_N * _laea_q(np.sin(phi))) / _AEA_N
        m = np.cos(phi) / np.sqrt(1.0 - (_LAEA_E * np.sin(phi)) ** 2)
        return rho * _AEA_N / (_GRS80_A * m)

    assert k(29.5) == pytest.approx(1.0, abs=1e-12)
    assert k(45.5) == pytest.approx(1.0, abs=1e-12)
    assert k(37.0) < 1.0
    assert k(24.0) > 1.0 and k(49.0) > 1.0


def test_albers_routes_through_other_crs():
    lon = RNG.uniform(-110.0, -80.0, 500)
    lat = RNG.uniform(28.0, 46.0, 500)
    E, N = reproject(lon, lat, "EPSG:4326", "EPSG:5070")
    E2, N2 = reproject(
        *reproject(E, N, "EPSG:5070", "EPSG:3857"), "EPSG:3857", "EPSG:5070"
    )
    assert np.max(np.abs(E2 - E)) < 1e-5
    assert np.max(np.abs(N2 - N)) < 1e-5


# ----------------------- Polar stereographic north (EPSG:3413), r6


def test_polar_stereo_roundtrip_1e9():
    lon = RNG.uniform(-180.0, 180.0, 4000)
    lat = RNG.uniform(45.0, 89.9, 4000)
    E, N = reproject(lon, lat, "EPSG:4326", "EPSG:3413")
    lon2, lat2 = reproject(E, N, "EPSG:3413", "EPSG:4326")
    dlon = (lon2 - lon + 180.0) % 360.0 - 180.0
    assert np.max(np.abs(dlon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_polar_stereo_pole_and_true_scale():
    """The pole maps to (0,0); scale k = rho*tc/(a*m(phi)*t(phi)) is
    exactly 1 on the 70N standard parallel (variant B's definition)."""
    from gregor_spark.geo.crs import _PS_MC, _PS_TC, _WGS84_A, _ps_forward, _ps_t

    E, N = _ps_forward(np.array([123.0]), np.array([90.0]))
    assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6

    def k(lat_deg):
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        e2 = 1.0 - (1.0 - 1.0 / 298.257223563) ** 2
        m = np.cos(phi) / np.sqrt(1.0 - e2 * np.sin(phi) ** 2)
        rho = _WGS84_A * _PS_MC * _ps_t(phi) / _PS_TC
        return rho / (_WGS84_A * m)

    assert float(k(70.0)) == pytest.approx(1.0, abs=1e-12)
    assert float(k(60.0)) > 1.0   # away from the standard parallel


def test_polar_stereo_is_conformal():
    """Same scaled-rotation Jacobian check as LCC, in (lon_rad, psi)."""
    from gregor_spark.geo.crs import _PS_E, _ps_forward

    lon = RNG.uniform(-170.0, 170.0, 200)
    lat = RNG.uniform(55.0, 85.0, 200)
    e = _PS_E

    def psi(lat_deg):
        phi = np.radians(lat_deg)
        s = np.sin(phi)
        return np.log(np.tan(np.pi / 4 + phi / 2)) - (e / 2) * np.log(
            (1 + e * s) / (1 - e * s)
        )

    h = 1e-7
    E0, N0 = _ps_forward(lon, lat)
    E1, N1 = _ps_forward(lon + np.degrees(h), lat)
    dE_dl, dN_dl = (E1 - E0) / h, (N1 - N0) / h
    dlat = 1e-6
    E2, N2 = _ps_forward(lon, lat + dlat)
    dpsi = psi(lat + dlat) - psi(lat)
    dE_dp, dN_dp = (E2 - E0) / dpsi, (N2 - N0) / dpsi
    dot = dE_dl * dE_dp + dN_dl * dN_dp
    n1 = np.hypot(dE_dl, dN_dl)
    n2 = np.hypot(dE_dp, dN_dp)
    assert np.max(np.abs(dot) / (n1 * n2)) < 1e-4
    assert np.max(np.abs(n1 / n2 - 1.0)) < 1e-4


def test_polar_stereo_meridian_geometry():
    """Down-track sanity: the lon0 = 45W meridian maps onto the -y axis
    (E = 0, N < 0), and lon0+90 = 45E onto the +x axis."""
    from gregor_spark.geo.crs import _ps_forward

    lats = np.array([60.0, 70.0, 80.0])
    E, N = _ps_forward(np.full(3, -45.0), lats)
    assert np.max(np.abs(E)) < 1e-6 and np.all(N < 0)
    E, N = _ps_forward(np.full(3, 45.0), lats)
    assert np.max(np.abs(N)) < 1e-6 and np.all(E > 0)


# ============================================================== r7 registry
# Round-7 parametrized per-EPSG registry: every new family instance gets an
# exact false-origin anchor, a 1e-9-degree roundtrip, and a defining-property
# check (unit scale on standard parallels / equal-area Jacobian /
# conformality), following the r3 verification protocol (pyproj absent).

_E_GRS80 = np.sqrt((1.0 / 298.257222101) * (2.0 - 1.0 / 298.257222101))
_E_WGS84 = np.sqrt((1.0 / 298.257223563) * (2.0 - 1.0 / 298.257223563))


def _wrap_lon(x):
    return (np.asarray(x) + 180.0) % 360.0 - 180.0


_R7_ANCHORS = [
    # (crs, lon0, lat0, FE, FN) — projecting the natural/false origin must
    # land exactly on the false easting/northing
    ("EPSG:2154", 3.0, 46.5, 700_000.0, 6_600_000.0),
    ("EPSG:3347", -(91.0 + 52.0 / 60.0), 63.390675, 6_200_000.0, 3_000_000.0),
    ("EPSG:5243", 10.5, 51.0, 0.0, 0.0),
    ("EPSG:3416", 13.0 + 20.0 / 60.0, 47.5, 400_000.0, 400_000.0),
    ("EPSG:3112", 134.0, 0.0, 0.0, 0.0),
    ("EPSG:32118", -74.0, 40.0 + 10.0 / 60.0, 300_000.0, 0.0),
    ("EPSG:3310", -120.0, 0.0, 0.0, -4_000_000.0),
    ("EPSG:3577", 132.0, 0.0, 0.0, 0.0),
    ("EPSG:2193", 173.0, 0.0, 1_600_000.0, 10_000_000.0),
    ("EPSG:5179", 127.5, 38.0, 1_000_000.0, 2_000_000.0),
    ("EPSG:3067", 27.0, 0.0, 500_000.0, 0.0),
    ("EPSG:6677", 139.0 + 50.0 / 60.0, 36.0, 0.0, 0.0),
    ("EPSG:6931", 17.0, 90.0, 0.0, 0.0),   # any lon at the pole
    ("EPSG:6932", -42.0, -90.0, 0.0, 0.0),
    ("EPSG:3573", 0.0, 90.0, 0.0, 0.0),
    ("EPSG:3575", 123.0, 90.0, 0.0, 0.0),
    ("EPSG:32661", 44.0, 90.0, 2_000_000.0, 2_000_000.0),
    ("EPSG:32761", 44.0, -90.0, 2_000_000.0, 2_000_000.0),
    ("EPSG:3031", 77.0, -90.0, 0.0, 0.0),
    ("EPSG:3995", 77.0, 90.0, 0.0, 0.0),
    ("EPSG:6933", 0.0, 0.0, 0.0, 0.0),
]


@pytest.mark.parametrize("crs,lon,lat,fe,fn", _R7_ANCHORS)
def test_r7_false_origin_anchors(crs, lon, lat, fe, fn):
    E, N = reproject(np.array([lon]), np.array([lat]), "EPSG:4326", crs)
    assert E[0] == pytest.approx(fe, abs=1e-6)
    assert N[0] == pytest.approx(fn, abs=1e-6)


_R7_DOMAINS = {
    "EPSG:2154": ((-4.5, 8.0), (41.5, 51.5)),
    "EPSG:3347": ((-140.0, -55.0), (42.0, 83.0)),
    "EPSG:5243": ((5.5, 15.5), (47.0, 55.5)),
    "EPSG:3416": ((9.0, 17.5), (46.0, 49.5)),
    "EPSG:3112": ((110.0, 155.0), (-44.0, -9.0)),
    "EPSG:32118": ((-74.8, -71.5), (40.4, 41.4)),
    "EPSG:3310": ((-125.0, -114.0), (32.0, 42.5)),
    "EPSG:3577": ((110.0, 155.0), (-44.0, -9.0)),
    "EPSG:2193": ((166.0, 179.0), (-47.5, -34.0)),
    "EPSG:5179": ((124.0, 132.0), (33.0, 39.0)),
    "EPSG:3067": ((19.0, 32.0), (59.0, 70.5)),
    "EPSG:6677": ((138.5, 141.0), (34.5, 37.5)),
    "EPSG:6931": ((-180.0, 180.0), (30.0, 90.0)),
    "EPSG:6932": ((-180.0, 180.0), (-90.0, -30.0)),
    "EPSG:3573": ((-180.0, 180.0), (45.0, 90.0)),
    "EPSG:3575": ((-180.0, 180.0), (45.0, 90.0)),
    "EPSG:32661": ((-180.0, 180.0), (60.0, 90.0)),
    "EPSG:32761": ((-180.0, 180.0), (-90.0, -60.0)),
    "EPSG:3031": ((-180.0, 180.0), (-89.999, -55.0)),
    "EPSG:3995": ((-180.0, 180.0), (55.0, 89.999)),
    "EPSG:6933": ((-179.0, 179.0), (-85.0, 85.0)),
    "EPSG:26910": ((-126.0, -120.0), (30.0, 80.0)),
}


@pytest.mark.parametrize("crs", sorted(_R7_DOMAINS))
def test_r7_roundtrip_1e9_degrees(crs):
    lon_rng, lat_rng = _R7_DOMAINS[crs]
    lon = RNG.uniform(*lon_rng, 3000)
    lat = RNG.uniform(*lat_rng, 3000)
    E, N = reproject(lon, lat, "EPSG:4326", crs)
    lo, la = reproject(E, N, crs, "EPSG:4326")
    assert np.max(np.abs(_wrap_lon(lo - lon))) < 1e-9
    assert np.max(np.abs(la - lat)) < 1e-9


def _num_jacobian(crs, lon, lat, h=1e-7):
    """|d(E,N)/d(lon_rad, lat_rad)| by central differences."""
    El, Nl = reproject(lon - h, lat, "EPSG:4326", crs)
    Er, Nr = reproject(lon + h, lat, "EPSG:4326", crs)
    Ed, Nd = reproject(lon, lat - h, "EPSG:4326", crs)
    Eu, Nu = reproject(lon, lat + h, "EPSG:4326", crs)
    hr = np.radians(2.0 * h)
    return ((Er - El) * (Nu - Nd) - (Eu - Ed) * (Nr - Nl)) / (hr * hr)


@pytest.mark.parametrize("crs,lon_rng,lat_rng,e,a", [
    ("EPSG:3577", (115.0, 150.0), (-42.0, -12.0), _E_GRS80, 6378137.0),
    ("EPSG:3310", (-124.0, -115.0), (33.0, 42.0), _E_GRS80, 6378137.0),
    ("EPSG:6931", (-170.0, 170.0), (35.0, 88.0), _E_WGS84, 6378137.0),
    ("EPSG:6932", (-170.0, 170.0), (-88.0, -35.0), _E_WGS84, 6378137.0),
    ("EPSG:6933", (-170.0, 170.0), (-80.0, 80.0), _E_WGS84, 6378137.0),
])
def test_r7_equal_area_jacobian(crs, lon_rng, lat_rng, e, a):
    """Equal-area families: the Jacobian of (E,N) w.r.t. (lon,lat) in
    radians equals the ellipsoidal area element a²(1−e²)cosφ/(1−e²sin²φ)²
    everywhere — the projection's defining property."""
    lon = RNG.uniform(*lon_rng, 400)
    lat = RNG.uniform(*lat_rng, 400)
    J = np.abs(_num_jacobian(crs, lon, lat))
    phi = np.radians(lat)
    truth = a * a * (1.0 - e * e) * np.cos(phi) / (1.0 - (e * np.sin(phi)) ** 2) ** 2
    assert np.max(np.abs(J / truth - 1.0)) < 1e-5


@pytest.mark.parametrize("crs,parallels,lon_probe,e", [
    ("EPSG:2154", (49.0, 44.0), 2.0, _E_GRS80),       # LCC north
    ("EPSG:3112", (-18.0, -36.0), 140.0, _E_GRS80),   # LCC south (n < 0)
    ("EPSG:3577", (-18.0, -36.0), 140.0, _E_GRS80),   # AEA south
    ("EPSG:3310", (34.0, 40.5), -120.0, _E_GRS80),    # AEA north
    ("EPSG:3031", (-71.0,), 30.0, _E_WGS84),          # PS-B south
    ("EPSG:3995", (71.0,), 30.0, _E_WGS84),           # PS-B north
    ("EPSG:6933", (30.0, -30.0), 10.0, _E_WGS84),     # CEA (lat_ts = ±30)
])
def test_r7_unit_scale_on_standard_parallels(crs, parallels, lon_probe, e):
    """Along-parallel scale k = proj distance / (a·m(φ)·dλ) is exactly 1
    on every standard parallel, for every conic/azimuthal/cylindrical
    family — checked numerically with central differences."""
    a = 6378137.0
    for lat_sp in parallels:
        h = 1e-6
        El, Nl = reproject(np.array([lon_probe - h]), np.array([lat_sp]),
                           "EPSG:4326", crs)
        Er, Nr = reproject(np.array([lon_probe + h]), np.array([lat_sp]),
                           "EPSG:4326", crs)
        d_proj = float(np.hypot(Er - El, Nr - Nl)[0])
        phi = np.radians(lat_sp)
        m = np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)
        d_true = a * m * np.radians(2.0 * h)
        assert d_proj / d_true == pytest.approx(1.0, abs=1e-7), (crs, lat_sp)


@pytest.mark.parametrize("crs,lon0,k0", [
    ("EPSG:2193", 173.0, 0.9996),
    ("EPSG:5179", 127.5, 0.9996),
    ("EPSG:6677", 139.0 + 50.0 / 60.0, 0.9999),
    ("EPSG:3067", 27.0, 0.9996),
])
def test_r7_tm_central_meridian_scale(crs, lon0, k0):
    """National TM grids: meridian scale on the central meridian is k0
    (d(N)/d(meridian arc) via the meridian curvature radius)."""
    e2 = _E_GRS80 * _E_GRS80
    for lat in (-40.0, 5.0, 38.0, 61.0):
        h = 1e-6
        _, N0 = reproject(np.array([lon0]), np.array([lat - h]), "EPSG:4326", crs)
        _, N1 = reproject(np.array([lon0]), np.array([lat + h]), "EPSG:4326", crs)
        phi = np.radians(lat)
        rm = 6378137.0 * (1.0 - e2) / (1.0 - e2 * np.sin(phi) ** 2) ** 1.5
        arc = np.radians(2.0 * h) * rm
        # rel 1e-7, not 1e-9: N ~ 10^7 m, so the central difference
        # cancels ~9 digits — the residual is FD noise, not projection
        assert float((N1 - N0)[0]) / arc == pytest.approx(k0, rel=1e-7), (crs, lat)


def test_r7_ups_scale_at_pole():
    """UPS (PS variant A): the defining k0 = 0.994 applies AT the pole —
    check the meridian scale d(rho)/d(arc) just off the pole."""
    for crs, sgn in (("EPSG:32661", 1.0), ("EPSG:32761", -1.0)):
        lat1, lat2 = sgn * 89.999, sgn * 89.998
        E1, N1 = reproject(np.array([0.0]), np.array([lat1]), "EPSG:4326", crs)
        E2, N2 = reproject(np.array([0.0]), np.array([lat2]), "EPSG:4326", crs)
        rho1 = float(np.hypot(E1 - 2e6, N1 - 2e6)[0])
        rho2 = float(np.hypot(E2 - 2e6, N2 - 2e6)[0])
        e2 = _E_WGS84 * _E_WGS84
        phi = np.radians((lat1 + lat2) / 2.0)
        rm = 6378137.0 * (1.0 - e2) / (1.0 - e2 * np.sin(phi) ** 2) ** 1.5
        arc = np.radians(0.001) * rm
        assert (rho2 - rho1) / arc == pytest.approx(0.994, abs=1e-6)


def test_r7_lcc_south_is_conformal():
    """GA Lambert (southern parallels, n < 0): the Jacobian in
    (lon_rad, isometric-lat) coordinates is a scaled rotation."""
    lon = RNG.uniform(115.0, 150.0, 200)
    lat = RNG.uniform(-42.0, -12.0, 200)
    e = _E_GRS80

    def psi(lat_deg):
        phi = np.radians(lat_deg)
        s = np.sin(phi)
        return np.log(np.tan(np.pi / 4 + phi / 2)) - (e / 2) * np.log(
            (1 + e * s) / (1 - e * s)
        )

    h = 1e-7
    E0, N0 = reproject(lon, lat, "EPSG:4326", "EPSG:3112")
    E1, N1 = reproject(lon + np.degrees(h), lat, "EPSG:4326", "EPSG:3112")
    dE_dl, dN_dl = (E1 - E0) / h, (N1 - N0) / h
    dlat = 1e-6
    E2, N2 = reproject(lon, lat + dlat, "EPSG:4326", "EPSG:3112")
    dpsi = psi(lat + dlat) - psi(lat)
    dE_dp, dN_dp = (E2 - E0) / dpsi, (N2 - N0) / dpsi
    dot = dE_dl * dE_dp + dN_dl * dN_dp
    n1 = np.hypot(dE_dl, dN_dl)
    n2 = np.hypot(dE_dp, dN_dp)
    assert np.max(np.abs(dot) / (n1 * n2)) < 1e-4
    assert np.max(np.abs(n1 / n2 - 1.0)) < 1e-4


def test_r7_nad83_utm_matches_wgs84_utm_to_the_mm():
    """EPSG:26910 (NAD83 UTM 10N, GRS80) vs EPSG:32610 (WGS84 UTM 10N):
    the ellipsoids differ only in the flattening's 12th digit, so the
    projected coordinates agree to sub-mm — while both must ROUNDTRIP
    exactly through their own ellipsoid constants."""
    lon = RNG.uniform(-126.0, -120.0, 500)
    lat = RNG.uniform(32.0, 60.0, 500)
    En, Nn = reproject(lon, lat, "EPSG:4326", "EPSG:26910")
    Ew, Nw = reproject(lon, lat, "EPSG:4326", "EPSG:32610")
    assert np.max(np.abs(En - Ew)) < 1e-3
    assert np.max(np.abs(Nn - Nw)) < 1e-3


def test_r7_supported_crs_listing():
    from gregor_spark.geo.crs import supported_crs

    codes = supported_crs()
    assert "EPSG:2154" in codes and "EPSG:6933" in codes
    assert len(codes) >= 25
