"""Pure-numpy CRS transforms + geodesics (the pyproj surface the
reference uses, reimplemented from the projection formulas).

Reference usage being covered:
  * ``gdf.to_crs(...)`` between EPSG:3577 (GDA94 / Australian Albers —
    the reference's working CRS, coastlines/raster.py:206) and
    geographic coordinates (coastlines/vector.py:856, 1591)
  * ``pyproj.Geod(ellps="WGS84").inv`` geodesic azimuth/distance
    (coastlines/vector.py:856-862)

Implemented projections (WGS84/GRS80 ellipsoid — identical to < 1e-4 m):
  * ``EPSG:4326``   geographic lon/lat degrees (identity)
  * ``EPSG:3577``   Albers equal-area conic, std parallels -18/-36,
                    lon0 132, lat0 0 (ellipsoidal closed form, Snyder
                    1987 eqs. 14-12..14-21)
  * ``EPSG:3857``   spherical Web Mercator
  * ``EPSG:326zz/327zz``  UTM north/south, transverse Mercator by the
                    4th-order Krueger series (mm-level inside a zone)

All transforms are vectorized ndarray -> ndarray; Spark callers batch
them inside Arrow kernels (see operators/reproject.py). Accuracy is
pinned in tests against independent oracles: numerically integrated
meridian arcs / ellipsoidal area elements and closed-form equator
geodesics — not against another library.
"""

from __future__ import annotations

import numpy as np

# WGS84 (GDA94's GRS80 differs only in the inverse-flattening 12th digit)
A = 6378137.0
F_INV = 298.257223563
F = 1.0 / F_INV
B = A * (1.0 - F)
E2 = F * (2.0 - F)          # first eccentricity squared
E = np.sqrt(E2)
EP2 = E2 / (1.0 - E2)       # second eccentricity squared

_D = np.pi / 180.0


# ------------------------------------------------------------ Albers (3577)


def _q_auth(sin_phi: np.ndarray) -> np.ndarray:
    """Snyder eq. 3-12: authalic q as a function of sin(latitude)."""
    es = E * sin_phi
    return (1.0 - E2) * (
        sin_phi / (1.0 - E2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * E)) * np.log((1.0 - es) / (1.0 + es))
    )


class AlbersConic:
    """Ellipsoidal Albers equal-area conic (Snyder 14-12..14-21)."""

    def __init__(self, lat1: float, lat2: float, lat0: float, lon0: float,
                 false_e: float = 0.0, false_n: float = 0.0) -> None:
        s1, s2 = np.sin(lat1 * _D), np.sin(lat2 * _D)
        c1, c2 = np.cos(lat1 * _D), np.cos(lat2 * _D)
        m1 = c1 / np.sqrt(1.0 - E2 * s1 * s1)
        m2 = c2 / np.sqrt(1.0 - E2 * s2 * s2)
        q1, q2 = _q_auth(np.asarray(s1)), _q_auth(np.asarray(s2))
        q0 = _q_auth(np.asarray(np.sin(lat0 * _D)))
        self.n = float((m1 * m1 - m2 * m2) / (q2 - q1))
        self.c = float(m1 * m1 + self.n * q1)
        self.rho0 = float(A * np.sqrt(self.c - self.n * q0) / self.n)
        self.lon0 = lon0
        self.false_e, self.false_n = false_e, false_n

    def forward(self, lon: np.ndarray, lat: np.ndarray):
        q = _q_auth(np.sin(np.asarray(lat, float) * _D))
        rho = A * np.sqrt(self.c - self.n * q) / self.n
        theta = self.n * (np.asarray(lon, float) - self.lon0) * _D
        x = rho * np.sin(theta) + self.false_e
        y = self.rho0 - rho * np.cos(theta) + self.false_n
        return x, y

    def inverse(self, x: np.ndarray, y: np.ndarray):
        xs = np.asarray(x, float) - self.false_e
        ys = self.rho0 - (np.asarray(y, float) - self.false_n)
        rho = np.hypot(xs, ys) * np.sign(self.n)
        theta = np.arctan2(xs * np.sign(self.n), ys * np.sign(self.n))
        lon = self.lon0 + theta / self.n / _D
        q = (self.c - (rho * self.n / A) ** 2) / self.n
        # Newton iteration for latitude from authalic q (Snyder 3-16)
        qp = _q_auth(np.asarray(1.0))
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        lim = np.pi / 2.0 - 1e-9  # keep cos(phi) off zero near the poles
        # 6 iterations suffice below ~85 deg; near the pole the Newton
        # step shrinks (cos in the denominator is clipped), so give the
        # tail enough rounds to close the last microdegrees
        for _ in range(24):
            s = np.sin(phi)
            es2 = 1.0 - E2 * s * s
            dq = q - _q_auth(s)
            phi = np.clip(
                phi + es2 * es2 / (2.0 * np.cos(phi) * (1.0 - E2)) * dq,
                -lim, lim,
            )
        # poles: q == +-qp
        phi = np.where(np.abs(q) >= np.abs(qp) - 1e-14,
                       np.sign(q) * np.pi / 2.0, phi)
        return lon, phi / _D


_ALBERS_3577 = AlbersConic(lat1=-18.0, lat2=-36.0, lat0=0.0, lon0=132.0)


# --------------------------------------------------- transverse Mercator


def _tm_consts():
    n = F / (2.0 - F)
    n2, n3, n4 = n * n, n ** 3, n ** 4
    # rectifying radius (Krueger)
    a_rect = A / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0)
    alpha = np.array(
        [
            n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0,
            13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0,
            61.0 * n3 / 240.0 - 103.0 * n4 / 140.0,
            49561.0 * n4 / 161280.0,
        ]
    )
    beta = np.array(
        [
            n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - 1.0 * n4 / 360.0,
            n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0,
            17.0 * n3 / 480.0 - 37.0 * n4 / 840.0,
            4397.0 * n4 / 161280.0,
        ]
    )
    delta = np.array(
        [
            2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3,
            7.0 * n2 / 3.0 - 8.0 * n3 / 5.0,
            56.0 * n3 / 15.0,
            0.0,
        ]
    )
    return a_rect, alpha, beta, delta


_A_RECT, _ALPHA, _BETA, _DELTA = _tm_consts()
_K0_UTM = 0.9996


def tm_forward(lon, lat, lon0: float, k0: float = _K0_UTM,
               false_e: float = 500000.0, false_n: float = 0.0):
    """Transverse Mercator forward (Krueger series, 4th order in n)."""
    lam = (np.asarray(lon, float) - lon0) * _D
    phi = np.asarray(lat, float) * _D
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - E * np.arctanh(E * s))  # tan(conformal lat)
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.sqrt(t * t + np.cos(lam) ** 2))
    j = np.arange(1, 5)[:, None]
    xi = xi_p + np.sum(
        _ALPHA[:, None] * np.sin(2 * j * xi_p.ravel()) * np.cosh(2 * j * eta_p.ravel()),
        axis=0,
    ).reshape(np.shape(xi_p))
    eta = eta_p + np.sum(
        _ALPHA[:, None] * np.cos(2 * j * xi_p.ravel()) * np.sinh(2 * j * eta_p.ravel()),
        axis=0,
    ).reshape(np.shape(eta_p))
    return false_e + k0 * _A_RECT * eta, false_n + k0 * _A_RECT * xi


def tm_inverse(x, y, lon0: float, k0: float = _K0_UTM,
               false_e: float = 500000.0, false_n: float = 0.0):
    """Transverse Mercator inverse (Krueger series, 4th order in n)."""
    xi = (np.asarray(y, float) - false_n) / (k0 * _A_RECT)
    eta = (np.asarray(x, float) - false_e) / (k0 * _A_RECT)
    j = np.arange(1, 5)[:, None]
    xi_p = xi - np.sum(
        _BETA[:, None] * np.sin(2 * j * xi.ravel()) * np.cosh(2 * j * eta.ravel()),
        axis=0,
    ).reshape(np.shape(xi))
    eta_p = eta - np.sum(
        _BETA[:, None] * np.cos(2 * j * xi.ravel()) * np.sinh(2 * j * eta.ravel()),
        axis=0,
    ).reshape(np.shape(eta))
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    chi = np.arctan(tau_p)  # conformal latitude
    phi = chi + np.sum(
        _DELTA[:, None] * np.sin(2 * j * chi.ravel()),
        axis=0,
    ).reshape(np.shape(chi))
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return lon0 + lam / _D, phi / _D


def utm_zone_params(epsg: int) -> tuple[float, float]:
    """EPSG:326zz (north) / 327zz (south) -> (lon0_deg, false_northing)."""
    series, zone = epsg // 100, epsg % 100
    if series == 326 and 1 <= zone <= 60:
        return -183.0 + 6.0 * zone, 0.0
    if series == 327 and 1 <= zone <= 60:
        return -183.0 + 6.0 * zone, 10000000.0
    raise ValueError(f"not a UTM EPSG code: {epsg}")


# ------------------------------------------------------------ Web Mercator


def webmerc_forward(lon, lat):
    lam = np.asarray(lon, float) * _D
    phi = np.asarray(lat, float) * _D
    return A * lam, A * np.log(np.tan(np.pi / 4.0 + phi / 2.0))


def webmerc_inverse(x, y):
    lon = np.asarray(x, float) / A / _D
    lat = (2.0 * np.arctan(np.exp(np.asarray(y, float) / A)) - np.pi / 2.0) / _D
    return lon, lat


# ---------------------------------------------------------------- registry


def _parse(crs: str) -> tuple[str, int]:
    s = crs.strip().upper()
    if not s.startswith("EPSG:"):
        raise ValueError(f"unsupported CRS spec {crs!r} (use EPSG:<code>)")
    return s, int(s[5:])


def to_lonlat(x, y, crs: str):
    """Project planar coordinates in `crs` back to lon/lat degrees."""
    _, code = _parse(crs)
    if code == 4326:
        return np.asarray(x, float), np.asarray(y, float)
    if code == 3577:
        return _ALBERS_3577.inverse(x, y)
    if code == 3857:
        return webmerc_inverse(x, y)
    lon0, fn = utm_zone_params(code)
    return tm_inverse(x, y, lon0, false_n=fn)


def from_lonlat(lon, lat, crs: str):
    """Project lon/lat degrees into planar coordinates of `crs`."""
    _, code = _parse(crs)
    if code == 4326:
        return np.asarray(lon, float), np.asarray(lat, float)
    if code == 3577:
        return _ALBERS_3577.forward(lon, lat)
    if code == 3857:
        return webmerc_forward(lon, lat)
    lon0, fn = utm_zone_params(code)
    return tm_forward(lon, lat, lon0, false_n=fn)


def transform_xy(x, y, src: str, dst: str):
    """src-planar -> dst-planar via geographic (pyproj.Transformer
    analog). Identity short-circuit when src == dst."""
    if _parse(src)[0] == _parse(dst)[0]:
        return np.asarray(x, float), np.asarray(y, float)
    lon, lat = to_lonlat(x, y, src)
    return from_lonlat(lon, lat, dst)


# ---------------------------------------------------------------- geodesic


def geodesic_inverse(lon1, lat1, lon2, lat2, tol: float = 1e-12,
                     max_iter: int = 64):
    """Vincenty inverse on WGS84 (pyproj.Geod.inv analog): returns
    (fwd_azimuth_deg, back_azimuth_deg, distance_m), all vectorized.

    Converges for all non-antipodal pairs; nearly-antipodal points
    (lambda iteration divergence) fall back to the spherical great
    circle on the authalic sphere — documented <0.6% worst-case error
    in a regime the reference never hits (transect-scale distances).
    """
    lon1 = np.asarray(lon1, float) * _D
    lat1 = np.asarray(lat1, float) * _D
    lon2 = np.asarray(lon2, float) * _D
    lat2 = np.asarray(lat2, float) * _D
    u1 = np.arctan((1.0 - F) * np.tan(lat1))
    u2 = np.arctan((1.0 - F) * np.tan(lat2))
    su1, cu1 = np.sin(u1), np.cos(u1)
    su2, cu2 = np.sin(u2), np.cos(u2)
    big_l = lon2 - lon1
    lam = big_l.copy()
    converged = np.zeros(np.shape(lam), bool)
    sig = np.zeros_like(lam)
    ssig = np.zeros_like(lam)
    csig = np.ones_like(lam)
    cos2a = np.ones_like(lam)
    c2sm = np.zeros_like(lam)
    for _ in range(max_iter):
        sl, cl = np.sin(lam), np.cos(lam)
        ssig = np.sqrt((cu2 * sl) ** 2 + (cu1 * su2 - su1 * cu2 * cl) ** 2)
        csig = su1 * su2 + cu1 * cu2 * cl
        sig = np.arctan2(ssig, csig)
        with np.errstate(divide="ignore", invalid="ignore"):
            sa = np.where(ssig != 0.0, cu1 * cu2 * sl / np.where(ssig == 0, 1, ssig), 0.0)
        cos2a = 1.0 - sa * sa
        with np.errstate(divide="ignore", invalid="ignore"):
            c2sm = np.where(
                cos2a != 0.0,
                csig - 2.0 * su1 * su2 / np.where(cos2a == 0, 1, cos2a),
                0.0,  # equatorial line
            )
        cc = F / 16.0 * cos2a * (4.0 + F * (4.0 - 3.0 * cos2a))
        lam_new = big_l + (1.0 - cc) * F * sa * (
            sig + cc * ssig * (c2sm + cc * csig * (-1.0 + 2.0 * c2sm * c2sm))
        )
        newly = np.abs(lam_new - lam) < tol
        lam = np.where(converged, lam, lam_new)
        converged |= newly
        if converged.all():
            break
    u2_ = cos2a * EP2
    k1 = (np.sqrt(1.0 + u2_) - 1.0) / (np.sqrt(1.0 + u2_) + 1.0)
    big_a = (1.0 + 0.25 * k1 * k1) / (1.0 - k1)
    big_b = k1 * (1.0 - 3.0 / 8.0 * k1 * k1)
    dsig = big_b * ssig * (
        c2sm
        + big_b / 4.0 * (
            csig * (-1.0 + 2.0 * c2sm * c2sm)
            - big_b / 6.0 * c2sm * (-3.0 + 4.0 * ssig * ssig)
            * (-3.0 + 4.0 * c2sm * c2sm)
        )
    )
    dist = B * big_a * (sig - dsig)
    sl, cl = np.sin(lam), np.cos(lam)
    az_f = np.arctan2(cu2 * sl, cu1 * su2 - su1 * cu2 * cl) / _D
    # pyproj.Geod.inv convention: back azimuth points from point 2 BACK
    # to point 1 (Vincenty's alpha2 is the direction of travel at 2)
    az_b = np.arctan2(cu1 * sl, -su1 * cu2 + cu1 * su2 * cl) / _D + 180.0
    # spherical fallback where the lambda iteration failed to converge
    if not converged.all():
        r_auth = A * np.sqrt(_q_auth(np.asarray(1.0)) / 2.0)
        d_sph = r_auth * np.arccos(
            np.clip(su1 * su2 + cu1 * cu2 * np.cos(big_l), -1.0, 1.0)
        )
        dist = np.where(converged, dist, d_sph)
    # coincident points: zero distance, azimuth 0
    same = (np.abs(big_l) < 1e-15) & (np.abs(lat1 - lat2) < 1e-15)
    dist = np.where(same, 0.0, dist)
    az_f = np.where(same, 0.0, az_f)
    az_b = np.where(same, 0.0, az_b)
    return az_f % 360.0, az_b % 360.0, dist
