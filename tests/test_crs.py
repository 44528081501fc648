"""CRS / geodesic parity (reference to_crs + pyproj.Geod.inv,
coastlines/vector.py:856-862, 1591; raster.py:206 EPSG:3577).

Oracles are INDEPENDENT of the implementation: numerically integrated
meridian arcs and ellipsoidal area elements, closed-form equator
geodesics, and the published WGS84 quarter meridian — never another
projection routine from the same module.
"""

from __future__ import annotations

import numpy as np
import pytest

from dea_coastlines_spark.geometry import crs, wkb
from dea_coastlines_spark.operators import reproject as rp


def _meridian_arc(lat_deg: float, n: int = 200001) -> float:
    phi = np.linspace(0.0, np.radians(lat_deg), n)
    m = crs.A * (1 - crs.E2) / (1 - crs.E2 * np.sin(phi) ** 2) ** 1.5
    return float(np.trapz(m, phi))


def test_quarter_meridian_known_value():
    # published WGS84 quarter meridian: 10 001 965.729 m
    assert abs(_meridian_arc(90.0) - 10001965.729) < 5e-3


@pytest.mark.parametrize("lat", [10.0, 45.0, 80.0])
def test_tm_northing_matches_integrated_meridian_arc(lat):
    _, n = crs.tm_forward(0.0, lat, lon0=0.0, k0=1.0, false_e=0.0, false_n=0.0)
    assert abs(float(n) - _meridian_arc(lat)) < 1e-5


def test_tm_utm_roundtrip_and_scale():
    lon = np.array([146.0, 147.9, 148.5])
    lat = np.array([-34.5, -20.1, -43.3])
    x, y = crs.tm_forward(lon, lat, lon0=147.0)
    lo, la = crs.tm_inverse(x, y, lon0=147.0)
    # 4th-order Krueger truncation: ~1e-8 deg (~1 mm) inside a zone
    assert np.abs(lo - lon).max() < 1e-8 and np.abs(la - lat).max() < 1e-8
    # scale at the central meridian is k0 = 0.9996 (centered difference
    # kills the O(h) discretization term)
    _, n1 = crs.tm_forward(147.0, -30.0 - 5e-5, lon0=147.0)
    _, n2 = crs.tm_forward(147.0, -30.0 + 5e-5, lon0=147.0)
    m = crs.A * (1 - crs.E2) / (1 - crs.E2 * np.sin(np.radians(-30.0)) ** 2) ** 1.5
    assert abs((float(n2) - float(n1)) / (m * np.radians(1e-4)) - 0.9996) < 1e-9


def test_utm_epsg_registry():
    # EPSG:32755 = UTM 55S: zone 55 -> lon0 147, south false northing
    x, y = crs.from_lonlat(147.0, -37.0, "EPSG:32755")
    assert abs(float(x) - 500000.0) < 1e-6
    assert 0.0 < float(y) < 10000000.0  # south: northing positive below equator
    lo, la = crs.to_lonlat(x, y, "EPSG:32755")
    assert abs(float(lo) - 147.0) < 1e-8 and abs(float(la) + 37.0) < 1e-8


def test_albers_3577_origin_and_roundtrip():
    x, y = crs.from_lonlat(132.0, 0.0, "EPSG:3577")
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    lon = np.array([115.0, 130.0, 145.0, 153.0])
    lat = np.array([-12.0, -25.0, -38.0, -43.0])
    bx, by = crs.from_lonlat(lon, lat, "EPSG:3577")
    lo, la = crs.to_lonlat(bx, by, "EPSG:3577")
    assert np.abs(lo - lon).max() < 1e-9 and np.abs(la - lat).max() < 1e-9


def test_albers_3577_is_equal_area():
    # planar shoelace area of a projected geodetic rectangle must equal
    # the numerically integrated ellipsoidal area (the defining
    # property; verified to ~1e-11 relative)
    lat0, lat1, lon0, lon1 = -31.0, -30.0, 140.0, 141.0
    phi = np.linspace(np.radians(lat0), np.radians(lat1), 4001)
    m = crs.A * (1 - crs.E2) / (1 - crs.E2 * np.sin(phi) ** 2) ** 1.5
    nr = crs.A / np.sqrt(1 - crs.E2 * np.sin(phi) ** 2)
    a_true = float(np.trapz(m * nr * np.cos(phi), phi)) * np.radians(lon1 - lon0)
    t = np.linspace(0, 1, 2001)[:-1]
    blon = np.concatenate([lon0 + t, np.full_like(t, lon1), lon1 - t, np.full_like(t, lon0)])
    blat = np.concatenate([np.full_like(t, lat0), lat0 + t, np.full_like(t, lat1), lat1 - t])
    bx, by = crs.from_lonlat(blon, blat, "EPSG:3577")
    a_proj = 0.5 * abs(float(np.sum(bx * np.roll(by, -1) - np.roll(bx, -1) * by)))
    assert abs(a_proj - a_true) / a_true < 1e-9


def test_webmerc_roundtrip_and_equator_scale():
    lon = np.array([0.0, 151.2, -70.0])
    lat = np.array([0.0, -33.9, 45.0])
    x, y = crs.from_lonlat(lon, lat, "EPSG:3857")
    lo, la = crs.to_lonlat(x, y, "EPSG:3857")
    assert np.abs(lo - lon).max() < 1e-12 and np.abs(la - lat).max() < 1e-9
    # on the equator, x = a * lon(rad) exactly
    assert abs(float(x[1]) - crs.A * np.radians(151.2)) < 1e-6


def test_vincenty_equator_closed_form():
    # the equator IS the geodesic between equatorial points: d = a * dlon
    _, _, d = crs.geodesic_inverse(0.0, 0.0, 1.0, 0.0)
    assert abs(float(d) - crs.A * np.radians(1.0)) < 1e-3
    azf, azb, _ = crs.geodesic_inverse(0.0, 0.0, 1.0, 0.0)
    # pyproj convention: back azimuth points WEST, back toward point 1
    assert abs(float(azf) - 90.0) < 1e-9 and abs(float(azb) - 270.0) < 1e-9


def test_vincenty_meridian_matches_integrated_arc():
    for lat in (1.0, 30.0, 60.0):
        _, _, d = crs.geodesic_inverse(0.0, 0.0, 0.0, lat)
        assert abs(float(d) - _meridian_arc(lat)) < 1e-3
    azf, _, _ = crs.geodesic_inverse(0.0, 0.0, 0.0, 30.0)
    assert abs(float(azf)) < 1e-9  # due north


def test_vincenty_symmetry_and_vectorized():
    a1, b1, d1 = crs.geodesic_inverse(10.0, 50.0, 20.0, 40.0)
    a2, b2, d2 = crs.geodesic_inverse(20.0, 40.0, 10.0, 50.0)
    assert abs(float(d1) - float(d2)) < 1e-6
    # back azimuth of one leg is the forward azimuth of the reverse
    assert abs(float(b1) - float(a2)) % 360.0 < 1e-6
    lons = np.array([0.0, 10.0, 100.0])
    lats = np.array([0.0, 10.0, -30.0])
    _, _, dv = crs.geodesic_inverse(lons, lats, lons + 1.0, lats + 1.0)
    assert dv.shape == (3,) and (dv > 0).all()


def test_vincenty_coincident_points():
    azf, azb, d = crs.geodesic_inverse(151.0, -33.0, 151.0, -33.0)
    assert float(d) == 0.0 and float(azf) == 0.0


def test_transform_xy_chain():
    # 3577 -> 32755 -> 3577 closes to sub-mm
    x = np.array([1_200_000.0, -800_000.0])
    y = np.array([-3_800_000.0, -3_200_000.0])
    ux, uy = crs.transform_xy(x, y, "EPSG:3577", "EPSG:32755")
    bx, by = crs.transform_xy(ux, uy, "EPSG:32755", "EPSG:3577")
    assert np.abs(bx - x).max() < 1e-3 and np.abs(by - y).max() < 1e-3


# ------------------------------------------------------------ Spark plumbing


def test_reproject_wkb_all_types(spark):
    sq = np.array([[148.0, -35.0], [148.1, -35.0], [148.1, -34.9],
                   [148.0, -34.9], [148.0, -35.0]])
    hole = sq * 0.2 + np.array([148.04, -34.97]) * 0.8
    geoms = [
        wkb.point(148.05, -34.95),
        wkb.linestring(sq[:3]),
        wkb.polygon(sq, [hole[::-1]]),
        wkb.multilinestring([sq[:3], sq[2:]]),
        wkb.multipolygon([wkb.polygon(sq), wkb.polygon(sq + 0.5)]),
    ]
    df = spark.createDataFrame(
        [(i, g) for i, g in enumerate(geoms)], "id long, geometry binary"
    )
    out = rp.reproject(df, "EPSG:4326", "EPSG:3577").orderBy("id").toPandas()
    for i, g in enumerate(geoms):
        want = crs.from_lonlat(
            wkb.coords_of(g)[:, 0], wkb.coords_of(g)[:, 1], "EPSG:3577"
        )
        got = wkb.coords_of(bytes(out.geometry[i]))
        assert np.allclose(got[:, 0], want[0], atol=1e-6)
        assert np.allclose(got[:, 1], want[1], atol=1e-6)
        assert wkb.geom_type(bytes(out.geometry[i])) == wkb.geom_type(g)


def test_uid_lonlat_true_crs():
    # rates/hotspots uid path: EPSG:3577 planar coords -> true lon/lat
    # (reference-comparable geohash uids, vector.py:1591)
    from dea_coastlines_spark.operators.rates import _uid_lonlat

    lon = np.array([133.0, 147.5])
    lat = np.array([-20.0, -42.0])
    x, y = crs.from_lonlat(lon, lat, "EPSG:3577")
    glat, glon = _uid_lonlat(x, y, "EPSG:3577")
    assert np.allclose(glat, lat, atol=1e-9) and np.allclose(glon, lon, atol=1e-9)
    plat, plon = _uid_lonlat(x, y, None)  # pseudo-projection unchanged
    assert np.allclose(plat, y * 1e-5) and np.allclose(plon, x * 1e-5)


def test_project_points_and_geodesic_columns(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2],
            "lon1": [151.2, 144.96, 115.86],
            "lat1": [-33.87, -37.81, -31.95],
            "lon2": [144.96, 115.86, 151.2],
            "lat2": [-37.81, -31.95, -33.87],
        }
    )
    df = spark.createDataFrame(pdf)
    out = rp.with_geodesic(
        rp.project_points(df, "lon1", "lat1", "EPSG:3577"),
        "lon1", "lat1", "lon2", "lat2",
    ).orderBy("id").toPandas()
    wx, wy = crs.from_lonlat(pdf.lon1.to_numpy(), pdf.lat1.to_numpy(), "EPSG:3577")
    assert np.allclose(out.x, wx) and np.allclose(out.y, wy)
    _, _, wd = crs.geodesic_inverse(
        pdf.lon1.to_numpy(), pdf.lat1.to_numpy(),
        pdf.lon2.to_numpy(), pdf.lat2.to_numpy(),
    )
    assert np.allclose(out.geo_dist_m, wd)
    # SYD-MEL geodesic is ~713 km; sanity-band the first row
    assert 680_000 < out.geo_dist_m[0] < 740_000
