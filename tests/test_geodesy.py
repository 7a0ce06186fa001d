"""Geodesy validation.

Oracle 1: the reference hard-codes 12 pyproj-produced UTM-50N coordinates
(``/root/reference/testpro-K.py:198-211``) for features whose WGS84 lon/lat
live in feature_points_with_annotations.csv.  Each oracle point must sit
within 1 cm of *some* converted CSV row — independent PROJ ground truth for
our Krüger-series implementation (the oracle itself is rounded at mm-cm
level; measured agreement is <= 5 mm on all 12).

Oracle 2: on the central meridian the northing equals k0 times the meridian
arc length, computed here by direct numerical integration of the meridian
curvature radius (independent of any series expansion).
"""

import csv
import os

import numpy as np
import pytest
from scipy.integrate import quad

from ransac_tpu.ops import geodesy
from tests.conftest import REFERENCE_DIR, reference_available

# pyproj UTM-50N (E, N) pairs hard-coded in the reference (testpro-K.py).
PYPROJ_ORACLE = np.array([
    (739031.2, 2888840.39),
    (738995.929, 2888848.16),
    (738963.052, 2888845.45),
    (739173.616, 2888834.91),
    (739077.689, 2888935.68),
    (739033.253, 2888924.78),
    (738973.016, 2888907.82),
    (739136.184, 2889025.65),
    (739179.948, 2888631.85),
    (739140.769, 2888574.49),
    (739312.871, 2888549.5),
    (739249.159, 2888541.79),
])


def _load_reference_lonlat():
    path = os.path.join(REFERENCE_DIR, "feature_points_with_annotations.csv")
    with open(path, encoding="utf-8-sig") as f:
        rows = list(csv.reader(f))
    return np.array(
        [[float(r[4]), float(r[5])] for r in rows[1:] if r and r[0].strip()]
    )


@pytest.mark.skipif(not reference_available(), reason="reference data absent")
def test_forward_matches_pyproj_oracle():
    lonlat = _load_reference_lonlat()
    e, n = geodesy.wgs84_to_utm(lonlat[:, 0], lonlat[:, 1])
    mine = np.stack([e, n], axis=1)
    for oracle in PYPROJ_ORACLE:
        d = np.linalg.norm(mine - oracle, axis=1).min()
        assert d < 0.01, (oracle, d)


@pytest.mark.skipif(not reference_available(), reason="reference data absent")
def test_inverse_matches_pyproj_oracle():
    lonlat = _load_reference_lonlat()
    for e_ref, n_ref in PYPROJ_ORACLE:
        lon, lat = geodesy.utm_to_wgs84(e_ref, n_ref)
        # ~1 cm of rounding in the oracle ~ 1e-7 deg.
        d = np.abs(lonlat - [lon, lat]).max(axis=1).min()
        assert d < 2e-7, (e_ref, n_ref, d)


def test_central_meridian_against_numerical_integration():
    e2 = geodesy._E2
    a = geodesy.A_WGS84

    def meridian_radius(phi):
        return a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5

    for lat in [0.0, 12.3, 26.1, 45.0, 63.5]:
        arc, _ = quad(meridian_radius, 0.0, np.radians(lat), epsabs=1e-10)
        e, n = geodesy.wgs84_to_utm(117.0, lat)
        assert abs(e - 500000.0) < 1e-6
        assert abs(n - geodesy.K0_UTM * arc) < 1e-3


def test_round_trip_f64_grid():
    lon = np.linspace(114.2, 119.8, 23)
    lat = np.linspace(-70.0, 70.0, 29)
    LON, LAT = np.meshgrid(lon, lat)
    e, n = geodesy.wgs84_to_utm(LON, LAT)
    lon2, lat2 = geodesy.utm_to_wgs84(e, n)
    np.testing.assert_allclose(lon2, LON, atol=1e-9)
    np.testing.assert_allclose(lat2, LAT, atol=1e-9)


def test_east_west_symmetry():
    e_east, n_east = geodesy.wgs84_to_utm(118.5, 26.0)
    e_west, n_west = geodesy.wgs84_to_utm(115.5, 26.0)
    assert abs((e_east - 500000.0) + (e_west - 500000.0)) < 1e-6
    assert abs(n_east - n_west) < 1e-6


def test_jax_flavor_matches_numpy():
    import jax.numpy as jnp  # noqa: F401

    lon = np.array([119.390, 119.4, 119.37])
    lat = np.array([26.0936, 26.098, 26.11])
    e64, n64 = geodesy.wgs84_to_utm(lon, lat)
    e32, n32 = geodesy.wgs84_to_utm_jax(
        jnp.asarray(lon, jnp.float32), jnp.asarray(lat, jnp.float32)
    )
    # float32 device math: meter-level agreement is the contract (device
    # paths use scene-centered coords; absolute UTM stays on host in f64).
    np.testing.assert_allclose(np.asarray(e32), e64, atol=1.0)
    np.testing.assert_allclose(np.asarray(n32), n64, atol=1.0)


def test_southern_hemisphere_false_northing():
    e, n = geodesy.wgs84_to_utm(117.0, -10.0, northern=False)
    assert n > 8_000_000
    lon, lat = geodesy.utm_to_wgs84(e, n, northern=False)
    assert abs(lon - 117.0) < 1e-9
    assert abs(lat + 10.0) < 1e-9


def test_scene_frame_centering_precision():
    pts = np.array([
        [739031.2, 2888840.39, 726.0],
        [739312.871, 2888549.5, 720.0],
        [738963.052, 2888845.45, 721.0],
    ])
    frame = geodesy.SceneFrame.from_points(pts)
    local = frame.center(pts)
    assert local.dtype == np.float32
    assert np.abs(local).max() < 1000.0
    back = frame.uncenter(local)
    # f32 centered round-trip keeps sub-mm precision; raw f32 UTM would not.
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_geo_transformer_api_parity():
    tr = geodesy.GeoTransformer()
    e, n = tr.wgs84_to_utm(119.389032, 26.09825)
    lon, lat = tr.utm_to_wgs84(e, n)
    assert abs(lon - 119.389032) < 1e-9
    assert abs(lat - 26.09825) < 1e-9
