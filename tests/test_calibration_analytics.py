"""Zhang calibration vs cv2.calibrateCamera; analytics row parity."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ransac_tpu import analytics
from ransac_tpu.models import calibration as calib
from ransac_tpu.ops import projection as proj
from ransac_tpu.ops.rotation import exp_so3


def synth_views(n_views=6, cols=9, rows=6, noise=0.1, seed=0,
                dist=(0.05, -0.02, 0.0, 0.0, 0.0)):
    rng = np.random.default_rng(seed)
    K = np.array([[820.0, 0, 400.0], [0, 810.0, 300.0], [0, 0, 1.0]])
    obj = calib.checkerboard_object_points(cols, rows, square=0.03)
    dist = np.asarray(dist)
    views = []
    poses = []
    for v in range(n_views):
        rvec = rng.normal(size=3) * np.array([0.3, 0.3, 0.15])
        t = np.array([-0.12, -0.09, 0.5]) + rng.normal(size=3) * 0.05
        R = np.asarray(exp_so3(jnp.asarray(rvec)))
        pix, z = proj.project_points(
            jnp.asarray(obj), jnp.asarray(R), jnp.asarray(t), jnp.asarray(K),
            jnp.asarray(dist))
        assert np.all(np.asarray(z) > 0)
        views.append(np.asarray(pix) + rng.normal(scale=noise, size=(obj.shape[0], 2)))
        poses.append((R, t))
    return K, dist, obj, np.stack(views), poses


@pytest.mark.slow
def test_zhang_matches_cv2():
    K_true, dist_true, obj, views, _ = synth_views()
    res = calib.calibrate_camera(jnp.asarray(obj, jnp.float32),
                                 jnp.asarray(views, jnp.float32))
    rms_cv, K_cv, dist_cv, _, _ = cv2.calibrateCamera(
        [obj.astype(np.float32)] * views.shape[0],
        [v.astype(np.float32).reshape(-1, 1, 2) for v in views],
        (800, 600), None, None)
    K_mine = np.asarray(res.K)
    # Focal lengths/principal point within 1% of truth and of cv2.
    assert abs(K_mine[0, 0] - K_true[0, 0]) / K_true[0, 0] < 0.01
    assert abs(K_mine[1, 1] - K_true[1, 1]) / K_true[1, 1] < 0.01
    assert abs(K_mine[0, 2] - K_true[0, 2]) < 8.0
    assert abs(K_mine[1, 2] - K_true[1, 2]) < 8.0
    assert float(res.rms) < max(3 * rms_cv, 0.5), (float(res.rms), rms_cv)
    # Distortion k1/k2 recovered.
    d = np.asarray(res.dist)
    assert abs(d[0] - dist_true[0]) < 0.02
    assert abs(d[1] - dist_true[1]) < 0.05


def test_undistort_points_matches_cv2():
    K = np.array([[820.0, 0, 400.0], [0, 810.0, 300.0], [0, 0, 1.0]])
    dist = np.array([0.08, -0.03, 1e-3, -2e-3, 0.005])
    pix = np.array([[100.0, 120.0], [400, 300], [700, 550], [30, 580]])
    mine = np.asarray(calib.undistort_points(
        jnp.asarray(pix), jnp.asarray(K), jnp.asarray(dist)))
    cv = cv2.undistortPoints(pix.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
    np.testing.assert_allclose(mine, cv, atol=0.05)


def test_bearing_matches_reference_formula():
    import math

    def ref_bearing(x1, y1, x2, y2):  # scalar transcription of §2.2 spec
        if x1 == 0 or x2 == 0 or y1 == 0 or y2 == 0:
            return 0
        deg = math.atan2(x2 - x1, y2 - y1) / math.pi * 180
        if deg < 0:
            deg = 360 + deg
        if deg < 180:
            deg = 180 - deg
        else:
            deg = 360 + 180 - deg
        return deg

    rng = np.random.default_rng(0)
    for _ in range(100):
        x1, y1, x2, y2 = rng.uniform(-50, 50, 4).round(1)
        got = float(analytics.calc_bearing(x1, y1, x2, y2))
        want = ref_bearing(x1, y1, x2, y2)
        assert abs(got - want) < 1e-9, (x1, y1, x2, y2, got, want)
    assert analytics.calc_bearing(0, 5, 3, 4) == 0


def test_correlate_features_rows():
    symbols = ["b", "a", "c", "a"]
    pos = np.array([[0.0, 0], [10, 0], [0, 10], [5, 5]])
    pix = np.array([[100.0, 100], [200, 100], [0, 0], [150, 150]])
    cpix = np.array([[101.0, 99], [201, 101], [90, 190], [149, 151]])
    rows = analytics.correlate_features(symbols, pos, pix, cpix)
    assert rows[0] == analytics.CORRELATION_HEADER
    # sorted symbols: a,a,b,c -> pairs with distinct symbols: (a,b)x2,
    # (a,c)x2, (b,c) = 5
    assert len(rows) - 1 == 5
    # dis_m for first pair is a euclidean distance > 0
    assert rows[1][17] > 0


def test_nearest_neighbor():
    pts = np.array([[0.0, 0], [3, 4], [10, 0]])
    d = analytics.nearest_neighbor_distances(pts)
    np.testing.assert_allclose(d, [5.0, 5.0, np.hypot(7, 4)])


def test_optimal_new_camera_matrix_matches_cv2():
    from ransac_tpu.models.calibration import optimal_new_camera_matrix

    K = np.array([[800.0, 0, 400.0], [0, 810.0, 300.0], [0, 0, 1.0]])
    dist = np.array([-0.25, 0.08, 1e-3, -1e-3, 0.0])
    for alpha in (0.0, 0.5, 1.0):
        newK, roi = optimal_new_camera_matrix(
            jnp.asarray(K), jnp.asarray(dist), (800, 600), alpha)
        K_cv, roi_cv = cv2.getOptimalNewCameraMatrix(K, dist, (800, 600),
                                                     alpha)
        nk = np.asarray(newK)
        assert abs(nk[0, 0] - K_cv[0, 0]) / K_cv[0, 0] < 0.01
        assert abs(nk[1, 1] - K_cv[1, 1]) / K_cv[1, 1] < 0.01
        assert abs(nk[0, 2] - K_cv[0, 2]) < 5.0
        assert abs(nk[1, 2] - K_cv[1, 2]) < 5.0
        assert abs(roi[0] - roi_cv[0]) <= 2 and abs(roi[1] - roi_cv[1]) <= 2
