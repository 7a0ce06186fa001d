"""RANSAC engine: planted-outlier property tests (SURVEY.md §4 item 3) and
OpenCV behavioral parity."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ransac_tpu.models import ransac as R
from ransac_tpu.ops import homography, projection, rotation
from ransac_tpu.utils.config import RansacConfig

# Compile-heavy module: excluded from the quick loop (pytest -m 'not slow');
# the default no-filter run still includes it.
pytestmark = pytest.mark.slow


def planted_homography(seed, n=40, outlier_frac=0.3, noise=0.5):
    rng = np.random.default_rng(seed)
    H = np.array([[1.1, 0.05, 20.0], [-0.03, 0.97, -8.0], [1e-4, -5e-5, 1.0]])
    src = rng.uniform(0, 500, size=(n, 2))
    dst = np.array(homography.apply_h(jnp.asarray(H), jnp.asarray(src)))
    dst += rng.normal(scale=noise, size=dst.shape)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    dst[out_idx] += rng.uniform(50, 300, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    inl_true = np.ones(n, bool)
    inl_true[out_idx] = False
    return src, dst, H, inl_true


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
def test_homography_ransac_recovers_planted(outlier_frac):
    src, dst, H_true, inl_true = planted_homography(1, outlier_frac=outlier_frac)
    cfg = RansacConfig(threshold=5.0, num_hypotheses=2048, exhaustive=False)
    res = R.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
        cfg, jax.random.key(0))
    got = np.asarray(res.inlier_mask)
    # All true inliers found, no planted outlier admitted.
    assert (got & ~inl_true).sum() == 0
    assert got[inl_true].mean() > 0.95
    pred = np.asarray(homography.apply_h(res.model, jnp.asarray(src[inl_true])))
    err = np.linalg.norm(pred - np.asarray(
        homography.apply_h(jnp.asarray(H_true), jnp.asarray(src[inl_true]))), axis=1)
    assert err.mean() < 2.0


def test_homography_ransac_exhaustive_small_n():
    src, dst, H_true, inl_true = planted_homography(2, n=12, outlier_frac=0.25)
    cfg = RansacConfig(threshold=5.0, exhaustive=True)  # C(12,4)=495 samples
    res = R.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
        cfg, jax.random.key(0))
    assert res.num_hypotheses == 495
    got = np.asarray(res.inlier_mask)
    assert (got & ~inl_true).sum() == 0
    assert got[inl_true].all()


def test_homography_ransac_matches_cv2_inliers():
    """Same data, same threshold: inlier sets should agree with OpenCV's
    (both find the planted consensus set)."""
    src, dst, H_true, inl_true = planted_homography(3, n=30, outlier_frac=0.3)
    H_cv, mask_cv = cv2.findHomography(src, dst, cv2.RANSAC, 5.0)
    cfg = RansacConfig(threshold=5.0, num_hypotheses=4096, exhaustive=True)
    res = R.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
        cfg, jax.random.key(1))
    got = np.asarray(res.inlier_mask)
    agree = (got == mask_cv.ravel().astype(bool)).mean()
    assert agree > 0.9


def test_homography_ransac_respects_point_mask():
    src, dst, H_true, inl_true = planted_homography(4, n=20, outlier_frac=0.2)
    mask = np.ones(20)
    mask[:5] = 0.0  # excluded points must never be inliers
    cfg = RansacConfig(threshold=5.0)
    res = R.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
        cfg, jax.random.key(0))
    got = np.asarray(res.inlier_mask)
    assert not got[:5].any()


def planted_pnp(seed, n=30, outlier_frac=0.3):
    rng = np.random.default_rng(seed)
    rvec = rng.normal(size=3) * 0.3
    Rm = np.asarray(rotation.exp_so3(jnp.asarray(rvec)))
    t = np.array([0.2, -0.1, 6.0])
    X = rng.uniform(-2, 2, size=(n, 3)) * np.array([1, 1, 0.5])
    K = np.array([[900.0, 0, 400.0], [0, 900.0, 300.0], [0, 0, 1.0]])
    pix, z = projection.project_points(
        jnp.asarray(X), jnp.asarray(Rm), jnp.asarray(t), jnp.asarray(K))
    pix = np.array(pix)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    pix[out_idx] += rng.uniform(80, 300, size=(n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    inl_true = np.ones(n, bool)
    inl_true[out_idx] = False
    return X, pix, K, Rm, t, inl_true


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3])
def test_pnp_ransac_recovers_planted(outlier_frac):
    X, pix, K, R_true, t_true, inl_true = planted_pnp(5, outlier_frac=outlier_frac)
    cfg = RansacConfig(threshold=8.0, num_hypotheses=2048, exhaustive=True)
    res = R.ransac_pnp(
        jnp.asarray(X), jnp.asarray(pix), jnp.asarray(K),
        jnp.ones(len(X)), cfg, jax.random.key(0))
    Rm, t = R.pnp_pose_from_result(res)
    got = np.asarray(res.inlier_mask)
    assert (got & ~inl_true).sum() == 0
    assert got[inl_true].mean() > 0.9
    np.testing.assert_allclose(np.asarray(Rm), R_true, atol=1e-2)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=5e-2)


def test_pnp_ransac_matches_cv2_pose():
    X, pix, K, R_true, t_true, inl_true = planted_pnp(6, n=25, outlier_frac=0.25)
    ok, rvec_cv, t_cv, inl_cv = cv2.solvePnPRansac(
        X, pix, K, np.zeros(4), iterationsCount=5000,
        reprojectionError=8.0, confidence=0.999)
    assert ok
    cfg = RansacConfig(threshold=8.0, exhaustive=True)  # C(25,3)=2300
    res = R.ransac_pnp(
        jnp.asarray(X), jnp.asarray(pix), jnp.asarray(K),
        jnp.ones(len(X)), cfg, jax.random.key(0))
    Rm, t = R.pnp_pose_from_result(res)
    R_cv, _ = cv2.Rodrigues(rvec_cv)
    # Same pose as OpenCV (both converge to ground truth).
    np.testing.assert_allclose(np.asarray(Rm), R_cv, atol=2e-2)
    np.testing.assert_allclose(np.asarray(t), t_cv.ravel(), atol=1e-1)


def test_essential_ransac_planted():
    rng = np.random.default_rng(7)
    n = 60
    Xw = rng.uniform(-1, 1, size=(n, 3)) * np.array([2, 2, 1]) + [0, 0, 5]
    Rm = np.asarray(rotation.exp_so3(jnp.asarray(rng.normal(size=3) * 0.1)))
    t = np.array([1.0, 0.05, 0.1]); t /= np.linalg.norm(t)
    x1 = Xw[:, :2] / Xw[:, 2:]
    Xc2 = Xw @ Rm.T + t
    x2 = np.array(Xc2[:, :2] / Xc2[:, 2:])
    out_idx = rng.choice(n, 15, replace=False)
    x2[out_idx] += rng.uniform(0.05, 0.3, size=(15, 2)) * rng.choice([-1, 1], (15, 2))
    inl_true = np.ones(n, bool); inl_true[out_idx] = False

    cfg = RansacConfig(threshold=1e-5, num_hypotheses=4096, exhaustive=False)
    res = R.ransac_essential(
        jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n), cfg, jax.random.key(0))
    got = np.asarray(res.inlier_mask)
    assert got[inl_true].mean() > 0.9
    assert (got & ~inl_true).sum() <= 1

    from ransac_tpu.ops import epipolar
    R2, t2, _, ncheiral = epipolar.recover_pose(
        res.model, jnp.asarray(x1), jnp.asarray(x2),
        jnp.asarray(inl_true.astype(np.float32)))
    # f32 8-point accuracy: a couple of degrees; BA polishes downstream.
    ang = float(rotation.geodesic_distance(R2, jnp.asarray(Rm)))
    assert ang < 0.05, ang
    assert abs(float(jnp.abs(t2 @ jnp.asarray(t)))) > 0.995


def test_ransac_deterministic_exhaustive():
    src, dst, _, _ = planted_homography(8, n=12)
    cfg = RansacConfig(threshold=5.0, exhaustive=True)
    r1 = R.ransac_homography(jnp.asarray(src), jnp.asarray(dst),
                             jnp.ones(12), cfg, jax.random.key(0))
    r2 = R.ransac_homography(jnp.asarray(src), jnp.asarray(dst),
                             jnp.ones(12), cfg, jax.random.key(99))
    # Exhaustive mode ignores the key entirely -> bitwise identical.
    np.testing.assert_array_equal(np.asarray(r1.model), np.asarray(r2.model))
    np.testing.assert_array_equal(np.asarray(r1.inlier_mask),
                                  np.asarray(r2.inlier_mask))


def _reference_K():
    """The reference camera (main_v1.py:869-883): 240 mm lens on 127x178 mm
    film, 2142x1620 px -> fx/fy = 1.85 (strongly anisotropic)."""
    W, H = 2142, 1620
    fx = 240.0 / 127.0 * W
    fy = 240.0 / 178.0 * H
    return np.array([[fx, 0.0, W / 2], [0.0, fy, H / 2], [0, 0, 1.0]])


def _anisotropic_scene(seed=42):
    """Planted pose under the reference K with three point classes:
    exact inliers, points displaced 24 px along +y (INSIDE the 30 px pixel
    bound but OUTSIDE the old mean-focal y-bound of ~21 px), and gross
    outliers."""
    rng = np.random.default_rng(seed)
    K = _reference_K()
    R_true = np.asarray(rotation.exp_so3(jnp.asarray([0.1, -0.07, 0.03])))
    t_true = np.array([0.2, -0.1, 30.0])
    n = 24
    X = rng.uniform(-3, 3, (n, 3)) * np.array([1.5, 1.5, 0.4])
    pix, _ = projection.project_points(
        jnp.asarray(X), jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray(K))
    pix = np.array(pix)
    pix[12:18, 1] += 24.0          # y-borderline: pixel-true inliers
    pix[18:22] += 200.0            # gross outliers
    expect = np.ones(n, bool)
    expect[18:22] = False
    return X, pix, K, expect


def test_pnp_pixel_true_threshold_anisotropic_K():
    """VERDICT r1 #3: cv2.solvePnPRansac thresholds in PIXELS
    (main_v1.py:497-502); under the reference's fx/fy = 1.85 camera the
    bound must stay 30 px on BOTH axes.  Asserts inlier-set equality with
    cv2 and that the y-displaced points are classified as inliers (the old
    mean-focal scaling rejected them at ~21 px effective y-bound)."""
    X, pix, K, expect = _anisotropic_scene()
    ok, rvec_cv, t_cv, inl_cv = cv2.solvePnPRansac(
        X, pix, K, np.zeros(4), iterationsCount=5000,
        reprojectionError=30.0, confidence=0.999)
    assert ok
    mask_cv = np.zeros(len(X), bool)
    mask_cv[np.asarray(inl_cv).ravel()] = True

    cfg = RansacConfig(threshold=30.0, exhaustive=True)  # C(24,3)=2024
    res = R.ransac_pnp(
        jnp.asarray(X, jnp.float32), jnp.asarray(pix, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.ones(len(X)), cfg,
        jax.random.key(0))
    got = np.asarray(res.inlier_mask)
    np.testing.assert_array_equal(got, mask_cv)
    np.testing.assert_array_equal(got, expect)


def test_pnp_sweep_pixel_true_threshold_anisotropic_K():
    """Same pixel-true bound through BOTH fused sweep kernels: the 16-pt
    packed-index kernel and the large-N counter-replay kernel."""
    X, pix, K, expect = _anisotropic_scene()
    cfg = RansacConfig(threshold=30.0, num_hypotheses=4096)
    # Large kernel (n=24 > 16 auto-routes).
    res = R.ransac_pnp_sweep(
        jnp.asarray(X, jnp.float32), jnp.asarray(pix, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.ones(len(X)), cfg, 7,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(res.inlier_mask), expect)
    # 16-pt kernel on the first 16 points (12 exact + 4 y-borderline).
    res16 = R.ransac_pnp_sweep(
        jnp.asarray(X[:16], jnp.float32), jnp.asarray(pix[:16], jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.ones(16), cfg, 7,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(res16.inlier_mask), expect[:16])


def test_epnp_solver_matches_p3p(outlier_frac=0.3):
    """VERDICT r1 #9: EPnP wired into the engine as the 6-pt solver option
    — recovers the same planted pose and inlier set as the P3P path."""
    from ransac_tpu.ops.rotation import geodesic_distance

    X, pix, K, R_true, t_true, inl_true = planted_pnp(
        31, n=20, outlier_frac=outlier_frac)
    cfg = RansacConfig(threshold=8.0, num_hypotheses=2048, exhaustive=False)
    res_ep = R.ransac_pnp(
        jnp.asarray(X), jnp.asarray(pix), jnp.asarray(K),
        jnp.ones(len(X)), cfg, jax.random.key(3), solver="epnp")
    res_p3 = R.ransac_pnp(
        jnp.asarray(X), jnp.asarray(pix), jnp.asarray(K),
        jnp.ones(len(X)), cfg, jax.random.key(3), solver="p3p")
    got_ep = np.asarray(res_ep.inlier_mask)
    got_p3 = np.asarray(res_p3.inlier_mask)
    assert (got_ep & ~inl_true).sum() == 0
    assert got_ep[inl_true].mean() > 0.9
    np.testing.assert_array_equal(got_ep, got_p3)
    R_ep, t_ep = R.pnp_pose_from_result(res_ep)
    ang = float(geodesic_distance(R_ep, jnp.asarray(R_true)))
    assert ang < 0.01, ang
    np.testing.assert_allclose(np.asarray(t_ep), t_true, atol=5e-2)


def test_epnp_direct_exact_recovery():
    """ops.pnp.epnp recovers an exact pose from clean correspondences
    (one of the two beta cases must nail it)."""
    from ransac_tpu.ops import pnp as pnp_ops
    from ransac_tpu.ops.rotation import exp_so3, geodesic_distance

    rng = np.random.default_rng(5)
    R_true = np.asarray(exp_so3(jnp.asarray([0.2, -0.15, 0.1])))
    t_true = np.array([0.4, -0.3, 6.0])
    X = rng.uniform(-2, 2, (10, 3)) * np.array([1, 1, 0.5])
    Xc = X @ R_true.T + t_true
    pix_n = Xc[:, :2] / Xc[:, 2:]
    Re, te, valid = pnp_ops.epnp(jnp.asarray(X), jnp.asarray(pix_n))
    angs = [float(geodesic_distance(Re[i], jnp.asarray(R_true)))
            for i in range(2)]
    errs = [np.linalg.norm(np.asarray(te[i]) - t_true) for i in range(2)]
    k = int(np.argmin(errs))
    assert bool(valid[k])
    assert angs[k] < 1e-3, angs
    assert errs[k] < 1e-2, errs
