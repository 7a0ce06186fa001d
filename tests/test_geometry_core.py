"""Analytic unit tests for homography / PnP / epipolar / LM kernels
(SURVEY.md §4 item 1): synthetic cameras with known ground truth must be
recovered exactly (or to f32 tolerance), including under vmap."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ransac_tpu.ops import epipolar, homography, linalg, lm, pnp, projection, rotation


# ---------------------------------------------------------------- helpers
def synth_pose(seed=0, n=24, noise=0.0):
    rng = np.random.default_rng(seed)
    rvec = rng.normal(size=3) * 0.4
    R = np.asarray(rotation.exp_so3(jnp.asarray(rvec)))
    t = np.array([0.3, -0.2, 4.0]) + rng.normal(size=3) * 0.1
    X = rng.uniform(-1.0, 1.0, size=(n, 3)) * np.array([2.0, 2.0, 1.0])
    K = np.array([[800.0, 0, 320.0], [0, 820.0, 240.0], [0, 0, 1.0]])
    pix, z = projection.project_points(
        jnp.asarray(X), jnp.asarray(R), jnp.asarray(t), jnp.asarray(K))
    pix = np.asarray(pix) + rng.normal(size=(n, 2)) * noise
    assert np.all(np.asarray(z) > 0)
    return X, pix, K, R, t


# ------------------------------------------------------------- projection
def test_project_points_matches_cv2():
    X, pix, K, R, t = synth_pose(0)
    rvec, _ = cv2.Rodrigues(R)
    cv_pix, _ = cv2.projectPoints(X, rvec, t.reshape(3, 1), K, None)
    np.testing.assert_allclose(pix, cv_pix[:, 0, :], atol=1e-3)


def test_distortion_round_trip():
    dist = jnp.array([-0.2, 0.05, 1e-3, -5e-4, 0.01])
    xn = jnp.linspace(-0.4, 0.4, 11)
    yn = jnp.linspace(-0.3, 0.3, 11)
    xd, yd = projection.distort(xn, yn, dist)
    xu, yu = projection.undistort_normalized(xd, yd, dist)
    np.testing.assert_allclose(np.asarray(xu), np.asarray(xn), atol=1e-6)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yn), atol=1e-6)


def test_pixel_to_ray_geometry():
    X, pix, K, R, t = synth_pose(1, n=8)
    C = np.asarray(projection.camera_origin_from_pose(
        jnp.asarray(R), jnp.asarray(t)))
    rays = np.asarray(projection.pixel_to_ray(
        jnp.asarray(pix), jnp.asarray(K), jnp.asarray(R)))
    # Each ray from C must pass through its world point.
    d = X - C
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    np.testing.assert_allclose(rays, d, atol=1e-4)


# ------------------------------------------------------------- quartic
def test_quartic_known_roots():
    # (x-1)(x+2)(x-3)(x+0.5) = 0
    roots_true = np.array([1.0, -2.0, 3.0, -0.5])
    c = np.poly(roots_true)  # leading-first
    roots, ok = linalg.solve_quartic_real(*[jnp.asarray(v) for v in c])
    got = np.sort(np.asarray(roots)[np.asarray(ok)])
    np.testing.assert_allclose(got, np.sort(roots_true), atol=1e-4)


def test_quartic_two_real_roots():
    # (x-2)(x+1)(x^2+1): two real roots only
    c = np.poly([2.0, -1.0, 1j, -1j]).real
    roots, ok = linalg.solve_quartic_real(*[jnp.asarray(v) for v in c])
    got = np.sort(np.asarray(roots)[np.asarray(ok)])
    np.testing.assert_allclose(got, [-1.0, 2.0], atol=1e-4)


def test_quartic_batched_random_poly():
    rng = np.random.default_rng(5)
    all_roots = rng.uniform(-3, 3, size=(64, 4))
    coeffs = np.array([np.poly(r) for r in all_roots])
    roots, ok = jax.vmap(linalg.solve_quartic_real)(
        *[jnp.asarray(coeffs[:, i]) for i in range(5)])
    roots = np.asarray(roots)
    ok = np.asarray(ok)
    matched = 0
    for i in range(64):
        got = np.sort(roots[i][ok[i]])
        assert got.shape == (4,)
        # Every returned root must satisfy the polynomial to f32 conditioning
        resid = np.abs(np.polyval(coeffs[i], got))
        scale = np.abs(coeffs[i]).max() * (1 + np.abs(got)) ** 4
        assert np.all(resid / scale < 1e-5)
        if np.allclose(got, np.sort(all_roots[i]), atol=2e-2):
            matched += 1
    assert matched >= 60  # clustered roots are ill-conditioned in f32


# ------------------------------------------------------------- homography
def test_dlt_homography_exact_minimal():
    rng = np.random.default_rng(7)
    H_true = np.eye(3) + rng.normal(scale=0.2, size=(3, 3))
    H_true /= H_true[2, 2]
    src = rng.uniform(-1, 1, size=(4, 2))
    dst = np.asarray(homography.apply_h(jnp.asarray(H_true), jnp.asarray(src)))
    H = np.asarray(homography.dlt_homography(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(H, H_true, atol=1e-4)


def test_dlt_homography_overdetermined_weighted():
    rng = np.random.default_rng(8)
    H_true = np.array([[1.1, 0.02, 0.3], [-0.05, 0.95, -0.2], [1e-3, -2e-3, 1.0]])
    src = rng.uniform(-2, 2, size=(24, 2))
    dst = np.array(homography.apply_h(jnp.asarray(H_true), jnp.asarray(src)))
    # Corrupt the last 6 points, mask them out via weights.
    dst[18:] += 5.0
    w = np.ones(24)
    w[18:] = 0.0
    H = np.asarray(homography.dlt_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)))
    np.testing.assert_allclose(H, H_true, atol=1e-4)


def test_homography_matches_cv2_lsq():
    rng = np.random.default_rng(9)
    H_true = np.array([[1.2, 0.1, 10.0], [0.05, 0.9, -4.0], [1e-4, 2e-4, 1.0]])
    src = rng.uniform(0, 100, size=(30, 2))
    dst = np.array(homography.apply_h(jnp.asarray(H_true), jnp.asarray(src)))
    dst += rng.normal(scale=0.5, size=dst.shape)
    H_cv, _ = cv2.findHomography(src, dst, 0)
    H = np.asarray(homography.dlt_homography(jnp.asarray(src), jnp.asarray(dst)))
    pred_cv = np.asarray(homography.apply_h(jnp.asarray(H_cv), jnp.asarray(src)))
    pred = np.asarray(homography.apply_h(jnp.asarray(H), jnp.asarray(src)))
    # Same quality as OpenCV's least-squares fit.
    assert np.linalg.norm(pred - dst, axis=1).mean() <= \
        np.linalg.norm(pred_cv - dst, axis=1).mean() * 1.05


def test_degenerate_sample_detection():
    good = jnp.asarray([[0.0, 0], [1, 0], [0, 1], [1, 1]])
    bad = jnp.asarray([[0.0, 0], [1, 1], [2, 2], [0, 1]])
    assert not bool(homography.sample_is_degenerate(good))
    assert bool(homography.sample_is_degenerate(bad))


# ------------------------------------------------------------- P3P / PnP
def test_p3p_recovers_pose():
    X, pix, K, R_true, t_true = synth_pose(11, n=3)
    xn = projection.normalize_pixels(jnp.asarray(pix), jnp.asarray(K))
    R, t, valid = pnp.p3p_grunert(jnp.asarray(X), xn)
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    assert valid.any()
    errs = []
    for k in range(4):
        if valid[k]:
            errs.append(np.abs(R[k] - R_true).max() + np.abs(t[k] - t_true).max())
    assert min(errs) < 1e-3


def test_p3p_vmapped_many():
    rng = np.random.default_rng(12)
    n_prob = 64
    Xs, xns, Rts = [], [], []
    for i in range(n_prob):
        X, pix, K, R, t = synth_pose(100 + i, n=3)
        Xs.append(X)
        xns.append(np.asarray(projection.normalize_pixels(
            jnp.asarray(pix), jnp.asarray(K))))
        Rts.append((R, t))
    R, t, valid = jax.vmap(pnp.p3p_grunert)(
        jnp.asarray(np.stack(Xs)), jnp.asarray(np.stack(xns)))
    R, t, valid = np.asarray(R), np.asarray(t), np.asarray(valid)
    ok = 0
    for i in range(n_prob):
        best = np.inf
        for k in range(4):
            if valid[i, k]:
                best = min(best, np.abs(R[i, k] - Rts[i][0]).max()
                           + np.abs(t[i, k] - Rts[i][1]).max())
        ok += best < 1e-2
    assert ok >= n_prob * 0.95  # rare near-degenerate configs may fail


def test_epnp_recovers_pose():
    X, pix, K, R_true, t_true = synth_pose(13, n=12)
    xn = projection.normalize_pixels(jnp.asarray(pix), jnp.asarray(K))
    R, t, valid = pnp.epnp(jnp.asarray(X), xn)
    R, t = np.asarray(R), np.asarray(t)
    errs = [np.abs(R[k] - R_true).max() + np.abs(t[k] - t_true).max()
            for k in range(R.shape[0])]
    assert min(errs) < 5e-2


def test_dlt_pnp_recovers_pose():
    X, pix, K, R_true, t_true = synth_pose(14, n=16)
    xn = projection.normalize_pixels(jnp.asarray(pix), jnp.asarray(K))
    R, t = pnp.dlt_pnp(jnp.asarray(X), xn)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-2)


def test_absolute_orientation():
    rng = np.random.default_rng(15)
    R_true = np.asarray(rotation.exp_so3(jnp.asarray(rng.normal(size=3))))
    t_true = rng.normal(size=3) * 3
    Xw = rng.normal(size=(10, 3))
    Xc = Xw @ R_true.T + t_true
    R, t = pnp.absolute_orientation(jnp.asarray(Xw), jnp.asarray(Xc))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-5)


# ------------------------------------------------------------- LM
def test_lm_refine_pose_from_perturbed():
    X, pix, K, R_true, t_true = synth_pose(16, n=20, noise=0.0)
    rvec_true = np.asarray(rotation.log_so3(jnp.asarray(R_true)))
    rng = np.random.default_rng(17)
    rvec0 = rvec_true + rng.normal(scale=0.05, size=3)
    t0 = t_true + rng.normal(scale=0.2, size=3)
    rvec, t, res = lm.refine_pose(
        jnp.asarray(rvec0), jnp.asarray(t0), jnp.asarray(X),
        jnp.asarray(pix), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(rvec), rvec_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-3)
    assert float(res.cost) < 1e-6


def test_lm_refine_homography():
    rng = np.random.default_rng(18)
    H_true = np.array([[1.05, 0.1, 3.0], [-0.02, 0.98, -1.0], [1e-4, -1e-4, 1.0]])
    src = rng.uniform(-50, 50, size=(16, 2))
    dst = np.asarray(homography.apply_h(jnp.asarray(H_true), jnp.asarray(src)))
    H0 = H_true + rng.normal(scale=0.01, size=(3, 3))
    H0[2, 2] = 1.0
    H, res = lm.refine_homography(jnp.asarray(H0), jnp.asarray(src), jnp.asarray(dst))
    pred = np.asarray(homography.apply_h(H, jnp.asarray(src)))
    assert np.linalg.norm(pred - dst, axis=1).max() < 1e-3


def test_lm_ray_scales_matches_scipy():
    from scipy.optimize import least_squares

    rng = np.random.default_rng(19)
    rays = rng.normal(size=(8, 3))
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    s_true = np.array([1.1, 0.9, 1.3])
    ideal = rays * s_true
    ideal /= np.linalg.norm(ideal, axis=1, keepdims=True)

    s_mine, _ = lm.fit_ray_scales(jnp.asarray(ideal), jnp.asarray(rays))

    def resid(s):
        c = rays * s
        c /= np.linalg.norm(c, axis=1, keepdims=True)
        return (c - ideal).ravel()

    s_scipy = least_squares(resid, np.ones(3)).x
    # Both must produce (scale-equivalent) directions fixing the rays.
    corr = rays * np.asarray(s_mine)
    corr /= np.linalg.norm(corr, axis=1, keepdims=True)
    np.testing.assert_allclose(corr, ideal, atol=1e-4)
    corr_sp = rays * s_scipy
    corr_sp /= np.linalg.norm(corr_sp, axis=1, keepdims=True)
    np.testing.assert_allclose(corr, corr_sp, atol=1e-4)


# ------------------------------------------------------------- epipolar
def synth_two_view(seed=0, n=40, noise=0.0):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-1, 1, size=(n, 3)) * np.array([2, 2, 1]) + [0, 0, 5]
    R = np.asarray(rotation.exp_so3(jnp.asarray(rng.normal(size=3) * 0.15)))
    t = np.array([1.0, 0.1, 0.05])
    t /= np.linalg.norm(t)
    x1 = X[:, :2] / X[:, 2:]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:]
    if noise:
        x1 += rng.normal(scale=noise, size=x1.shape)
        x2 += rng.normal(scale=noise, size=x2.shape)
    return X, x1, x2, R, t


@pytest.mark.slow
def test_eight_point_essential_and_recover_pose():
    X, x1, x2, R_true, t_true = synth_two_view(21)
    E = epipolar.eight_point(jnp.asarray(x1), jnp.asarray(x2))
    d = np.asarray(epipolar.sampson_distance(E, jnp.asarray(x1), jnp.asarray(x2)))
    assert d.max() < 1e-4  # f32
    R, t, Xr, n = epipolar.recover_pose(E, jnp.asarray(x1), jnp.asarray(x2))
    assert int(n) == X.shape[0]
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-2)  # f32 SVD
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-2)


@pytest.mark.slow
def test_triangulation_exact():
    X, x1, x2, R, t = synth_two_view(22, n=15)
    Xr = epipolar.triangulate_dlt(
        jnp.asarray(x1), jnp.asarray(x2),
        jnp.eye(3), jnp.zeros(3), jnp.asarray(R), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(Xr), X, atol=1e-5)


def test_translation_utilities():
    """clip_translation / translation_from_origin (parity for the
    reference's dead-code helpers, main_v1.py:515-544)."""
    from ransac_tpu.ops.projection import (camera_origin_from_pose,
                                           clip_translation,
                                           translation_from_origin)
    from ransac_tpu.ops.rotation import exp_so3

    t = jnp.asarray([3e4, 4e4, 0.0])
    tc = np.asarray(clip_translation(t, 1e4))
    np.testing.assert_allclose(np.linalg.norm(tc), 1e4, rtol=1e-6)
    np.testing.assert_allclose(tc / np.linalg.norm(tc), [0.6, 0.8, 0.0],
                               atol=1e-6)
    small = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_array_equal(np.asarray(clip_translation(small, 1e4)),
                                  np.asarray(small))
    R = exp_so3(jnp.asarray([0.2, -0.1, 0.4]))
    origin = jnp.asarray([10.0, -5.0, 2.0])
    t2 = translation_from_origin(R, origin)
    np.testing.assert_allclose(np.asarray(camera_origin_from_pose(R, t2)),
                               np.asarray(origin), atol=1e-5)


@pytest.mark.slow
def test_nullspace_last_fast_matches_svd():
    """Inverse-iteration nullspace (register solve, no LAPACK) agrees with
    the SVD answer across clean / noisy / wide batched DLT-like systems."""
    from ransac_tpu.ops.linalg import nullspace_last, nullspace_last_fast

    rng = np.random.default_rng(3)
    for m, n, noise in ((26, 9, 0.0), (26, 9, 1e-3), (8, 9, 0.0),
                        (4, 4, 1e-4), (24, 12, 1e-3)):
        B = 64
        U = rng.normal(size=(B, m, n)).astype(np.float32)
        v = rng.normal(size=(B, n)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        A = U - (U @ v[..., None]) * v[:, None, :]
        A = (A + noise * rng.normal(size=A.shape)).astype(np.float32)
        Aj = jnp.asarray(A)
        xs = np.asarray(nullspace_last(Aj))
        xf = np.asarray(nullspace_last_fast(Aj))
        rs = np.linalg.norm(np.einsum("bmn,bn->bm", A, xs), axis=1)
        rf = np.linalg.norm(np.einsum("bmn,bn->bm", A, xf), axis=1)
        # Residual no worse than 1.1x SVD's (plus f32 floor).
        assert (rf <= 1.1 * rs + 1e-4).all(), (m, n, noise)
        if noise <= 1e-4 and m >= n:
            # (m < n leaves a >=2-dim nullspace: any basis vector is valid,
            # so only the residual is comparable.)
            dots = np.abs(np.sum(xs * xf, axis=1))
            assert dots.min() > 0.9999, (m, n, noise, dots.min())


def test_svd3x3_closed_form():
    """Closed-form batched 3x3 SVD (eigh3x3 of F^T F) vs LAPACK across
    random / essential (sigma1=sigma2) / near-rank-2 / extreme scales."""
    from ransac_tpu.ops.linalg import svd3x3

    rng = np.random.default_rng(0)
    B = 512
    Uq, _ = np.linalg.qr(rng.normal(size=(B, 3, 3)))
    Vq, _ = np.linalg.qr(rng.normal(size=(B, 3, 3)))
    VqT = np.swapaxes(Vq, 1, 2)
    for F in (rng.normal(size=(B, 3, 3)),
              (Uq * np.array([1.0, 1.0, 0.0])) @ VqT,
              (Uq * np.array([2.0, 1.0, 1e-5])) @ VqT,
              1e-6 * rng.normal(size=(B, 3, 3)),
              1e6 * rng.normal(size=(B, 3, 3))):
        F = F.astype(np.float32)
        U, S, Vt = (np.asarray(x) for x in svd3x3(jnp.asarray(F)))
        scale = np.abs(F).max(axis=(1, 2), keepdims=True) + 1e-30
        rec = np.einsum("bij,bj,bjk->bik", U, S, Vt)
        assert (np.abs(rec - F) / scale).max() < 2e-3
        assert np.abs(np.einsum("bij,bik->bjk", U, U)
                      - np.eye(3)).max() < 1e-5
        assert np.abs(np.einsum("bij,bkj->bik", Vt, Vt)
                      - np.eye(3)).max() < 1e-5
        Sref = np.linalg.svd(F, compute_uv=False)
        assert (np.abs(S - Sref) / (Sref[:, :1] + 1e-30)).max() < 2e-3
        assert (np.diff(S, axis=1) <= 1e-6).all()  # descending


def test_refine_relative_pose_converges():
    """LM Sampson polish pulls a perturbed relative pose back to truth."""
    from ransac_tpu.ops.epipolar import refine_relative_pose
    from ransac_tpu.ops.rotation import exp_so3, geodesic_distance

    rng = np.random.default_rng(4)
    n = 60
    Xw = rng.uniform(-1, 1, size=(n, 3)) * np.array([2, 2, 1]) + [0, 0, 6]
    R_true = np.asarray(exp_so3(jnp.asarray([0.03, -0.05, 0.02])))
    t_true = np.array([0.8, 0.1, 0.05])
    t_true /= np.linalg.norm(t_true)
    x1 = (Xw[:, :2] / Xw[:, 2:]).astype(np.float32)
    Xc2 = Xw @ R_true.T + t_true
    x2 = (Xc2[:, :2] / Xc2[:, 2:]).astype(np.float32)
    # start from a visibly wrong pose
    R0 = np.asarray(exp_so3(jnp.asarray([0.05, -0.02, 0.04])))
    t0 = t_true + np.array([0.1, -0.08, 0.1])
    Rr, tr, _ = refine_relative_pose(
        jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(x1), jnp.asarray(x2))
    ang = float(geodesic_distance(Rr, jnp.asarray(R_true, jnp.float32)))
    assert ang < 2e-3, ang
    assert abs(float(np.dot(np.asarray(tr), t_true))) > 0.9999


def test_solve_spd_gj_matches_numpy():
    """Pivot-free Gauss-Jordan on a damped SPD system (the BA Schur
    camera solve) matches numpy's LU solve."""
    from ransac_tpu.ops.linalg import solve_spd_gj

    rng = np.random.default_rng(3)
    for n in (6, 64, 192):
        A = rng.normal(size=(n, n))
        A = A @ A.T + n * np.eye(n)          # SPD, damped
        b = rng.normal(size=n)
        x = np.asarray(solve_spd_gj(jnp.asarray(A, jnp.float32),
                                    jnp.asarray(b, jnp.float32)))
        np.testing.assert_allclose(x, np.linalg.solve(A, b),
                                   rtol=2e-3, atol=2e-4)
