"""SO(3) ops: round-trips, cv2.Rodrigues parity, vmap/grad sanity."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ransac_tpu.ops import rotation


def random_rvecs(n, scale=np.pi * 0.9, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mags = rng.uniform(1e-6, scale, size=(n, 1))
    return (v * mags).astype(np.float64)


def test_exp_matches_cv2_rodrigues():
    for rvec in random_rvecs(20):
        R_mine = np.asarray(rotation.exp_so3(jnp.asarray(rvec)))
        R_cv, _ = cv2.Rodrigues(rvec)
        np.testing.assert_allclose(R_mine, R_cv, atol=1e-5)


def test_log_matches_cv2_rodrigues():
    for rvec in random_rvecs(20, seed=1):
        R_cv, _ = cv2.Rodrigues(rvec)
        r_mine = np.asarray(rotation.log_so3(jnp.asarray(R_cv)))
        np.testing.assert_allclose(r_mine, rvec, atol=1e-5)


def test_exp_log_round_trip_batched():
    rvecs = jnp.asarray(random_rvecs(200, seed=2), jnp.float32)
    R = rotation.exp_so3(rvecs)
    back = rotation.log_so3(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rvecs), atol=1e-4)


def test_exp_near_zero_and_grad():
    tiny = jnp.array([1e-10, -1e-10, 1e-12], jnp.float32)
    R = rotation.exp_so3(tiny)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)
    g = jax.jacfwd(lambda v: rotation.exp_so3(v))(jnp.zeros(3, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_near_pi_stability():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    rvec = (np.pi - 1e-5) * axis
    R = rotation.exp_so3(jnp.asarray(rvec))
    back = np.asarray(rotation.log_so3(R))
    np.testing.assert_allclose(back, rvec, atol=1e-4)


def test_project_to_so3():
    rng = np.random.default_rng(3)
    R_true = np.asarray(rotation.exp_so3(jnp.asarray(random_rvecs(1)[0])))
    noisy = R_true + rng.normal(scale=1e-3, size=(3, 3))
    R = np.asarray(rotation.project_to_so3(jnp.asarray(noisy)))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99
    assert np.abs(R - R_true).max() < 1e-2


def test_quat_matrix_round_trip():
    rvecs = jnp.asarray(random_rvecs(50, seed=4), jnp.float32)
    R = rotation.exp_so3(rvecs)
    q = rotation.quat_from_matrix(R)
    R2 = rotation.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
