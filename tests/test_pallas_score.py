"""Pallas fused scoring kernels vs the jnp reference path (interpret mode on
CPU; the same code compiles natively on TPU for bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ransac_tpu.ops.pallas import score


def test_homography_kernel_matches_reference():
    rng = np.random.default_rng(0)
    H = 4096 + 77  # non-multiple of block: exercises padding
    models = np.eye(3)[None] + rng.normal(scale=0.1, size=(H, 3, 3))
    src = rng.uniform(-2, 2, size=(13, 2)).astype(np.float32)
    dst = rng.uniform(-2, 2, size=(13, 2)).astype(np.float32)
    mask = np.ones(13); mask[11:] = 0
    c_ref, m_ref = score.homography_scores_ref(
        jnp.asarray(models, jnp.float32), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(mask), 1.5)
    c_pal, m_pal = score.homography_scores(
        jnp.asarray(models, jnp.float32), jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(mask), 1.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(c_pal), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_ref), rtol=1e-5)


def test_pnp_kernel_matches_reference():
    rng = np.random.default_rng(1)
    H = 2048
    from ransac_tpu.ops.rotation import exp_so3

    R = np.asarray(exp_so3(jnp.asarray(rng.normal(size=(H, 3)) * 0.5)))
    t = rng.normal(size=(H, 3)) * np.array([1, 1, 5]) + [0, 0, 6]
    models = np.concatenate([R.reshape(H, 9), t], axis=1).astype(np.float32)
    Xw = rng.uniform(-2, 2, size=(12, 3)).astype(np.float32)
    pix_n = rng.uniform(-0.5, 0.5, size=(12, 2)).astype(np.float32)
    mask = np.ones(12); mask[10:] = 0
    c_ref, m_ref = score.pnp_scores_ref(
        jnp.asarray(models), jnp.asarray(Xw), jnp.asarray(pix_n),
        jnp.asarray(mask), 0.02)
    c_pal, m_pal = score.pnp_scores(
        jnp.asarray(models), jnp.asarray(Xw), jnp.asarray(pix_n),
        jnp.asarray(mask), 0.02, interpret=True)
    np.testing.assert_array_equal(np.asarray(c_pal), np.asarray(c_ref))
    np.testing.assert_allclose(np.asarray(m_pal), np.asarray(m_ref), rtol=1e-5)


def test_pnp_kernel_cheirality():
    # Points behind every camera -> zero inliers, msac = N * thr^2.
    models = np.concatenate(
        [np.tile(np.eye(3).reshape(9), (64, 1)),
         np.tile(np.array([0.0, 0, -100.0]), (64, 1))], axis=1)
    Xw = np.tile(np.array([[0.0, 0, 5.0]]), (8, 1))
    pix = np.zeros((8, 2))
    mask = np.ones(8)
    c, m = score.pnp_scores(
        jnp.asarray(models, jnp.float32), jnp.asarray(Xw, jnp.float32),
        jnp.asarray(pix, jnp.float32), jnp.asarray(mask), 0.1, interpret=True)
    assert np.all(np.asarray(c) == 0)
    np.testing.assert_allclose(np.asarray(m), 8 * 0.1**2, rtol=1e-5)
