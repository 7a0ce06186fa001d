"""Regression tests for the round-1 code-review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ransac_tpu.models import ransac as R
from ransac_tpu.models.ransac import _as_seed, _select_best
from ransac_tpu.ops import homography as hops
from ransac_tpu.pipelines.localize import score_candidates
from ransac_tpu.utils.config import LocalizeConfig, RansacConfig


def test_select_best_count_tiebreak_small_msac():
    """counts*1e9 - msac in f32 loses sub-1024 msac tie-breaks; the
    two-step lexicographic selection must not."""
    counts = jnp.asarray([10.0, 10.0, 9.0])
    msac = jnp.asarray([0.5, 1e-4, 1e-6])
    assert int(_select_best(counts, msac, "count")) == 1
    assert int(_select_best(counts, msac, "msac")) == 2


def test_as_seed_accepts_typed_key_and_int():
    s1 = _as_seed(7)
    assert s1 == 7
    s2 = _as_seed(jax.random.key(3))
    assert np.asarray(s2).shape == ()


@pytest.mark.slow
def test_sweep_wrapper_accepts_typed_key():
    rng = np.random.default_rng(0)
    H_true = np.array([[900.0, 40.0, 500.0], [-15.0, 850.0, 400.0],
                       [1e-3, 2e-3, 1.0]])
    src = rng.uniform(-1.5, 1.5, size=(13, 2)).astype(np.float32)
    dst = np.array(hops.apply_h(jnp.asarray(H_true), jnp.asarray(src)))
    dst = dst.astype(np.float32)
    res = R.ransac_homography_sweep(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(13),
        RansacConfig(threshold=5.0, num_hypotheses=2048),
        jax.random.key(0), interpret=True)
    assert int(res.num_inliers) == 13


def test_sweep_wrapper_respects_point_mask():
    """Hypotheses whose minimal sample touches a masked point must be
    invalidated, and masked points never appear as inliers."""
    rng = np.random.default_rng(1)
    H_true = np.array([[900.0, 40.0, 500.0], [-15.0, 850.0, 400.0],
                       [1e-3, 2e-3, 1.0]])
    src = rng.uniform(-1.5, 1.5, size=(13, 2)).astype(np.float32)
    dst = np.array(hops.apply_h(jnp.asarray(H_true), jnp.asarray(src)),
                   dtype=np.float32)
    # Corrupt masked-out rows grossly: if they leaked into samples AND won,
    # the inlier set would be tiny/garbage.
    dst[9:] = rng.uniform(-5000, 5000, size=(4, 2))
    mask = np.ones(13, np.float32)
    mask[9:] = 0.0
    res = R.ransac_homography_sweep(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
        RansacConfig(threshold=5.0, num_hypotheses=4096), 2, interpret=True)
    got = np.asarray(res.inlier_mask)
    assert not got[9:].any()
    assert got[:9].sum() >= 8


@pytest.mark.slow
def test_degenerate_candidate_cannot_hijack_argmin():
    """A candidate placed AT a landmark (d_east ~ 0 -> garbage projection,
    potentially singular H / NaN scores) must not beat valid candidates."""
    rng = np.random.default_rng(2)
    cam = np.array([-500.0, 0.0, 50.0])
    X = rng.uniform(-100, 100, size=(13, 3)) + np.array([0, 0, 80.0])
    p = X - cam
    pos2 = np.stack([p[:, 2] / p[:, 0], p[:, 1] / p[:, 0]], 1)
    H_true = np.array([[900.0, 10, 500], [-15, 850, 400], [1e-3, 2e-3, 1]])
    pix = np.asarray(hops.apply_h(jnp.asarray(H_true), jnp.asarray(pos2)))
    cam_locs = np.stack([
        cam,                       # the true camera
        X[0],                      # ON a landmark: d_east = 0 row
        X[4] + [1e-6, 0, 0],       # pathologically close
        cam + [100.0, 40.0, 10.0],
    ]).astype(np.float32)
    out = score_candidates(
        jnp.asarray(pix, jnp.float32), jnp.asarray(X, jnp.float32),
        jnp.ones(13), jnp.asarray(cam_locs), jnp.ones(4, jnp.int32),
        LocalizeConfig(ransac=RansacConfig(threshold=5.0)),
        jax.random.key(0))
    assert int(out["best"]) == 0
    assert np.isfinite(float(out["best_err2"]))


def test_pivoting_sweeps_centroid_aligned_sample():
    """A sample point sitting exactly at the sample centroid x makes the
    first structural pivot zero; partial pivoting must still solve it."""
    from ransac_tpu.ops.pallas.sweep import homography_ransac_sweep

    # Exactly 4 points, x = [1, 0, 2, 1]: every sample is a permutation of
    # this set, and any permutation whose first point has x == mean(x) = 1
    # zeroes the first structural pivot (~half the hypothesis budget).
    # General position otherwise (no 3 collinear).
    src = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 1.3], [1.0, 3.0]],
                   np.float32)
    H_true = np.array([[100.0, 3.0, 40.0], [-2.0, 95.0, 30.0],
                       [1e-3, -1e-3, 1.0]])
    dst = np.array(hops.apply_h(jnp.asarray(H_true), jnp.asarray(src)),
                   dtype=np.float32)
    msac, counts, packed = homography_ransac_sweep(
        5, jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
        2.0, n_hyp=2048, interpret=True, full_records=True)
    msac = np.asarray(msac)
    counts = np.asarray(counts)
    valid = msac < 1e38
    # The projective-frame solve must accept every permutation of a
    # general-position sample (its validity test is collinearity of point
    # triples, not an elimination pivot; a point at the sample centroid —
    # which zeroed the structural pivot of the old Gaussian-elimination
    # formulation — is not degenerate).
    assert valid.all(), valid.mean()
    assert counts.min() == 4


def test_fastio_stray_single_field_row(tmp_path):
    """Rows with a blank first cell are skipped identically by the numeric
    and string parsers (desync regression)."""
    from ransac_tpu.io import native

    if not native.available() and not native.build():
        import pytest

        pytest.skip("no native toolchain")
    path = str(tmp_path / "t.csv")
    open(path, "w").write(
        "id,name,v\n1,alpha,10\n\n  \n2,beta,20\n,orphan,99\n3,gamma,30\n")
    nums = native.read_numeric(path, [0, 2])
    names = native.read_strings(path, 1)
    assert nums.shape[0] == len(names) == 3
    assert names == ["alpha", "beta", "gamma"]
    np.testing.assert_allclose(nums[:, 1], [10, 20, 30])


def test_large_sweep_min_independent_windows():
    """ADVICE r2 (medium): with the default n_hyp == BLOCK_H and a pool
    larger than one sampling WINDOW, a run must span several independent
    windows (same-block window failures are fully correlated).  Checked
    via eval_shape so no kernel executes."""
    import functools

    from ransac_tpu.ops.pallas import sweep_large as SL

    def shapes(n, n_hyp):
        fn = functools.partial(
            SL.homography_ransac_sweep_large, 0, n_hyp=n_hyp,
            interpret=True)
        out = jax.eval_shape(
            fn, jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32), 75.0)
        return out[0].shape
    # pool > WINDOW: rounded up to MIN_WINDOWED_BLOCKS blocks
    assert shapes(200, SL.BLOCK_H) == (
        2, SL.MIN_WINDOWED_BLOCKS * SL.BLOCK_H // 8)
    # pool <= WINDOW: windowing is inert, no round-up
    assert shapes(48, SL.BLOCK_H) == (2, SL.BLOCK_H // 8)
