"""Fused RANSAC sweep kernel: interpret-mode correctness vs the stage-wise
engine; scaling harness smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ransac_tpu.models import ransac as R
from ransac_tpu.ops import homography as hops
from ransac_tpu.ops.pallas.sweep import (BLOCK_H, homography_ransac_sweep,
                                         unpack_sample)
from ransac_tpu.utils.config import RansacConfig

# Compile-heavy module: excluded from the quick loop (pytest -m 'not slow');
# the default no-filter run still includes it.
pytestmark = pytest.mark.slow


def planted(seed=0, n=13, n_out=3, noise=1.0):
    rng = np.random.default_rng(seed)
    H_true = np.array([[900.0, 40.0, 500.0], [-15.0, 850.0, 400.0],
                       [1e-3, 2e-3, 1.0]])
    src = rng.uniform(-1.5, 1.5, size=(n, 2)).astype(np.float32)
    dst = np.array(hops.apply_h(jnp.asarray(H_true), jnp.asarray(src)))
    dst = (dst + rng.normal(scale=noise, size=dst.shape)).astype(np.float32)
    dst[n - n_out:] += 300.0
    return src, dst, n - n_out


def test_sweep_finds_consensus():
    src, dst, n_in = planted()
    msac, counts, packed = homography_ransac_sweep(
        7, jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
        75.0, n_hyp=2 * BLOCK_H, interpret=True, full_records=True)
    msac = np.asarray(msac)
    counts = np.asarray(counts)
    assert (msac < 1e38).mean() > 0.95  # nearly all hypotheses valid
    b = int(np.argmin(msac))
    assert counts[b] >= n_in
    sample = unpack_sample(np.asarray(packed)[b])
    assert len(set(sample.tolist())) == 4
    # Winner re-solve must reproduce the kernel's count.
    Hm, ok = hops.dlt_homography_minimal(
        jnp.asarray(src[sample]), jnp.asarray(dst[sample]))
    errs = np.asarray(hops.transfer_errors(
        Hm, jnp.asarray(src), jnp.asarray(dst)))
    assert bool(ok)
    assert abs(int((errs <= 75.0).sum()) - counts[b]) <= 1  # f32 boundary


def test_sweep_engine_wrapper_matches_stagewise():
    src, dst, n_in = planted(1)
    cfg = RansacConfig(threshold=75.0, num_hypotheses=2 * BLOCK_H,
                       exhaustive=False)
    res_sweep = R.ransac_homography_sweep(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)), cfg, 3,
        interpret=True)
    res_engine = R.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
        RansacConfig(threshold=75.0, exhaustive=True), jax.random.key(0))
    # Same consensus set size; same inlier mask.
    assert int(res_sweep.num_inliers) == int(res_engine.num_inliers)
    np.testing.assert_array_equal(np.asarray(res_sweep.inlier_mask),
                                  np.asarray(res_engine.inlier_mask))
    # Refit models agree on inlier predictions.
    w = np.asarray(res_engine.inlier_mask)
    p1 = np.asarray(hops.apply_h(res_sweep.model, jnp.asarray(src[w])))
    p2 = np.asarray(hops.apply_h(res_engine.model, jnp.asarray(src[w])))
    assert np.abs(p1 - p2).max() < 1.0


def test_sweep_sampling_uniformity():
    """Every 4-subset drawn by the kernel is valid and the per-point usage
    is near-uniform."""
    src, dst, _ = planted(2)
    msac, counts, packed = homography_ransac_sweep(
        11, jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
        75.0, n_hyp=BLOCK_H, interpret=True, full_records=True)
    packed = np.asarray(packed)
    idx = np.stack([packed & 15, (packed >> 4) & 15,
                    (packed >> 8) & 15, (packed >> 12) & 15], 1)
    assert idx.min() >= 0 and idx.max() < 13
    # No repeats within a sample.
    srt = np.sort(idx, 1)
    assert (srt[:, :-1] != srt[:, 1:]).all()
    freq = np.bincount(idx.ravel(), minlength=13) / idx.size
    assert abs(freq - 1 / 13).max() < 0.02


def test_scaling_harness():
    from ransac_tpu.utils.scaling import measure_scaling, report

    pts = measure_scaling(device_counts=[1, 2], n_candidates=8,
                          hypotheses=256, iters=1)
    assert len(pts) == 2
    assert pts[0].efficiency == 1.0
    txt = report(pts)
    assert "devices" in txt and "eff" in txt


def test_pnp_sweep_finds_consensus():
    from ransac_tpu.ops import pnp as pnp_mod
    from ransac_tpu.ops import projection as proj
    from ransac_tpu.ops.pallas.sweep_pnp import (pnp_ransac_sweep,
                                                 unpack_sample3)
    PNP_BLOCK = 1024  # small block: interpret-mode cost scales with it
    from ransac_tpu.ops.rotation import exp_so3

    rng = np.random.default_rng(5)
    R_true = np.asarray(exp_so3(jnp.asarray(np.array([0.1, -0.2, 0.05]))))
    t_true = np.array([0.2, -0.1, 6.0])
    n = 13
    X = rng.uniform(-2, 2, (n, 3)) * np.array([1, 1, 0.5])
    K = np.array([[900.0, 0, 400], [0, 900.0, 300], [0, 0, 1]])
    pix, _ = proj.project_points(
        jnp.asarray(X), jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray(K))
    pix = np.array(pix)
    pix[10:] += 200.0
    pixn = np.asarray(proj.normalize_pixels(
        jnp.asarray(pix, jnp.float32), jnp.asarray(K, jnp.float32)))

    msac, counts, packed = pnp_ransac_sweep(
        3, jnp.asarray(X, jnp.float32), jnp.asarray(pixn), jnp.ones(n),
        30.0 / 900.0, n_hyp=PNP_BLOCK, interpret=True, full_records=True)
    msac, counts, packed = (np.asarray(v) for v in (msac, counts, packed))
    b = int(np.argmin(msac))
    assert counts[b] >= 10
    # Host re-solve of the winning sample reproduces the consensus.
    s = unpack_sample3(packed[b])
    assert len(set(s.tolist())) == 3
    R4, t4, v4 = pnp_mod.p3p_grunert(
        jnp.asarray(X[s], jnp.float32), jnp.asarray(pixn[s]))
    best = 0
    for k in range(4):
        if not bool(v4[k]):
            continue
        pp, z = proj.project_points(
            jnp.asarray(X, jnp.float32), R4[k], t4[k],
            jnp.asarray(K, jnp.float32))
        e = np.linalg.norm(np.asarray(pp) - pix, axis=1)
        best = max(best, int(((e <= 30) & (np.asarray(z) > 0)).sum()))
    assert best >= 10


def test_pnp_sweep_reduced_records_match_full():
    """The two-row block reduction selects the same winner (under both
    rules) as an argmin/lex-max over the per-(hypothesis, root) records,
    and masked-sample hypotheses are invalidated in-kernel."""
    from ransac_tpu.ops import projection as proj
    from ransac_tpu.ops.pallas.sweep_pnp import pnp_ransac_sweep
    PNP_BLOCK = 1024  # small block: interpret-mode cost scales with it
    from ransac_tpu.ops.rotation import exp_so3

    rng = np.random.default_rng(12)
    R_true = np.asarray(exp_so3(jnp.asarray(np.array([0.1, 0.2, -0.07]))))
    t_true = np.array([0.1, 0.3, 5.0])
    n = 12
    X = rng.uniform(-2, 2, (n, 3)) * np.array([1, 1, 0.5])
    K = np.array([[800.0, 0, 400], [0, 800.0, 300], [0, 0, 1]])
    pix, _ = proj.project_points(
        jnp.asarray(X), jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray(K))
    pixn = np.asarray(proj.normalize_pixels(
        jnp.asarray(np.array(pix), jnp.float32), jnp.asarray(K, jnp.float32)))
    mask = np.ones(n, np.float32)
    mask[4] = 0.0  # a masked point: no winner may sample it
    args = (jnp.asarray(X, jnp.float32), jnp.asarray(pixn),
            jnp.asarray(mask), 20.0 / 800.0)

    mf, cf, pf = (np.asarray(v) for v in pnp_ransac_sweep(
        9, *args, n_hyp=PNP_BLOCK, interpret=True, full_records=True))
    mr, cr, pr = (np.asarray(v) for v in pnp_ransac_sweep(
        9, *args, n_hyp=PNP_BLOCK, interpret=True))
    assert mr.shape == (2, PNP_BLOCK // 8)

    # Row 0: min-MSAC winners agree.
    assert np.isclose(mr[0].min(), mf.min(), rtol=1e-5)
    # Row 1: lexicographic (max count, min msac) winners agree.
    cmax = cf.max()
    assert cr[1].max() == cmax
    m_at = mf[cf == cmax].min()
    sel = (cr[1] == cmax)
    assert np.isclose(mr[1][sel].min(), m_at, rtol=1e-5)
    # In-kernel mask invalidation: no reduced winner sampled point 4.
    for row in range(2):
        b = int(np.argmin(mr[row]))
        s = [pr[row][b] & 15, (pr[row][b] >> 4) & 15, (pr[row][b] >> 8) & 15]
        assert 4 not in s


def test_pnp_sweep_engine_wrapper():
    from ransac_tpu.ops import projection as proj
    from ransac_tpu.ops.rotation import exp_so3, geodesic_distance

    rng = np.random.default_rng(9)
    R_true = np.asarray(exp_so3(jnp.asarray(np.array([0.15, -0.1, 0.08]))))
    t_true = np.array([0.3, -0.2, 7.0])
    n = 14
    X = rng.uniform(-2, 2, (n, 3)) * np.array([1, 1, 0.5])
    K = np.array([[900.0, 0, 400], [0, 900.0, 300], [0, 0, 1]])
    pix, _ = proj.project_points(
        jnp.asarray(X), jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray(K))
    pix = np.array(pix)
    pix[11:] += 150.0

    res = R.ransac_pnp_sweep(
        jnp.asarray(X, jnp.float32), jnp.asarray(pix, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.ones(n),
        RansacConfig(threshold=8.0, num_hypotheses=1024), 5,
        interpret=True)
    assert int(res.num_inliers) >= 11
    Rm, t = R.pnp_pose_from_result(res)
    ang = float(geodesic_distance(Rm, jnp.asarray(R_true)))
    assert ang < 0.01, ang
    np.testing.assert_allclose(np.asarray(t), t_true, atol=0.05)


def test_essential_sweep_finds_consensus():
    from ransac_tpu.ops import epipolar
    from ransac_tpu.ops.pallas.sweep_essential import (
        essential_ransac_sweep, unpack_sample8)
    E_BLOCK = 512  # small block: interpret-mode cost scales with it
    from ransac_tpu.ops.rotation import exp_so3

    rng = np.random.default_rng(3)
    n = 16
    Xw = rng.uniform(-1, 1, size=(n, 3)) * np.array([2, 2, 1]) + [0, 0, 5]
    Rm = np.asarray(exp_so3(jnp.asarray(rng.normal(size=3) * 0.1)))
    t = np.array([1.0, 0.05, 0.1])
    t /= np.linalg.norm(t)
    x1 = (Xw[:, :2] / Xw[:, 2:]).astype(np.float32)
    Xc2 = Xw @ Rm.T + t
    x2 = (Xc2[:, :2] / Xc2[:, 2:]).astype(np.float32)
    x2[12:] += rng.uniform(0.1, 0.3, size=(4, 2)) * rng.choice(
        [-1, 1], (4, 2))
    thr = (2.0 / 600.0) ** 2

    msac, counts, packed = essential_ransac_sweep(
        3, jnp.asarray(x1), jnp.asarray(x2), jnp.ones(n), thr,
        n_hyp=2 * E_BLOCK, interpret=True, full_records=True,
        block_h=E_BLOCK)
    msac, counts, packed = (np.asarray(v) for v in (msac, counts, packed))
    b = int(np.argmin(msac))
    assert counts[b] >= 12
    s = unpack_sample8(packed[b])
    assert len(set(s.tolist())) == 8
    assert all(i < 12 for i in s)  # winning sample is outlier-free
    # Engine semantics: the winner's consensus set comes from the
    # unconstrained minimal solve (what the kernel scored), then the refit
    # on that set is essential-projected (an essential projection of a
    # minimal exactly-fit F can distort it; the engine never scores that).
    x1h = np.concatenate([x1, np.ones((n, 1), np.float32)], 1)
    x2h = np.concatenate([x2, np.ones((n, 1), np.float32)], 1)
    A = np.stack([x2h[s, 0] * x1h[s, 0], x2h[s, 0] * x1h[s, 1], x2h[s, 0],
                  x2h[s, 1] * x1h[s, 0], x2h[s, 1] * x1h[s, 1], x2h[s, 1],
                  x1h[s, 0], x1h[s, 1]], 1)
    Fm = np.append(np.linalg.solve(A.astype(np.float64), -np.ones(8)),
                   1.0).reshape(3, 3)
    Fx1 = x1h @ Fm.T
    Ftx2 = x2h @ Fm
    d_min = ((x2h * Fx1).sum(1) ** 2
             / (Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2
                + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2))
    inl = d_min <= thr
    assert inl.sum() >= 12
    E = epipolar.eight_point(jnp.asarray(x1), jnp.asarray(x2),
                             jnp.asarray(inl.astype(np.float32)),
                             essential=True)
    d = np.asarray(epipolar.sampson_distance(
        E, jnp.asarray(x1), jnp.asarray(x2)))
    assert (d <= thr).sum() >= 12


def test_multi_candidate_sweep_matches_engine_on_reference_data():
    """The candidate-axis fused search reproduces score_candidates exactly
    on the real 1898 workload (same exhaustive samples, refit, scoring)."""
    import pytest

    from tests.conftest import reference_available

    if not reference_available():
        pytest.skip("reference data absent")
    from tests.test_localize_parity import load_scene

    from ransac_tpu.pipelines.localize import (score_candidates,
                                               score_candidates_sweep)
    from ransac_tpu.utils.config import LocalizeConfig

    scene = load_scene()
    cfg = LocalizeConfig()
    args = (jnp.asarray(scene.pixels), jnp.asarray(scene.pos3d),
            jnp.asarray(scene.point_mask), jnp.asarray(scene.cam_locs),
            jnp.asarray(scene.grid_codes))
    out_s = score_candidates_sweep(*args, cfg, interpret=True)
    out_e = score_candidates(*args, cfg, jax.random.key(0))
    assert int(out_s["best"]) == int(out_e["best"])
    np.testing.assert_allclose(np.asarray(out_s["err2"]),
                               np.asarray(out_e["err2"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_s["err1"]),
                               np.asarray(out_e["err1"]), atol=1e-3)


def test_large_sweep_finds_consensus():
    from ransac_tpu.ops.pallas.sweep_large import (
        BLOCK_H as LBLOCK, homography_ransac_sweep_large, sample_indices_for)

    src, dst, n_in = planted(2, n=200, n_out=60, noise=1.0)
    msac, counts, flat, (seeds, n_valid, order) = (
        homography_ransac_sweep_large(
            11, jnp.asarray(src), jnp.asarray(dst), jnp.ones(len(src)),
            75.0, n_hyp=LBLOCK, interpret=True))
    msac0 = np.asarray(msac[0])
    counts0 = np.asarray(counts[0])
    b = int(np.argmin(msac0))
    assert counts0[b] >= 0.9 * n_in
    # Counter replay: winner's sample re-solves to the recorded count.
    pool = sample_indices_for(
        jnp.asarray(np.asarray(flat[0])[b])[None], seeds, n_valid)[0]
    sample = np.asarray(order)[np.asarray(pool)]
    assert len(set(sample.tolist())) == 4
    Hm, ok = hops.dlt_homography_minimal(
        jnp.asarray(src[sample]), jnp.asarray(dst[sample]))
    errs = np.asarray(hops.transfer_errors(
        Hm, jnp.asarray(src), jnp.asarray(dst)))
    assert bool(ok)
    assert abs(int((errs <= 75.0).sum()) - counts0[b]) <= 2  # f32 boundary


def test_large_sweep_engine_wrapper_and_mask():
    src, dst, n_in = planted(3, n=120, n_out=30, noise=1.0)
    mask = np.ones(len(src), np.float32)
    mask[5:15] = 0.0
    src_bad = src.copy()
    src_bad[5:15] = 1e6  # poison masked rows: sampling them would blow up
    cfg = RansacConfig(threshold=75.0, num_hypotheses=4096,
                       exhaustive=False)
    res = R.ransac_homography_sweep(
        jnp.asarray(src_bad), jnp.asarray(dst), jnp.asarray(mask), cfg, 5,
        interpret=True)
    m = np.asarray(res.inlier_mask)
    assert not m[5:15].any()          # masked points never inliers
    assert m.sum() >= 0.9 * (n_in - 10)
    # Refit model maps remaining true inliers within threshold.
    errs = np.asarray(hops.transfer_errors(
        res.model, jnp.asarray(src), jnp.asarray(dst)))
    good = np.ones(len(src), bool)
    good[5:15] = False
    good[n_in:] = False
    assert np.median(errs[good]) < 10.0


def _planted_twoview(seed=5, n=100, n_out=30):
    from ransac_tpu.ops.rotation import exp_so3
    rng = np.random.default_rng(seed)
    Xw = rng.uniform(-1, 1, size=(n, 3)) * np.array([2, 2, 1]) + [0, 0, 5]
    Rm = np.asarray(exp_so3(jnp.asarray(rng.normal(size=3) * 0.1)))
    t = np.array([1.0, 0.05, 0.1])
    t /= np.linalg.norm(t)
    x1 = (Xw[:, :2] / Xw[:, 2:]).astype(np.float32)
    Xc2 = Xw @ Rm.T + t
    x2 = (Xc2[:, :2] / Xc2[:, 2:]).astype(np.float32)
    x2[n - n_out:] += rng.uniform(0.1, 0.3, size=(n_out, 2)) * rng.choice(
        [-1, 1], (n_out, 2))
    return x1, x2, n - n_out


def test_large_essential_sweep_finds_consensus():
    from ransac_tpu.ops import epipolar
    from ransac_tpu.ops.pallas.sweep_essential_large import (
        essential_ransac_sweep_large, sample_indices_for8)

    x1, x2, n_in = _planted_twoview()
    thr = (2.0 / 600.0) ** 2
    msac, counts, flat, (seeds, n_valid, order, _norm) = (
        essential_ransac_sweep_large(
            9, jnp.asarray(x1), jnp.asarray(x2), jnp.ones(len(x1)), thr,
            n_hyp=1024, interpret=True, block_h=512))
    msac0 = np.asarray(msac[0])
    counts0 = np.asarray(counts[0])
    b = int(np.argmin(msac0))
    assert counts0[b] >= 0.85 * n_in
    # Counter replay: winner's 8-point sample is distinct and outlier-free
    # (block_h must match the sweep call so window bases replay).
    pool = sample_indices_for8(
        jnp.asarray(np.asarray(flat[0])[b])[None], seeds, n_valid,
        block_h=512)[0]
    sample = np.asarray(order)[np.asarray(pool)]
    assert len(set(sample.tolist())) == 8
    assert all(i < n_in for i in sample)
    # Exact re-solve on the sample keeps a comparable consensus.
    E = epipolar.eight_point(jnp.asarray(x1[sample]), jnp.asarray(x2[sample]),
                             essential=True)
    d = np.asarray(epipolar.sampson_distance(
        E, jnp.asarray(x1), jnp.asarray(x2)))
    assert (d <= thr).sum() >= 0.8 * n_in


def test_large_essential_engine_wrapper():
    from ransac_tpu.ops import epipolar

    x1, x2, n_in = _planted_twoview(seed=6, n=80, n_out=20)
    mask = np.ones(len(x1), np.float32)
    mask[:5] = 0.0
    x1_bad = x1.copy()
    x1_bad[:5] = 50.0  # poison masked rows: sampling them would blow up
    thr = (2.0 / 600.0) ** 2
    cfg = RansacConfig(threshold=thr, num_hypotheses=4096, exhaustive=False)
    res = R.ransac_essential_sweep(
        jnp.asarray(x1_bad), jnp.asarray(x2), jnp.asarray(mask), cfg, 4,
        interpret=True)
    m = np.asarray(res.inlier_mask)
    assert not m[:5].any()
    assert m[5:n_in].sum() >= 0.8 * (n_in - 5)
    # Refit E is rank-2 essential with small Sampson error on true inliers.
    d = np.asarray(epipolar.sampson_distance(
        res.model, jnp.asarray(x1), jnp.asarray(x2)))
    assert np.median(d[5:n_in]) < thr


def _planted_pnp_scene(seed=7, n_in=40, n_out=12, f=900.0):
    from ransac_tpu.ops import projection as proj
    from ransac_tpu.ops.rotation import exp_so3

    rng = np.random.default_rng(seed)
    R_true = np.asarray(exp_so3(jnp.asarray(np.array([0.12, -0.18, 0.06]))))
    t_true = np.array([0.25, -0.15, 6.5])
    n = n_in + n_out
    X = rng.uniform(-2, 2, (n, 3)) * np.array([1, 1, 0.5])
    K = np.array([[f, 0, 400], [0, f, 300], [0, 0, 1.0]])
    pix, _ = proj.project_points(
        jnp.asarray(X), jnp.asarray(R_true), jnp.asarray(t_true),
        jnp.asarray(K))
    pix = np.array(pix)
    pix[n_in:] += rng.uniform(120, 400, size=(n_out, 2))
    return X, pix, K, R_true, t_true


def test_large_pnp_sweep_finds_consensus():
    """Large-N P3P sweep (counter replay) finds the planted pose on a
    40-inlier/12-outlier pool — beyond the 16-point packed-index kernel."""
    from ransac_tpu.ops import pnp as pnp_mod
    from ransac_tpu.ops import projection as proj
    from ransac_tpu.ops.pallas.sweep_pnp_large import (
        pnp_ransac_sweep_large, sample_indices3_for)

    X, pix, K, R_true, t_true = _planted_pnp_scene()
    n = len(X)
    pixn = np.asarray(proj.normalize_pixels(
        jnp.asarray(pix, jnp.float32), jnp.asarray(K, jnp.float32)))
    thr_n = 10.0 / 900.0

    msac, counts, packed, (seeds, n_valid, order) = pnp_ransac_sweep_large(
        3, jnp.asarray(X, jnp.float32), jnp.asarray(pixn),
        jnp.ones(n), thr_n, n_hyp=2048, interpret=True, block_h=512)
    msac0 = np.asarray(msac[0])
    counts0 = np.asarray(counts[0])
    b = int(np.argmin(msac0))
    assert counts0[b] >= 0.85 * 40, counts0[b]
    # Counter replay: winner's 3-point sample is distinct; exact re-solve
    # of the winning hypothesis reproduces the consensus.
    p = int(np.asarray(packed[0])[b])
    pool = sample_indices3_for(jnp.asarray(p >> 2)[None], seeds, n_valid,
                               block_h=512)[0]
    sample = np.asarray(order)[np.asarray(pool)]
    assert len(set(sample.tolist())) == 3
    R4, t4, v4 = pnp_mod.p3p_grunert(
        jnp.asarray(X[sample], jnp.float32), jnp.asarray(pixn[sample]))
    best = 0
    for k in range(4):
        if not bool(v4[k]):
            continue
        pp, z = proj.project_points(
            jnp.asarray(X, jnp.float32), R4[k], t4[k],
            jnp.asarray(K, jnp.float32))
        e = np.linalg.norm(np.asarray(pp) - pix, axis=1)
        best = max(best, int(((e <= 10) & (np.asarray(z) > 0)).sum()))
    assert best >= 0.85 * 40, best


def test_large_pnp_engine_wrapper_and_mask():
    """ransac_pnp_sweep auto-routes pools > 16 points to the large-N
    kernel; masked points never enter a sample; the LM-refined pose
    matches the planted ground truth."""
    from ransac_tpu.ops.rotation import geodesic_distance

    X, pix, K, R_true, t_true = _planted_pnp_scene(seed=11, n_in=36,
                                                   n_out=10)
    n = len(X)
    mask = np.ones(n, np.float32)
    mask[:4] = 0.0
    X_bad = X.copy()
    X_bad[:4] = 1e6  # poison masked rows: sampling them would blow up

    res = R.ransac_pnp_sweep(
        jnp.asarray(X_bad, jnp.float32), jnp.asarray(pix, jnp.float32),
        jnp.asarray(K, jnp.float32), jnp.asarray(mask),
        RansacConfig(threshold=8.0, num_hypotheses=4096), 5,
        interpret=True)
    m = np.asarray(res.inlier_mask)
    assert not m[:4].any()
    assert m[4:36].sum() >= 0.8 * 32, m[4:36].sum()
    Rm, t = R.pnp_pose_from_result(res)
    ang = float(geodesic_distance(Rm, jnp.asarray(R_true)))
    assert ang < 0.01, ang
    np.testing.assert_allclose(np.asarray(t), t_true, atol=0.05)


def test_large_sweep_window_sampling_uniform_marginals():
    """Window-restricted sampling (sweep_large.WINDOW): each hypothesis
    draws inside its block's window of the shuffled pool, but the
    MARGINAL distribution over input rows must stay ~uniform across
    blocks, and draws must be distinct."""
    from ransac_tpu.ops.pallas import sweep_large as SL

    n, n_blocks = 256, 64
    seeds = SL._draw_seeds(123)
    maskf = jnp.ones(n, jnp.float32)
    order = np.asarray(SL.shuffle_order(seeds, maskf))
    assert sorted(order.tolist()) == list(range(n))  # a permutation
    flat = jnp.arange(n_blocks * SL.BLOCK_H, dtype=jnp.int32)
    pool = np.asarray(SL.sample_indices_for(flat, seeds, jnp.int32(n)))
    # Distinct draws per hypothesis.
    assert (np.diff(np.sort(pool, axis=1), axis=1) != 0).all()
    # Within-window: every draw within WINDOW of its block's base
    # (windows are circular mod n).
    wb = np.asarray(SL.window_bases(seeds, n_blocks, jnp.int32(n)))
    blocks = np.asarray(flat) // SL.BLOCK_H
    off = (pool - wb[blocks][:, None]) % n
    assert off.min() >= 0 and off.max() < SL.WINDOW
    # Marginal over input rows ~ uniform (chi-square-ish bound).
    rows = order[pool.ravel()]
    counts = np.bincount(rows, minlength=n)
    expect = pool.size / n
    assert counts.min() > 0.5 * expect
    assert counts.max() < 2.0 * expect


def test_large_sweep_small_pool_matches_unwindowed_sampler():
    """For pools <= WINDOW the windowed sampler must degrade to plain
    Fisher-Yates over n_valid (window base identically 0)."""
    from ransac_tpu.ops.pallas import sweep_large as SL

    seeds = SL._draw_seeds(7)
    flat = jnp.arange(4 * SL.BLOCK_H, dtype=jnp.int32)
    nv = jnp.int32(13)
    wb = np.asarray(SL.window_bases(seeds, 4, nv))
    assert (wb == 0).all()
    pool = np.asarray(SL.sample_indices_for(flat, seeds, nv))
    ref = np.asarray(jnp.stack(
        SL._fy_draws(flat.astype(jnp.uint32), seeds, nv), axis=-1))
    np.testing.assert_array_equal(pool, ref)
