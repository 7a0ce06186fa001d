"""Distributed tests without a cluster (SURVEY.md §4 item 4): 8 virtual CPU
devices exercise the shard_map candidate-search and its collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ransac_tpu.parallel.mesh import make_mesh
from ransac_tpu.parallel.sharded_search import distributed_score_candidates
from ransac_tpu.pipelines.localize import score_candidates
from ransac_tpu.utils.config import LocalizeConfig, RansacConfig
from ransac_tpu.ops import homography as hops

# Compile-heavy module: excluded from the quick loop (pytest -m 'not slow');
# the default no-filter run still includes it.
pytestmark = pytest.mark.slow


def synth_problem(seed=0, n=13, c=16):
    rng = np.random.default_rng(seed)
    cam = np.array([-500.0, 0.0, 50.0])
    X = rng.uniform(-100, 100, size=(n, 3)) + np.array([0, 0, 80.0])
    # Build pixels from a true candidate via the east-axis projection + a
    # known homography-ish mapping.
    p = X - cam
    pos2 = np.stack([p[:, 2] / p[:, 0], p[:, 1] / p[:, 0]], 1)
    H_true = np.array([[900.0, 10, 500], [-15, 850, 400], [1e-3, 2e-3, 1]])
    pix = np.asarray(hops.apply_h(jnp.asarray(H_true), jnp.asarray(pos2)))
    pix = pix + rng.normal(scale=0.5, size=pix.shape)
    cam_locs = cam + rng.normal(scale=120.0, size=(c, 3))
    cam_locs[3] = cam  # plant the true location
    grids = np.ones(c, np.int32)
    return (pix.astype(np.float32), X.astype(np.float32),
            np.ones(n, np.float32), cam_locs.astype(np.float32), grids)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    mesh2 = make_mesh(8, data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_distributed_matches_single_device_best():
    pix, X, mask, cam_locs, grids = synth_problem()
    cfg = LocalizeConfig(ransac=RansacConfig(
        threshold=5.0, num_hypotheses=2048, exhaustive=False))
    mesh = make_mesh(8, data=4, model=2)
    out_d = distributed_score_candidates(
        jnp.asarray(pix), jnp.asarray(X), jnp.asarray(mask),
        jnp.asarray(cam_locs), jnp.asarray(grids), cfg,
        jax.random.key(0), mesh)
    out_s = score_candidates(
        jnp.asarray(pix), jnp.asarray(X), jnp.asarray(mask),
        jnp.asarray(cam_locs), jnp.asarray(grids), cfg, jax.random.key(0))
    # Both must find the planted candidate.
    assert int(out_d["best"]) == 3
    assert int(out_s["best"]) == 3
    # Scores agree to RANSAC stochasticity on the winner.
    d_best = float(out_d["err2"][3])
    s_best = float(out_s["err2"][3])
    assert abs(d_best - s_best) / max(s_best, 1e-9) < 0.2, (d_best, s_best)


def test_distributed_all_data_mesh():
    pix, X, mask, cam_locs, grids = synth_problem(1, c=16)
    cfg = LocalizeConfig(ransac=RansacConfig(
        threshold=5.0, num_hypotheses=1024, exhaustive=False))
    mesh = make_mesh(8, data=8, model=1)
    out = distributed_score_candidates(
        jnp.asarray(pix), jnp.asarray(X), jnp.asarray(mask),
        jnp.asarray(cam_locs), jnp.asarray(grids), cfg,
        jax.random.key(0), mesh)
    assert int(out["best"]) == 3


def test_distributed_all_model_mesh():
    pix, X, mask, cam_locs, grids = synth_problem(2, c=8)
    cfg = LocalizeConfig(ransac=RansacConfig(
        threshold=5.0, num_hypotheses=4096, exhaustive=False))
    mesh = make_mesh(8, data=1, model=8)
    out = distributed_score_candidates(
        jnp.asarray(pix), jnp.asarray(X), jnp.asarray(mask),
        jnp.asarray(cam_locs), jnp.asarray(grids), cfg,
        jax.random.key(0), mesh)
    assert int(out["best"]) == 3


def test_hypothesis_sharded_equals_single_device_emulation():
    """VERDICT r2 weak #5: the (data x model) mesh path must reproduce a
    single-device run with the SAME total hypothesis budget and fold-key
    derivation — only the collectives differ."""
    from ransac_tpu.parallel.sharded_search import emulate_hypothesis_sharded

    pix, X, mask, cam_locs, grids = synth_problem(3, c=16)
    cfg = LocalizeConfig(ransac=RansacConfig(
        threshold=5.0, num_hypotheses=2048, exhaustive=False))
    mesh = make_mesh(8, data=4, model=2)
    args = (jnp.asarray(pix), jnp.asarray(X), jnp.asarray(mask),
            jnp.asarray(cam_locs), jnp.asarray(grids), cfg,
            jax.random.key(0))
    out_d = distributed_score_candidates(*args, mesh)
    out_e = emulate_hypothesis_sharded(*args, 4, 2)
    assert int(out_d["best"]) == int(out_e["best"])
    np.testing.assert_allclose(np.asarray(out_d["err2"]),
                               np.asarray(out_e["err2"]), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d["err1"]),
                               np.asarray(out_e["err1"]), rtol=1e-5,
                               atol=1e-4)


# ---------------------------------------------------------------------------
# Keyframe-axis sharded front end (SURVEY.md §2.5 row 4)


def _synth_frames(F=8, H=64, W=64, seed=3):
    """Smooth textured frames with a drifting pattern (trackable corners)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((H + 16, W + 16))
    # Blur for broad structure + checker detail for corners.
    k = np.ones(5) / 5.0
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 0, base)
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, base)
    yy, xx = np.mgrid[0:H + 16, 0:W + 16]
    base = base * 3 + 0.5 * np.sin(yy / 2.1) * np.sin(xx / 2.3)
    return np.stack([base[f:f + H, f:f + W] for f in range(F)]
                    ).astype(np.float32)


def test_sharded_frontend_matches_single_device():
    from ransac_tpu.parallel.sharded_frontend import (
        distributed_frontend, frontend_frames, match_consecutive)
    from ransac_tpu.utils.config import TwoViewConfig

    cfg = TwoViewConfig(max_keypoints=64, nms_radius=3, patch_size=8)
    imgs = _synth_frames(F=8)
    mesh = make_mesh(8, data=4, model=2)
    xy_d, val_d, desc_d, idx2_d, mval_d = distributed_frontend(
        jnp.asarray(imgs), mesh, cfg)

    xy_s, val_s, desc_s = frontend_frames(
        jnp.asarray(imgs), cfg.max_keypoints, cfg.nms_radius,
        cfg.harris_k, cfg.patch_size)
    idx2_s, mval_s = match_consecutive(xy_s, val_s, desc_s,
                                       cfg.match_ratio)

    np.testing.assert_array_equal(np.asarray(val_d), np.asarray(val_s))
    np.testing.assert_allclose(np.asarray(xy_d), np.asarray(xy_s),
                               atol=1e-6)
    # Pair rows 0..F-2 must agree exactly; row F-1 is the wrapped
    # boundary of the last device and must be all-invalid.
    np.testing.assert_array_equal(np.asarray(mval_d)[:-1],
                                  np.asarray(mval_s))
    keep = np.asarray(mval_s)
    np.testing.assert_array_equal(np.asarray(idx2_d)[:-1][keep],
                                  np.asarray(idx2_s)[keep])
    assert not np.asarray(mval_d)[-1].any()
    # The synthetic drift must actually produce matches.
    assert keep.sum() > 20


def test_sharded_frontend_tracks_feed_sfm():
    from ransac_tpu.parallel.sharded_frontend import (
        distributed_frontend, matches_to_tracks)
    from ransac_tpu.utils.config import TwoViewConfig

    cfg = TwoViewConfig(max_keypoints=64, nms_radius=3, patch_size=8)
    imgs = _synth_frames(F=8)
    mesh = make_mesh(8, data=8, model=1)
    xy, val, desc, idx2, mval = distributed_frontend(
        jnp.asarray(imgs), mesh, cfg)
    tracks = matches_to_tracks(xy, idx2, mval, min_len=3)
    assert tracks, "no tracks chained"
    frames = {f for f, _ in tracks}
    tids = {t for _, t in tracks}
    assert len(frames) >= 3
    # Track chaining invariant: per (frame, tid) at most one observation,
    # consecutive frames within a track.
    by_tid = {}
    for (f, t), uv in tracks.items():
        by_tid.setdefault(t, []).append(f)
        assert uv.shape == (2,)
    for t, fs in by_tid.items():
        fs = sorted(fs)
        assert fs == list(range(fs[0], fs[0] + len(fs))), (t, fs)
        assert len(fs) >= 3
    assert len(tids) >= 5


@pytest.mark.slow
def test_cli_sfm_demo_smoke(tmp_path, capsys):
    """cli sfm --demo wiring: one command runs frontend -> tracks -> SfM
    -> CG-BA and prints the frames/s table + ATE (VERDICT r2 #5)."""
    import json

    from ransac_tpu import cli as cli_mod

    out = str(tmp_path / "demo.json")
    rc = cli_mod.main(["sfm", "--demo", "8", "--out", out])
    assert rc in (0, None)
    text = capsys.readouterr().out
    assert "frames/s" in text and "ATE" in text
    d = json.load(open(out))
    assert d["frames"] == 8
    assert d["registered"] >= 6
    assert d["observations"] > 50
    assert np.isfinite(d["ate"])
