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
