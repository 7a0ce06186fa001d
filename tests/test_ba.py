"""Bundle adjustment + pose graph: synthetic convergence, gauge handling,
distributed (psum) equivalence on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ransac_tpu.ba.bundle import BAProblem, bundle_adjust, cost_fn
from ransac_tpu.ba.posegraph import (PoseGraph, compose, invert,
                                     optimize_pose_graph, relative)
from ransac_tpu.ops import projection as proj
from ransac_tpu.ops.rotation import exp_so3, log_so3
from ransac_tpu.utils.config import BundleAdjustConfig


def synth_ba(seed=0, n_cam=6, n_pt=60, pix_noise=0.0, perturb=True):
    rng = np.random.default_rng(seed)
    K = np.array([[700.0, 0, 320.0], [0, 700.0, 240.0], [0, 0, 1.0]])
    pts = rng.uniform(-2, 2, size=(n_pt, 3)) * np.array([3, 3, 1]) + [0, 0, 8]
    cams = []
    for c in range(n_cam):
        rvec = rng.normal(size=3) * 0.1
        t = np.array([c * 0.8 - 2.0, 0.1 * rng.normal(), 0.0])
        cams.append(np.concatenate([rvec, t]))
    cams = np.array(cams)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cam):
        R = np.asarray(exp_so3(jnp.asarray(cams[c, :3])))
        pix, z = proj.project_points(
            jnp.asarray(pts), jnp.asarray(R), jnp.asarray(cams[c, 3:]),
            jnp.asarray(K))
        pix = np.asarray(pix)
        vis = np.asarray(z) > 0
        for i in np.where(vis)[0]:
            obs_cam.append(c)
            obs_pt.append(i)
            obs_uv.append(pix[i] + rng.normal(scale=pix_noise, size=2))
    obs_cam = np.array(obs_cam, np.int32)
    obs_pt = np.array(obs_pt, np.int32)
    obs_uv = np.array(obs_uv)
    obs_w = np.ones(len(obs_cam), np.float32)

    cams_init = cams.copy()
    pts_init = pts.copy()
    if perturb:
        cams_init[1:] += rng.normal(scale=0.01, size=cams_init[1:].shape)
        pts_init = pts + rng.normal(scale=0.05, size=pts.shape)

    p = BAProblem(
        cameras=jnp.asarray(cams_init, jnp.float32),
        points=jnp.asarray(pts_init, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv, jnp.float32), obs_w=jnp.asarray(obs_w))
    return p, cams, pts


def test_ba_converges_to_ground_truth():
    p, cams_true, pts_true = synth_ba(0)
    res = bundle_adjust(p, BundleAdjustConfig(max_iters=25))
    assert float(res.cost) < 1e-3 * float(res.initial_cost)
    # Camera 0 pinned; remaining cameras recover truth.
    np.testing.assert_allclose(np.asarray(res.cameras)[0], p.cameras[0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.cameras)[1:], cams_true[1:],
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.points), pts_true, atol=2e-2)


def test_ba_noisy_reaches_noise_floor():
    p, cams_true, pts_true = synth_ba(1, pix_noise=0.5)
    res = bundle_adjust(p, BundleAdjustConfig(max_iters=30))
    n_obs = p.obs_uv.shape[0]
    rms = np.sqrt(2 * float(res.cost) / n_obs)
    assert rms < 0.7  # ~noise level, not above


def test_ba_huber_downweights_outliers():
    p, cams_true, pts_true = synth_ba(2, pix_noise=0.2)
    uv = np.array(p.obs_uv)
    uv[::17] += 80.0  # gross outliers
    p_out = p._replace(obs_uv=jnp.asarray(uv, jnp.float32))
    res_plain = bundle_adjust(p_out, BundleAdjustConfig(max_iters=25))
    res_huber = bundle_adjust(
        p_out, BundleAdjustConfig(max_iters=25, huber_scale=2.0))
    err_plain = np.abs(np.asarray(res_plain.points) - pts_true).mean()
    err_huber = np.abs(np.asarray(res_huber.points) - pts_true).mean()
    assert err_huber < err_plain


def test_distributed_ba_matches_single(monkeypatch):
    from ransac_tpu.parallel.dist_ba import distributed_bundle_adjust
    from ransac_tpu.parallel.mesh import make_mesh

    p, cams_true, pts_true = synth_ba(3, n_cam=4, n_pt=40)
    # Pad observations to a multiple of the data-axis size.
    n_data = 4
    O = p.obs_cam.shape[0]
    pad = (-O) % n_data
    pz = lambda a, fill: jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
    p_pad = p._replace(
        obs_cam=pz(p.obs_cam, 0), obs_pt=pz(p.obs_pt, 0),
        obs_uv=pz(p.obs_uv, 0.0), obs_w=pz(p.obs_w, 0.0))

    mesh = make_mesh(8, data=4, model=2)
    cams_d, pts_d, cost_d = distributed_bundle_adjust(
        p_pad, mesh, n_iters=15)
    res_s = bundle_adjust(p, BundleAdjustConfig(max_iters=25))
    # Both reach ground truth.
    np.testing.assert_allclose(np.asarray(cams_d)[1:], cams_true[1:], atol=1e-2)
    np.testing.assert_allclose(np.asarray(res_s.cameras)[1:], cams_true[1:],
                               atol=1e-2)
    assert float(cost_d) < 1e-2


def random_pose(rng, scale_r=0.3, scale_t=1.0):
    return np.concatenate([rng.normal(size=3) * scale_r,
                           rng.normal(size=3) * scale_t])


def test_se3_compose_invert():
    rng = np.random.default_rng(4)
    a = jnp.asarray(random_pose(rng))
    b = jnp.asarray(random_pose(rng))
    ab = compose(a, b)
    # (a*b)*b^-1 == a
    back = compose(ab, invert(b))
    np.testing.assert_allclose(np.asarray(back), np.asarray(a), atol=1e-5)


def test_pose_graph_closes_loop():
    """Chain of noisy odometry edges + one loop closure: optimization pulls
    the final pose back to the loop constraint."""
    rng = np.random.default_rng(5)
    V = 12
    true_poses = [np.zeros(6)]
    for i in range(1, V):
        step = np.array([0.0, 0.02, 0.0, 1.0, 0.05, 0.0])
        true_poses.append(np.asarray(compose(jnp.asarray(step),
                                             jnp.asarray(true_poses[-1]))))
    true_poses = np.array(true_poses)

    edges_i, edges_j, edges_z, edges_w = [], [], [], []
    noisy = [true_poses[0]]
    for i in range(V - 1):
        z = np.asarray(relative(jnp.asarray(true_poses[i]),
                                jnp.asarray(true_poses[i + 1])))
        z_noisy = z + rng.normal(scale=0.01, size=6)
        edges_i.append(i); edges_j.append(i + 1)
        edges_z.append(z_noisy); edges_w.append(1.0)
        noisy.append(np.asarray(compose(jnp.asarray(z_noisy),
                                        jnp.asarray(noisy[-1]))))
    # Loop closure: exact relative pose 0 -> V-1.
    z_loop = np.asarray(relative(jnp.asarray(true_poses[0]),
                                 jnp.asarray(true_poses[-1])))
    edges_i.append(0); edges_j.append(V - 1)
    edges_z.append(z_loop); edges_w.append(3.0)

    g = PoseGraph(
        poses=jnp.asarray(np.array(noisy), jnp.float32),
        edge_i=jnp.asarray(np.array(edges_i, np.int32)),
        edge_j=jnp.asarray(np.array(edges_j, np.int32)),
        edge_z=jnp.asarray(np.array(edges_z), jnp.float32),
        edge_w=jnp.asarray(np.array(edges_w), jnp.float32))

    drift_before = np.linalg.norm(np.asarray(noisy[-1])[3:] - true_poses[-1][3:])
    poses_opt, cost, it = optimize_pose_graph(g, max_iters=40)
    drift_after = np.linalg.norm(
        np.asarray(poses_opt)[-1][3:] - true_poses[-1][3:])
    assert drift_after < drift_before * 0.5, (drift_before, drift_after)
    assert float(cost) < 1e-2
