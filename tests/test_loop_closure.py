"""Loop-closure + pose-graph tests (VERDICT r3 #4).

- unit: covisibility pair detection from a synthetic track table;
- drift repair: a drifted closed-circuit trajectory with ground-truth
  closure edges — pose-graph optimization must cut the (aligned) ATE;
- distributed: the edge-sharded psum pose graph on the 8-device mesh
  matches the 1-device run of the same algorithm and reduces cost.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ransac_tpu.ba.posegraph import PoseGraph, optimize_pose_graph, relative


def _circle_poses(V=32, radius=1.0):
    """Ground-truth world->camera poses on a closed circuit (identity
    rotation, translating centers)."""
    th = 2 * np.pi * np.arange(V) / V
    centers = np.stack([radius * np.cos(th), radius * np.sin(th),
                        np.zeros(V)], 1)
    # R = I -> t = -center.
    return np.concatenate([np.zeros((V, 3)), -centers], 1)


def _drifted(poses_gt, drift=0.004, seed=0):
    """Integrate noisy odometry: each consecutive relative transform gets
    a small translation bias, accumulating exactly the drift a pose
    graph with loop closures repairs."""
    rng = np.random.default_rng(seed)
    V = poses_gt.shape[0]
    out = [poses_gt[0].copy()]
    for k in range(1, V):
        z = np.asarray(relative(jnp.asarray(poses_gt[k - 1]),
                                jnp.asarray(poses_gt[k])))
        z = z.copy()
        z[3:] += drift * (1.0 + 0.3 * rng.standard_normal(3))
        from ransac_tpu.ba.posegraph import compose
        out.append(np.asarray(compose(jnp.asarray(z),
                                      jnp.asarray(out[-1]))))
    return np.stack(out)


def _ate(est, gt):
    """RMS camera-center error after rigid alignment (rotation fixed to
    identity here: centers only, mean-removed)."""
    ce = np.stack([-p[3:] for p in est])
    cg = np.stack([-p[3:] for p in gt])
    ce = ce - ce.mean(0)
    cg = cg - cg.mean(0)
    return float(np.sqrt(((ce - cg) ** 2).sum(1).mean()))


def _loop_graph(poses_gt, poses_init, n_loop=3):
    V = poses_gt.shape[0]
    ei, ej, ez, ew = [], [], [], []
    for k in range(V - 1):
        ei.append(k)
        ej.append(k + 1)
        # Odometry edges: the (drifted) initial estimates' own relatives
        # — internally consistent, globally wrong.
        ez.append(np.asarray(relative(jnp.asarray(poses_init[k]),
                                      jnp.asarray(poses_init[k + 1]))))
        ew.append(1.0)
    for (a, b) in [(0, V - 1), (1, V - 2), (2, V // 2)][:n_loop]:
        ei.append(a)
        ej.append(b)
        # Loop closures measured drift-free (from ground truth).
        ez.append(np.asarray(relative(jnp.asarray(poses_gt[a]),
                                      jnp.asarray(poses_gt[b]))))
        ew.append(2.0)
    return PoseGraph(
        poses=jnp.asarray(poses_init, jnp.float32),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        edge_z=jnp.asarray(np.stack(ez).astype(np.float32)),
        edge_w=jnp.asarray(np.array(ew, np.float32)))


def test_loop_closure_pairs_detects_revisit():
    from ransac_tpu.pipelines.loop_closure import loop_closure_pairs

    frames = list(range(40))
    tracks = {}
    # Sliding visibility: frame f sees tracks [2f, 2f+40); the circuit
    # closes, so the last frames re-see the first tracks (mod 80).
    for f in frames:
        for t in range(2 * f, 2 * f + 40):
            tracks[(f, t % 80)] = np.array([1.0, 2.0])
    pairs = loop_closure_pairs(tracks, frames, min_gap=16, min_shared=20)
    assert pairs, "no loop pairs found"
    a, b = pairs[0]
    assert b - a >= 16
    # The strongest revisit joins the circuit's ends.
    assert a <= 6 and b >= 33


def test_pose_graph_repairs_drift():
    gt = _circle_poses(32)
    init = _drifted(gt)
    g = _loop_graph(gt, init)
    ate0 = _ate(init, gt)
    poses, cost, iters = optimize_pose_graph(g, max_iters=40)
    ate1 = _ate(np.asarray(poses), gt)
    assert ate1 < 0.35 * ate0, (ate0, ate1)


@pytest.mark.slow
def test_distributed_pose_graph_edge_sharded():
    from ransac_tpu.parallel.dist_posegraph import distributed_pose_graph
    from ransac_tpu.parallel.mesh import make_mesh

    gt = _circle_poses(24)
    init = _drifted(gt, seed=3)
    g = _loop_graph(gt, init)
    mesh8 = make_mesh(8, data=8, model=1)
    mesh1 = make_mesh(1, data=1, model=1)
    p8, c8 = distributed_pose_graph(g, mesh8, n_iters=25)
    p1, c1 = distributed_pose_graph(g, mesh1, n_iters=25)
    # Edge padding carries zero weight: device count must not change the
    # optimum (f32 psum ordering allows tiny differences).
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1),
                               rtol=1e-3, atol=1e-4)
    ate0 = _ate(init, gt)
    ate8 = _ate(np.asarray(p8), gt)
    assert ate8 < 0.35 * ate0, (ate0, ate8)
    assert float(c8) < 1e-3


def test_sim3_pose_graph_repairs_scale_drift():
    """Monocular scale drift (each odometry step's translation inflated
    by a compounding factor) is inexpressible in SE(3) but repaired by
    the Sim(3) pose graph with scale-carrying loop closures."""
    from ransac_tpu.ba.posegraph import (PoseGraphSim3,
                                         optimize_pose_graph_sim3,
                                         relative, relative_sim3,
                                         sim3_to_se3)

    gt = _circle_poses(24)
    V = gt.shape[0]
    # Integrate odometry whose translation magnitude drifts by 3%/step:
    # the classic monocular failure (total drift ~2x around the loop).
    from ransac_tpu.ba.posegraph import compose
    drifted = [gt[0].copy()]
    for k in range(1, V):
        z = np.asarray(relative(jnp.asarray(gt[k - 1]),
                                jnp.asarray(gt[k])))
        z = z.copy()
        z[3:] *= 1.03 ** k
        drifted.append(np.asarray(compose(jnp.asarray(z),
                                          jnp.asarray(drifted[-1]))))
    drifted = np.stack(drifted)
    ate0 = _ate(drifted, gt)

    # Odometry edges from the drifted chain (scale 1 — locally
    # consistent); loop closures measured from ground truth INCLUDING
    # the relative scale the drifted chain implies at the two ends.
    p7 = np.concatenate([drifted, np.zeros((V, 1))], 1)
    ei, ej, ez, ew = [], [], [], []
    for k in range(V - 1):
        z = np.asarray(relative_sim3(jnp.asarray(p7[k], jnp.float32),
                                     jnp.asarray(p7[k + 1], jnp.float32)))
        ei.append(k)
        ej.append(k + 1)
        ez.append(z)
        ew.append(1.0)
    # Loop closures in the PIPELINE convention (closure_edge): rotation
    # and translation DIRECTION are drift-free (two-view essential), the
    # translation magnitude is expressed in MAP units near frame j
    # (s_j * unit baseline), and the scale row carries log(s_j / s_i)
    # measured from the map anchors.  Local scale here: s_k = 1.03^k.
    gt7 = np.concatenate([gt, np.zeros((V, 1))], 1)
    for (a, b) in ((0, V - 1), (1, V - 2), (2, V // 2)):
        z = np.asarray(relative_sim3(jnp.asarray(gt7[a], jnp.float32),
                                     jnp.asarray(gt7[b], jnp.float32)),
                       np.float64)
        s_a, s_b = 1.03 ** a, 1.03 ** b
        z[3:6] *= s_b
        z[6] = np.log(s_b / s_a)
        ei.append(a)
        ej.append(b)
        ez.append(z)
        ew.append(2.0)
    # Odometry edges do not observe relative scale (edge_sw=0); loop
    # closures do (edge_sw=1).
    sw = np.array([0.0] * (V - 1) + [1.0] * 3, np.float32)
    g = PoseGraphSim3(
        poses=jnp.asarray(p7, jnp.float32),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        edge_z=jnp.asarray(np.stack(ez).astype(np.float32)),
        edge_w=jnp.asarray(np.array(ew, np.float32)),
        edge_sw=jnp.asarray(sw))
    poses7, cost, iters = optimize_pose_graph_sim3(g, max_iters=60)
    fixed = np.asarray(sim3_to_se3(poses7), np.float64)
    ate1 = _ate(fixed, gt)
    assert ate1 < 0.5 * ate0, (ate0, ate1)


def _sim3_scale_drift_graph(V=24, n_loop=3):
    """Scale-drifted circuit + Sim(3) graph in the pipeline convention
    (mirrors test_sim3_pose_graph_repairs_scale_drift's construction)."""
    from ransac_tpu.ba.posegraph import (PoseGraphSim3, compose, relative,
                                         relative_sim3)

    gt = _circle_poses(V)
    drifted = [gt[0].copy()]
    for k in range(1, V):
        z = np.asarray(relative(jnp.asarray(gt[k - 1]),
                                jnp.asarray(gt[k])))
        z = z.copy()
        z[3:] *= 1.03 ** k
        drifted.append(np.asarray(compose(jnp.asarray(z),
                                          jnp.asarray(drifted[-1]))))
    drifted = np.stack(drifted)
    p7 = np.concatenate([drifted, np.zeros((V, 1))], 1)
    gt7 = np.concatenate([gt, np.zeros((V, 1))], 1)
    ei, ej, ez, ew = [], [], [], []
    for k in range(V - 1):
        z = np.asarray(relative_sim3(jnp.asarray(p7[k], jnp.float32),
                                     jnp.asarray(p7[k + 1], jnp.float32)))
        ei.append(k)
        ej.append(k + 1)
        ez.append(z)
        ew.append(1.0)
    loops = [(0, V - 1), (1, V - 2), (2, V // 2)][:n_loop]
    for (a, b) in loops:
        z = np.asarray(relative_sim3(jnp.asarray(gt7[a], jnp.float32),
                                     jnp.asarray(gt7[b], jnp.float32)),
                       np.float64)
        s_a, s_b = 1.03 ** a, 1.03 ** b
        z[3:6] *= s_b
        z[6] = np.log(s_b / s_a)
        ei.append(a)
        ej.append(b)
        ez.append(z)
        ew.append(2.0)
    sw = np.array([0.0] * (V - 1) + [1.0] * len(loops), np.float32)
    g = PoseGraphSim3(
        poses=jnp.asarray(p7, jnp.float32),
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        edge_z=jnp.asarray(np.stack(ez).astype(np.float32)),
        edge_w=jnp.asarray(np.array(ew, np.float32)),
        edge_sw=jnp.asarray(sw))
    return g, gt, drifted


@pytest.mark.slow
def test_distributed_sim3_pose_graph_edge_sharded():
    """VERDICT r4 #5: the Sim(3) (monocular loop-closing) pose graph has
    a distributed mirror too — 8-device edge-sharded psum run must match
    the 1-device run of the same algorithm on the SCALE-drift circuit
    and repair the drift."""
    from ransac_tpu.ba.posegraph import sim3_to_se3
    from ransac_tpu.parallel.dist_posegraph import (
        distributed_pose_graph_sim3)
    from ransac_tpu.parallel.mesh import make_mesh

    g, gt, drifted = _sim3_scale_drift_graph(24)
    mesh8 = make_mesh(8, data=8, model=1)
    mesh1 = make_mesh(1, data=1, model=1)
    p8, c8 = distributed_pose_graph_sim3(g, mesh8, n_iters=40)
    p1, c1 = distributed_pose_graph_sim3(g, mesh1, n_iters=40)
    # f32 psum ordering perturbs the LM path along gauge-free directions
    # (measured ~1e-3 pose wiggle at cost ~1e-13 on both): assert
    # DECISION equality — both converge, poses agree to the wiggle, and
    # the repaired ATEs match.
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p1),
                               rtol=1e-2, atol=5e-3)
    assert float(c8) < 1e-8 and float(c1) < 1e-8, (float(c8), float(c1))
    ate0 = _ate(drifted, gt)
    ate8 = _ate(np.asarray(sim3_to_se3(jnp.asarray(p8)), np.float64), gt)
    ate1 = _ate(np.asarray(sim3_to_se3(jnp.asarray(p1)), np.float64), gt)
    assert abs(ate8 - ate1) < 1e-3, (ate8, ate1)
    assert ate8 < 0.5 * ate0, (ate0, ate8)
