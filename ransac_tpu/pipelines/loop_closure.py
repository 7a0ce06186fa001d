"""Loop-closure detection + pose-graph construction for incremental SfM.

BASELINE.json names "pose-graph optimization" as a deliverable and the
round-3 SLAM demo measured the exact failure mode it exists to fix:
monocular drift of ~10% of the trajectory with `ba.posegraph` sitting
unused.  This module supplies the missing glue:

- **Covisibility loop detection** (`loop_closure_pairs`): frame pairs
  far apart in time (``|i - j| >= min_gap``) that share many tracks —
  computed from the track table with one vectorized pass (a [F, T]
  incidence matmul), no per-pair Python scans.
- **Drift-free relative-pose measurement** (`closure_edge`): a fused
  essential-RANSAC two-view solve on the pair's shared pixel
  observations (independent of the drifted SfM estimates), with the
  monocular scale resolved against the CURRENT map: the median ratio of
  map depth to two-view triangulated depth over the pair's inlier
  tracks.
- **Pose-graph assembly** (`build_pose_graph`): odometry edges between
  consecutive registered frames (measured from the incremental
  estimates — locally accurate, globally drifted) plus the closure
  edges, feeding ``ba.posegraph.optimize_pose_graph`` (gauge pinned at
  node 0).

Reference lineage: the reference's single-image pipeline has no
multi-frame machinery at all; this generalizes its LM pose refinement
(/root/reference/main_v1.py:508) to trajectory-level consistency.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ransac_tpu.ba.posegraph import PoseGraph, PoseGraphSim3, relative
from ransac_tpu.utils.config import RansacConfig
from ransac_tpu.utils.logging import get_logger

log = get_logger("loop_closure")


def loop_closure_pairs(tracks: dict, frames: list[int],
                       min_gap: int = 16, min_shared: int = 24,
                       max_pairs: int = 4) -> list[tuple[int, int]]:
    """Candidate loop pairs from track covisibility.

    Builds the [F, T] binary incidence matrix and takes its Gram matrix
    (shared-track counts for every frame pair) in one matmul; returns up
    to ``max_pairs`` non-adjacent pairs (``j - i >= min_gap``) with at
    least ``min_shared`` shared tracks, greedily keeping pairs that are
    not within ``min_gap / 2`` of an already-chosen one (one closure per
    revisit region is enough for the pose graph)."""
    fidx = {f: k for k, f in enumerate(frames)}
    tids = sorted({t for _, t in tracks})
    tidx = {t: k for k, t in enumerate(tids)}
    inc = np.zeros((len(frames), len(tids)), np.float32)
    for (f, t) in tracks:
        if f in fidx:
            inc[fidx[f], tidx[t]] = 1.0
    shared = inc @ inc.T                                 # [F, F]
    cand = []
    F = len(frames)
    for a in range(F):
        for b in range(a + min_gap, F):
            if shared[a, b] >= min_shared:
                cand.append((int(shared[a, b]), a, b))
    cand.sort(reverse=True)
    chosen: list[tuple[int, int]] = []
    for cnt, a, b in cand:
        if len(chosen) >= max_pairs:
            break
        if any(abs(a - ca) < min_gap // 2 and abs(b - cb) < min_gap // 2
               for ca, cb in chosen):
            continue
        chosen.append((a, b))
        log.info("loop candidate: frames %d-%d share %d tracks",
                 frames[a], frames[b], cnt)
    return [(frames[a], frames[b]) for a, b in chosen]


def detect_closures_appearance(xy, valid, desc, min_gap: int = 16,
                               min_matches: int = 24, stride: int = 2,
                               max_pairs: int = 4, ratio: float = 0.9):
    """Place recognition by brute-force descriptor matching of far frame
    pairs — the consecutive-frame tracker cannot link a circuit's ends
    (no shared track ids survive a full revisit), so closures must be
    found by APPEARANCE.  All candidate pairs (``j - i >= min_gap``,
    both subsampled by ``stride``) run as ONE vmapped mutual-NN batch on
    device (each pair is a [K, K] MXU matmul).  Returns up to
    ``max_pairs`` tuples ``(fi, fj, uv_i [M,2], uv_j [M,2])`` sorted by
    match count, de-duplicated by revisit region."""
    import jax

    from ransac_tpu.features.match import mutual_nn_match

    desc = jnp.asarray(desc)
    valid = jnp.asarray(valid)
    F = int(desc.shape[0])
    cands = [(a, b) for a in range(0, F, stride)
             for b in range(a + min_gap, F, stride)]
    if not cands:
        return []
    ia = jnp.asarray(np.array([a for a, b in cands], np.int32))
    ib = jnp.asarray(np.array([b for a, b in cands], np.int32))

    def pair(a, b):
        mt = mutual_nn_match(desc[a], desc[b], valid[a], valid[b], ratio)
        return mt.idx2, mt.valid

    idx2, mv = jax.jit(jax.vmap(pair))(ia, ib)
    counts = np.asarray(mv.sum(-1))
    idx2 = np.asarray(idx2)
    mv = np.asarray(mv)
    xy = np.asarray(xy)
    order = np.argsort(-counts)
    out = []
    for k in order:
        if counts[k] < min_matches or len(out) >= max_pairs:
            break
        a, b = cands[k]
        if any(abs(a - fa) < min_gap // 2 and abs(b - fb) < min_gap // 2
               for fa, fb, _, _ in out):
            continue
        sel = mv[k].astype(bool)
        uv_i = xy[a][sel]
        uv_j = xy[b][idx2[k][sel]]
        log.info("appearance closure: frames %d-%d, %d matches",
                 a, b, int(counts[k]))
        out.append((a, b, uv_i, uv_j))
    return out


def closure_edge(tracks: dict, m, K, fi: int, fj: int,
                 ransac_cfg: RansacConfig | None = None, seed: int = 17,
                 uv_pair=None):
    """Measure the relative pose Z (j <- i) for a loop pair from the
    pair's own pixel correspondences (drift-free), with monocular scale
    anchored to the current map.  Correspondences come from shared
    tracks, or from ``uv_pair = (uv_i, uv_j)`` (appearance matches; map
    anchors are recovered by exact uv lookup into the track table).
    Returns ``(z6 [6], n_inliers)`` or ``None`` if the pair cannot be
    measured (too few inliers / no scale anchor)."""
    import jax

    from ransac_tpu.models import ransac as ransac_mod
    from ransac_tpu.ops import epipolar
    from ransac_tpu.ops import projection as proj
    from ransac_tpu.ops.rotation import exp_so3, log_so3

    if uv_pair is None:
        common = sorted(t for t in {t for f, t in tracks if f == fi}
                        if (fj, t) in tracks)
        if len(common) < 16:
            return None
        x1p = np.stack([tracks[(fi, t)] for t in common])
        x2p = np.stack([tracks[(fj, t)] for t in common])
    else:
        x1p, x2p = uv_pair
        if len(x1p) < 16:
            return None
        # Map each frame-i keypoint back to its track id (if tracked) by
        # exact uv match — xy values flow unmodified into the track
        # table, so float equality is reliable.
        uv2tid = {tuple(np.asarray(uv)): t
                  for (f, t), uv in tracks.items() if f == fi}
        common = [uv2tid.get(tuple(uv)) for uv in x1p]
    Kj = jnp.asarray(K, jnp.float32)
    x1 = proj.normalize_pixels(jnp.asarray(x1p, jnp.float32), Kj)
    x2 = proj.normalize_pixels(jnp.asarray(x2p, jnp.float32), Kj)
    w = jnp.ones(len(common), jnp.float32)
    cfg = ransac_cfg or RansacConfig(threshold=4.0, num_hypotheses=4096)
    e_cfg = RansacConfig(
        threshold=(cfg.threshold / float(np.asarray(K)[0, 0])) ** 2,
        num_hypotheses=cfg.num_hypotheses, selection=cfg.selection)
    # Engine by platform (incremental_sfm convention): the fused Pallas
    # sweep on TPU, the XLA engine elsewhere (interpret-mode Pallas at
    # thousands of hypotheses is minutes-slow).
    if jax.devices()[0].platform == "tpu":
        eres = ransac_mod.ransac_essential_sweep(x1, x2, w, e_cfg, seed)
    else:
        eres = ransac_mod.ransac_essential(x1, x2, w, e_cfg,
                                           jax.random.key(seed))
    R, t, X, n = epipolar.recover_pose(
        eres.model, x1, x2, eres.inlier_mask.astype(jnp.float32))
    n = int(n)
    if n < 10:
        log.info("closure %d-%d REJECTED: %d cheiral essential inliers",
                 fi, fj, n)
        return None
    # Monocular scale anchors on BOTH frames: s_i (s_j) is the median
    # ratio of the frame-i (frame-j) MAP depth to the two-view
    # triangulated depth over the pair's inlier tracks that exist in the
    # map.  s_i puts the unit-baseline two-view translation into map
    # units near i; s_j / s_i is the RELATIVE SCALE the edge observes —
    # the accumulated monocular scale drift a Sim(3) pose graph corrects
    # and an SE(3) one cannot (measured: ~10x around the circuit demo).
    R_np = np.asarray(R)
    t_np = np.asarray(t)
    X_np = np.asarray(X)
    inl = np.asarray(eres.inlier_mask)
    # Track ids for frame j's side as well (appearance matches carry
    # none): exact uv lookup.
    if uv_pair is None:
        common_j = common
    else:
        uv2tid_j = {tuple(np.asarray(uv)): tr
                    for (f_, tr), uv in tracks.items() if f_ == fj}
        common_j = [uv2tid_j.get(tuple(uv)) for uv in x2p]

    Kn = np.asarray(K, np.float64)

    def _ratios(f_anchor, tids, z_tv_fn):
        """Depth ratios from HEALTHY anchor points only: a map point
        must reproject within ~3 px of its track observation in the
        anchor frame — a drifted/broken point (quasi-infinite or
        collapsed depth) otherwise drags the median to nonsense
        (observed: an accepted closure with scale 0.002)."""
        from ransac_tpu.pipelines.sfm import _np_rodrigues

        pose = m.camera_poses[f_anchor]
        Ra = _np_rodrigues(pose[:3])
        out = []
        for k, tr in enumerate(tids):
            if not inl[k] or tr not in m.points:
                continue
            z_tv = z_tv_fn(k)
            if not np.isfinite(z_tv) or z_tv <= 1e-6:
                continue
            xc = Ra @ m.points[tr] + pose[3:]
            if xc[2] <= 1e-6:
                continue
            uv_pred = (Kn[:2, :2] @ (xc[:2] / xc[2])) + Kn[:2, 2]
            uv_obs = tracks.get((f_anchor, tr))
            if uv_obs is None or np.linalg.norm(
                    uv_pred - np.asarray(uv_obs, np.float64)) > 3.0:
                continue
            out.append(xc[2] / z_tv)
        return np.asarray(out)

    ratios_i = _ratios(fi, common, lambda k: X_np[k, 2])
    ratios_j = _ratios(fj, common_j,
                       lambda k: (R_np @ X_np[k] + t_np)[2])
    if len(ratios_i) < 4 or len(ratios_j) < 4:
        log.info("closure %d-%d REJECTED: %d/%d scale anchors",
                 fi, fj, len(ratios_i), len(ratios_j))
        return None
    s_i = float(np.median(ratios_i))
    s_j = float(np.median(ratios_j))
    # Consistency gate: a valid closure's depth ratios agree (one rigid
    # scale per side); wildly spread or near-zero ratios mean the
    # essential fit locked onto a wrong-correspondence consensus and the
    # edge would poison the pose graph (observed: a "scale 0.000" edge).
    mad_i = float(np.median(np.abs(ratios_i - s_i)))
    mad_j = float(np.median(np.abs(ratios_j - s_j)))
    # No spread gate: the anchor spread is dominated by the MAP's own
    # internal scale drift (points near a frame were triangulated at
    # different drifted epochs) — the medians are already robust, and
    # with several-x accumulated drift even a +-50%-noisy scale edge is
    # ~6:1 signal in log-scale.  Only outright-degenerate scales
    # reject.
    rel = s_j / max(s_i, 1e-12)
    if not (1e-3 < s_i < 1e3 and 1e-3 < s_j < 1e3 and 0.1 < rel < 10.0):
        # The relative-scale bound is physical: accumulated monocular
        # drift between revisits stays within ~an order of magnitude,
        # while a collapsed-depth anchor set produces 100x ratios that
        # wreck the Sim(3) graph (observed: an s_j = 0.001 edge pushing
        # node scales to 0.008..28.8 and the PGO cost to 1e5).
        log.info("closure %d-%d REJECTED: scales %.3f/%.3f rel %.3f "
                 "(%d/%d ratios)", fi, fj, s_i, s_j, rel,
                 len(ratios_i), len(ratios_j))
        return None
    # Sim(3) edge j <- i: x_map_j = (s_j/s_i) R x_map_i + s_j t_unit.
    z7 = np.concatenate([np.asarray(log_so3(R), np.float64),
                         s_j * t_np.astype(np.float64),
                         [np.log(s_j / s_i)]])
    log.info("closure %d-%d: %d/%d essential inliers, scales "
             "%.3f/%.3f (rel %.3f)", fi, fj, n, len(common), s_i, s_j,
             s_j / s_i)
    return z7, n


def build_pose_graph(m, tracks: dict, K,
                     closure_pairs: list[tuple[int, int]],
                     ransac_cfg: RansacConfig | None = None,
                     loop_weight: float = 2.0, seed: int = 17):
    """Sim(3) pose graph over the registered frames: odometry edges
    between consecutive registered frames (relative similarity measured
    from the incremental SfM estimates, scale 1 — locally consistent,
    globally drifted) + measured Sim(3) loop-closure edges carrying the
    observed relative scale.  Returns ``(graph, frame_list,
    n_loop_edges)``."""
    frames = sorted(m.camera_poses)
    fidx = {f: k for k, f in enumerate(frames)}
    poses6 = np.stack([m.camera_poses[f] for f in frames])
    poses7 = jnp.asarray(
        np.concatenate([poses6, np.zeros((len(frames), 1))], axis=1),
        jnp.float32)
    ei, ej, ez, ew, esw = [], [], [], [], []
    for a, b in zip(frames[:-1], frames[1:]):
        z = relative(jnp.asarray(poses6[fidx[a]], jnp.float32),
                     jnp.asarray(poses6[fidx[b]], jnp.float32))
        ei.append(fidx[a])
        ej.append(fidx[b])
        ez.append(np.concatenate([np.asarray(z, np.float64), [0.0]]))
        ew.append(1.0)
        # Odometry observes no relative scale (the monocular
        # unobservable); only loop closures carry a measured scale.
        esw.append(0.0)
    n_loop = 0
    for pair in closure_pairs:
        fi, fj = pair[0], pair[1]
        uv_pair = (pair[2], pair[3]) if len(pair) > 2 else None
        if fi not in fidx or fj not in fidx:
            continue
        out = closure_edge(tracks, m, K, fi, fj, ransac_cfg,
                           seed=seed + n_loop, uv_pair=uv_pair)
        if out is None:
            continue
        z7, _n = out
        ei.append(fidx[fi])
        ej.append(fidx[fj])
        ez.append(z7)
        ew.append(loop_weight)
        esw.append(1.0)
        n_loop += 1
    g = PoseGraphSim3(
        poses=poses7,
        edge_i=jnp.asarray(np.array(ei, np.int32)),
        edge_j=jnp.asarray(np.array(ej, np.int32)),
        edge_z=jnp.asarray(np.stack(ez).astype(np.float32)),
        edge_w=jnp.asarray(np.array(ew, np.float32)),
        edge_sw=jnp.asarray(np.array(esw, np.float32)))
    return g, frames, n_loop


def apply_pose_graph(m, tracks: dict, K,
                     ransac_cfg: RansacConfig | None = None,
                     min_gap: int = 16, min_shared: int = 24,
                     seed: int = 17, frontend=None) -> int:
    """Detect closures, optimize the pose graph, and write the corrected
    poses back into the map (points are NOT moved here — callers should
    retriangulate / re-run BA from the corrected poses).  Returns the
    number of loop edges used (0 = nothing to do, map untouched).

    ``frontend = (xy, valid, desc)`` enables APPEARANCE-based closure
    detection (descriptor matching of far frame pairs) in addition to
    track covisibility — required whenever the tracker only matches
    consecutive frames, since no track id survives a full revisit."""
    from ransac_tpu.ba.posegraph import (optimize_pose_graph_sim3,
                                         sim3_to_se3)

    frames = sorted(m.camera_poses)
    pairs: list = loop_closure_pairs(tracks, frames, min_gap=min_gap,
                                     min_shared=min_shared)
    if frontend is not None:
        xy, valid, desc = frontend
        app = detect_closures_appearance(
            xy, valid, desc, min_gap=min_gap,
            min_matches=max(min_shared, 16))
        covis = {(a, b) for a, b in pairs}
        for fi, fj, uv_i, uv_j in app:
            if (fi, fj) not in covis:
                pairs.append((fi, fj, uv_i, uv_j))
    if not pairs:
        return 0
    g, frame_list, n_loop = build_pose_graph(
        m, tracks, K, pairs, ransac_cfg, seed=seed)
    if n_loop == 0:
        return 0
    poses_new, cost, iters = optimize_pose_graph_sim3(g)
    scales = np.exp(np.asarray(poses_new[:, 6], np.float64))
    log.info("pose graph (sim3): %d nodes, %d edges (%d loop), cost "
             "%.4g (%d iters); node scales %.3f..%.3f", len(frame_list),
             int(g.edge_i.shape[0]), n_loop, float(cost), int(iters),
             float(scales.min()), float(scales.max()))
    poses_np = np.asarray(sim3_to_se3(poses_new), np.float64)
    for k, f in enumerate(frame_list):
        m.camera_poses[f] = poses_np[k]
    return n_loop
