"""Incremental SfM: two-view bootstrap -> PnP registration -> triangulation
-> bundle adjustment (BASELINE.json configs[3]).

Pipeline (host orchestration, jitted per-step kernels — registration and
triangulation go through the same RANSAC/geometry core as everything else):

1. initialize from the first two frames (essential RANSAC + cheirality +
   triangulation, pipelines.twoview machinery on known correspondences),
2. for each new frame: PnP-RANSAC against the current map (vmapped P3P) +
   LM refine,
3. triangulate new correspondences against the best covisible frame,
4. global LM-BA with Schur complement every frame (cheap at these sizes)
   or on demand.

The driver works on a correspondence table (frame, track_id, uv) — the
output of the feature/matching front end or synthetic tracks in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ransac_tpu.ba.bundle import BAProblem, bundle_adjust
from ransac_tpu.models import ransac as ransac_mod
from ransac_tpu.ops import epipolar
from ransac_tpu.ops import projection as proj
from ransac_tpu.ops.rotation import exp_so3, log_so3
from ransac_tpu.utils.config import BundleAdjustConfig, RansacConfig
from ransac_tpu.utils.logging import get_logger

log = get_logger("sfm")


def _bucket(n: int, minimum: int = 16) -> int:
    """Next power-of-two size >= n: per-frame correspondence counts vary
    continuously, and without bucketing every registration/triangulation
    call retraces + recompiles its kernels for a fresh static shape (the
    dominant cost of a long trajectory on the host).  Padded rows carry
    weight 0 (RANSAC) or are sliced off (triangulation)."""
    return max(minimum, 1 << (max(n, 1) - 1).bit_length())


def _pad_rows(a: np.ndarray, m: int) -> np.ndarray:
    pad = m - a.shape[0]
    if pad <= 0:
        return a
    return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])


@dataclass
class SfmMap:
    K: np.ndarray
    camera_poses: dict = field(default_factory=dict)   # frame -> [6]
    points: dict = field(default_factory=dict)         # track -> [3]
    # Frames registered by the frame-by-frame rescue stage (round 5):
    # callers report trajectory error over the windowed-pass frames and
    # the rescued tail separately, since rescued sections may sit across
    # a motion-prior scale seam (see incremental_sfm rescue notes).
    rescued_frames: set = field(default_factory=set)

    def as_ba_problem(self, tracks) -> tuple[BAProblem, list, list]:
        frames = sorted(self.camera_poses)
        track_ids = sorted(self.points)
        fidx = {f: i for i, f in enumerate(frames)}
        tidx = {t: i for i, t in enumerate(track_ids)}
        obs_cam, obs_pt, obs_uv = [], [], []
        for (f, t), uv in tracks.items():
            if f in fidx and t in tidx:
                obs_cam.append(fidx[f])
                obs_pt.append(tidx[t])
                obs_uv.append(uv)
        p = BAProblem(
            cameras=jnp.asarray(
                np.stack([self.camera_poses[f] for f in frames]), jnp.float32),
            points=jnp.asarray(
                np.stack([self.points[t] for t in track_ids]), jnp.float32),
            K=jnp.asarray(self.K, jnp.float32),
            obs_cam=jnp.asarray(np.array(obs_cam, np.int32)),
            obs_pt=jnp.asarray(np.array(obs_pt, np.int32)),
            obs_uv=jnp.asarray(np.array(obs_uv), jnp.float32),
            obs_w=jnp.ones(len(obs_cam), jnp.float32))
        return p, frames, track_ids

    def apply_ba(self, res, frames, track_ids):
        cams = np.asarray(res.cameras, np.float64)
        pts = np.asarray(res.points, np.float64)
        for i, f in enumerate(frames):
            self.camera_poses[f] = cams[i]
        for i, t in enumerate(track_ids):
            self.points[t] = pts[i]


# --------------------------------------------------------------------
# Jitted dispatch wrappers: the RANSAC/geometry WRAPPERS (winner
# re-solve, inlier refit, LM polish) are plain functions whose dozens of
# intermediate ops dispatch EAGERLY when called from host orchestration
# code — ~free on CPU, but through an accelerator tunnel every eager op
# is a host round-trip (measured: ~26 s per registered frame on the TPU
# demo, ~50x the actual device work).  One jit per pipeline call keeps
# the whole step on device.
from functools import partial as _partial


@_partial(jax.jit, static_argnames=("cfg", "use_sweep"))
def _pnp_dispatch(Xw, uv, K, w, key, cfg, use_sweep):
    """Returns ONE packed [13] vector (model 12 + inlier count): the
    registration loop needs both, and each separate device->host fetch
    is a tunnel round-trip."""
    fn = (ransac_mod.ransac_pnp_sweep if use_sweep
          else ransac_mod.ransac_pnp)
    res = fn(Xw, uv, K, w, cfg, key)
    return jnp.concatenate(
        [res.model, res.num_inliers[None].astype(res.model.dtype)])


@_partial(jax.jit, static_argnames=("cfg", "use_sweep"))
def _essential_dispatch(x1, x2, w, cfg, key, use_sweep):
    fn = (ransac_mod.ransac_essential_sweep if use_sweep
          else ransac_mod.ransac_essential)
    res = fn(x1, x2, w, cfg, key)
    R, t, X, n = epipolar.recover_pose(
        res.model, x1, x2, res.inlier_mask.astype(jnp.float32))
    return res.inlier_mask, R, t, X, n


_tri_dlt_jit = jax.jit(epipolar.triangulate_dlt)


@jax.jit
def _tri_tracks_jit(x1n, x2n, R1, t1, R2, t2, valid, cos_min, gate_n):
    """Batched PER-TRACK 2-view DLT with on-device gates: every row is
    its own track with its own pose pair ([T,...] arrays; padded rows
    carry valid=0).  Returns (X [T,3], ok [T]).

    Round-5 motivation (VERDICT r4 #4): the per-pair-group host loop
    issued one tunnel dispatch per (g1, g2) group — the TPU demo
    measured ~20 s PER retriangulation pass (~100 groups x ~0.2 s
    round-trip) against ~milliseconds of device work.  One batched call
    replaces all of them."""
    X = epipolar.triangulate_dlt(
        x1n[:, None, :], x2n[:, None, :], R1, t1, R2, t2)[:, 0, :]

    def view_ok(R, t, xn):
        xc = jnp.einsum("tij,tj->ti", R, X) + t
        z = xc[:, 2]
        zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        pr = xc[:, :2] / zs[:, None]
        return (z > 0) & (jnp.linalg.norm(pr - xn, axis=1) <= gate_n)

    ok = valid & view_ok(R1, t1, x1n) & view_ok(R2, t2, x2n)
    C1 = -jnp.einsum("tij,ti->tj", R1, t1)
    C2 = -jnp.einsum("tij,ti->tj", R2, t2)
    r1 = X - C1
    r2 = X - C2
    den = jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1)
    cosang = jnp.sum(r1 * r2, axis=1) / jnp.maximum(den, 1e-30)
    ok = ok & (den > 0) & (cosang <= cos_min)
    return X, ok


def _triangulate_tracks_batched(m, tracks, assign: dict, Kj, gate_n,
                                min_angle_deg: float = 1.0) -> dict:
    """Triangulate ``assign = {tid: (g1, g2)}`` in ONE device call (see
    `_tri_tracks_jit`); returns {tid: X} for gate survivors."""
    if not assign:
        return {}
    tids = sorted(assign)
    T = _bucket(len(tids))
    Rs = {}
    for g1, g2 in assign.values():
        for g in (g1, g2):
            if g not in Rs:
                Rs[g] = _np_rodrigues(m.camera_poses[g][:3])
    x1 = np.zeros((T, 2), np.float32)
    x2 = np.zeros((T, 2), np.float32)
    R1 = np.tile(np.eye(3, dtype=np.float32), (T, 1, 1))
    R2 = np.tile(np.eye(3, dtype=np.float32), (T, 1, 1))
    t1 = np.zeros((T, 3), np.float32)
    t2 = np.zeros((T, 3), np.float32)
    vmask = np.zeros((T,), bool)
    for k, tid in enumerate(tids):
        g1, g2 = assign[tid]
        x1[k] = tracks[(g1, tid)]
        x2[k] = tracks[(g2, tid)]
        R1[k] = Rs[g1]
        R2[k] = Rs[g2]
        t1[k] = m.camera_poses[g1][3:]
        t2[k] = m.camera_poses[g2][3:]
        vmask[k] = True
    x1n = proj.normalize_pixels(jnp.asarray(x1), Kj)
    x2n = proj.normalize_pixels(jnp.asarray(x2), Kj)
    X, ok = _tri_tracks_jit(
        x1n, x2n, jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2),
        jnp.asarray(t2), jnp.asarray(vmask),
        jnp.float32(np.cos(np.deg2rad(min_angle_deg))),
        jnp.float32(gate_n))
    X = np.asarray(X, np.float64)
    ok = np.asarray(ok)
    return {tid: X[k] for k, tid in enumerate(tids) if ok[k]}


def _np_rodrigues(rvec: np.ndarray) -> np.ndarray:
    """Pure-numpy Rodrigues rotation (mirrors ops.rotation.exp_so3).

    Host-side orchestration code calls this per registered frame per
    registration step; the jax version dispatched EAGERLY through the
    accelerator tunnel costs ~seconds per op there (measured: 7-15 s
    per registered frame on the TPU demo, all of it host<->device
    chatter for 3x3 rotations)."""
    r = np.asarray(rvec, np.float64)
    th = float(np.linalg.norm(r))
    if th < 1e-12:
        return np.eye(3)
    k = r / th
    Kx = np.array([[0.0, -k[2], k[1]],
                   [k[2], 0.0, -k[0]],
                   [-k[1], k[0], 0.0]])
    return np.eye(3) + np.sin(th) * Kx + (1.0 - np.cos(th)) * (Kx @ Kx)


def _np_log_so3(R: np.ndarray) -> np.ndarray:
    """Pure-numpy rotation log (mirrors ops.rotation.log_so3) — same
    eager-dispatch rationale as _np_rodrigues."""
    R = np.asarray(R, np.float64)
    cos = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = float(np.arccos(cos))
    if th < 1e-8:
        return 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                               R[1, 0] - R[0, 1]])
    if th > np.pi - 1e-6:
        # Near pi: axis from the symmetric part.
        A = (R + np.eye(3)) / 2.0
        k = np.sqrt(np.maximum(np.diagonal(A), 0.0))
        i = int(np.argmax(k))
        axis = A[:, i] / max(k[i], 1e-12)
        axis = axis / max(np.linalg.norm(axis), 1e-12)
        return th * axis
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                  R[1, 0] - R[0, 1]]) / (2.0 * np.sin(th))
    return th * w


def _triangulate_pair_gated(m, tracks, g1, g2, track_list, Kj, gate_n,
                            min_angle_deg: float = 1.0):
    """Batched 2-view DLT of ``track_list`` between registered frames
    ``g1``/``g2`` with cheirality + reprojection + triangulation-ANGLE
    gates (normalized units / degrees).  The angle gate is the one that
    matters for map quality: a low-parallax pair fits both views exactly
    at quasi-arbitrary depth, passes every reprojection test, and then
    poisons PnP for all later frames (measured on the SLAM demo:
    admitting adjacent-frame points doubles the trajectory ATE).
    Returns {track_id: X} for the survivors."""
    if not track_list:
        return {}
    nt = _bucket(len(track_list))
    x1 = proj.normalize_pixels(jnp.asarray(_pad_rows(
        np.stack([tracks[(g1, t)] for t in track_list]), nt),
        jnp.float32), Kj)
    x2 = proj.normalize_pixels(jnp.asarray(_pad_rows(
        np.stack([tracks[(g2, t)] for t in track_list]), nt),
        jnp.float32), Kj)
    pose1 = m.camera_poses[g1]
    pose2 = m.camera_poses[g2]
    R1 = _np_rodrigues(pose1[:3])
    R2 = _np_rodrigues(pose2[:3])
    Xn = np.asarray(_tri_dlt_jit(
        x1, x2,
        jnp.asarray(R1, jnp.float32),
        jnp.asarray(pose1[3:], jnp.float32),
        jnp.asarray(R2, jnp.float32),
        jnp.asarray(pose2[3:], jnp.float32)), np.float64)
    x1_n = np.asarray(x1, np.float64)
    x2_n = np.asarray(x2, np.float64)
    C1 = -R1.T @ pose1[3:]
    C2 = -R2.T @ pose2[3:]
    cos_min = np.cos(np.deg2rad(min_angle_deg))
    out = {}
    for i, tr in enumerate(track_list):
        ok = True
        for Rv, pose, xn in ((R1, pose1, x1_n[i]), (R2, pose2, x2_n[i])):
            xc = Rv @ Xn[i] + pose[3:]
            if xc[2] <= 0 or np.linalg.norm(xc[:2] / xc[2] - xn) > gate_n:
                ok = False
                break
        if ok:
            r1 = Xn[i] - C1
            r2 = Xn[i] - C2
            den = np.linalg.norm(r1) * np.linalg.norm(r2)
            if den <= 0 or np.dot(r1, r2) / den > cos_min:
                ok = False
        if ok:
            out[tr] = Xn[i]
    return out


def _cam_center(pose6: np.ndarray) -> np.ndarray:
    """Camera center -R^T t of a (rvec, tvec) world->camera pose
    (pure numpy — called O(registered frames) per registration)."""
    R = _np_rodrigues(pose6[:3])
    return -R.T @ np.asarray(pose6[3:6])


def _mean_reproj_error(m, tracks, t, X, frames_of_t):
    """Mean pixel reprojection error of candidate point X over the
    track's registered observations (host-side, small)."""
    K = np.asarray(m.K, np.float64)
    errs = []
    for g in frames_of_t:
        pose = m.camera_poses[g]
        Rv = _np_rodrigues(pose[:3])
        xc = Rv @ X + pose[3:]
        if xc[2] <= 1e-9:
            return np.inf
        uv = K[:2, :2] @ (xc[:2] / xc[2]) + K[:2, 2]
        errs.append(np.linalg.norm(uv - tracks[(g, t)]))
    return float(np.mean(errs)) if errs else np.inf


def _retriangulate_widest(m, tracks, gate_n, rebuild: bool = False):
    """Re-solve map points from their WIDEST pair of registered
    observations (run after each BA), accepting a candidate ONLY if it
    lowers the point's mean reprojection error over ALL its registered
    observations: points admitted from a narrow baseline carry
    quasi-arbitrary depth that a 2-view gate cannot detect, and the
    widest pair fixes them — but blindly overwriting healthy BA-refined
    points with a 2-view solve from drifted poses makes the map WORSE
    (measured on the SLAM demo), so the update must be monotone.

    ``rebuild=True`` (after a pose-graph correction): the old points
    live in the PRE-correction drifted frame and are all invalid — the
    map is cleared and EVERY track with >= 2 registered observations is
    re-triangulated unconditionally (gates still apply; no monotone
    check against stale points)."""
    frames_reg = sorted(m.camera_poses)
    fset = set(frames_reg)
    if rebuild:
        m.points.clear()
    obs_by_track: dict = {}
    for (g, t), _ in tracks.items():
        if (rebuild or t in m.points) and g in fset:
            obs_by_track.setdefault(t, []).append(g)
    # "Widest" = the observation pair with the LARGEST ESTIMATED
    # BASELINE (camera-center distance), not the widest frame-index
    # span — on loop trajectories the index-extreme frames can be
    # spatially coincident (see the partner-selection note in
    # incremental_sfm).
    centers = {g: _cam_center(m.camera_poses[g]) for g in frames_reg}
    assign: dict = {}
    for t, gs in obs_by_track.items():
        if len(gs) < 2:
            continue
        gs_s = sorted(set(gs))
        C = np.stack([centers[g] for g in gs_s])
        d2 = np.sum((C[:, None] - C[None, :]) ** 2, -1)
        i1, i2 = np.unravel_index(int(np.argmax(d2)), d2.shape)
        if d2[i1, i2] <= 0:
            continue
        assign[t] = tuple(sorted((gs_s[i1], gs_s[i2])))
    Kj = jnp.asarray(m.K, jnp.float32)
    n_acc = 0
    for tr, X in _triangulate_tracks_batched(
            m, tracks, assign, Kj, gate_n).items():
        if rebuild or tr not in m.points:
            m.points[tr] = X
            n_acc += 1
            continue
        gs = obs_by_track[tr]
        if (_mean_reproj_error(m, tracks, tr, X, gs)
                < _mean_reproj_error(m, tracks, tr, m.points[tr], gs)):
            m.points[tr] = X
            n_acc += 1
    if n_acc:
        log.info("retriangulated %d map points (widest-pair, monotone)",
                 n_acc)


def reassociate_map_points(m, tracks, keypoints, frames_window,
                           max_px: float = 3.0, added: list | None = None
                           ) -> int:
    """Guided re-association (the ORB-SLAM "track local map" step):
    project the CURRENT map into each freshly-registered frame and
    attach unclaimed detected keypoints within ``max_px`` of a
    projection as new observations of the projected track.

    Round-5 motivation: the consecutive-frame tracker fragments tracks
    (keypoint dropout under NMS churn), so mid-trajectory frames saw
    only 9-17 map correspondences against a 500+ point map — starving
    PnP, shrinking triangulation baselines, and jagging the odometry.
    Re-association repairs the fragmentation with the map itself.

    ``keypoints = (xy [F, K, 2], valid [F, K])`` from the front end.
    One-to-one greedy by distance; keypoints already serving an
    observation in the frame and tracks already observed there are
    skipped.  Pure numpy (hundreds of points x one pose per frame).
    Returns the number of observations added."""
    xy, valid = keypoints
    if added is None:
        added = []
    if not m.points:
        return 0
    tids = sorted(m.points)
    X = np.stack([m.points[t] for t in tids])
    K = np.asarray(m.K, np.float64)
    n_added = 0
    for f in frames_window:
        if f not in m.camera_poses or f >= len(xy):
            continue
        pose = m.camera_poses[f]
        R = _np_rodrigues(pose[:3])
        xc = X @ R.T + pose[3:]
        front = xc[:, 2] > 1e-6
        uv_p = np.full((len(tids), 2), 1e9)
        uv_p[front] = (xc[front, :2] / xc[front, 2:]) @ K[:2, :2].T \
            + K[:2, 2]
        seen_tids = {t for (g, t) in tracks if g == f}
        used_uv = {tuple(np.asarray(tracks[(f, t)], np.float64))
                   for t in seen_tids}
        kp = np.asarray(xy[f], np.float64)
        kv = np.asarray(valid[f], bool)
        free_kp = [k for k in range(len(kp)) if kv[k]
                   and tuple(kp[k]) not in used_uv]
        if not free_kp:
            continue
        cand_t = [i for i, t in enumerate(tids) if t not in seen_tids
                  and front[i]]
        if not cand_t:
            continue
        d = np.linalg.norm(kp[free_kp][:, None, :]
                           - uv_p[cand_t][None, :, :], axis=2)
        order = np.argsort(d, axis=None)
        taken_k: set = set()
        taken_t: set = set()
        for flat in order:
            ki, ti = np.unravel_index(flat, d.shape)
            if d[ki, ti] > max_px:
                break
            if ki in taken_k or ti in taken_t:
                continue
            taken_k.add(ki)
            taken_t.add(ti)
            tracks[(f, tids[cand_t[ti]])] = kp[free_kp[ki]]
            added.append((f, tids[cand_t[ti]]))
            n_added += 1
    return n_added


def frame_reproj_errors(m, tracks) -> dict:
    """Median reprojection error (pixels) per registered frame over its
    observations of current map points (host numpy — thousands of obs)."""
    K = np.asarray(m.K, np.float64)
    errs: dict = {}
    Rs = {f: _np_rodrigues(m.camera_poses[f][:3]) for f in m.camera_poses}
    for (f, t), uv in tracks.items():
        if f not in m.camera_poses or t not in m.points:
            continue
        pose = m.camera_poses[f]
        xc = Rs[f] @ m.points[t] + pose[3:]
        if xc[2] <= 1e-9:
            e = np.inf
        else:
            pr = K[:2, :2] @ (xc[:2] / xc[2]) + K[:2, 2]
            e = float(np.linalg.norm(pr - np.asarray(uv, np.float64)))
        errs.setdefault(f, []).append(e)
    return {f: float(np.median(v)) for f, v in errs.items()}


def reregister_outlier_frames(m, tracks, ransac_cfg=None,
                              factor: float = 3.0, min_px: float = 4.0,
                              engine: str | None = None,
                              seed: int = 99) -> int:
    """Re-localize frames whose pose broke during incremental
    reconstruction: any frame whose MEDIAN reprojection error exceeds
    ``max(factor * trajectory median, min_px)`` is re-registered by
    PnP-RANSAC against the CURRENT map, and the new pose is kept only if
    it actually lowers that frame's median error (monotone, like the
    widest-pair retriangulation).  Measured failure mode this repairs
    (round 5, circuit demo): frames registered early against the thin
    16-point bootstrap seed can lock a bad pose that later BAs cannot
    leave (the gauge pin keeps frame 0 fixed while the maturing map
    drifts coherently away — frame 0's estimated baseline to frame 1
    reached 77x the median step).  Returns the number of frames moved.
    Relocalization against the map is the standard SLAM recovery
    (generalizes the reference's single-image PnP,
    /root/reference/main_v1.py:497)."""
    from ransac_tpu.utils.config import RansacConfig

    if engine is None:
        engine = ("sweep" if jax.devices()[0].platform == "tpu"
                  else "stage")
    cfg = ransac_cfg or RansacConfig(threshold=4.0, num_hypotheses=2048,
                                     exhaustive=False)
    errs = frame_reproj_errors(m, tracks)
    if not errs:
        return 0
    med = float(np.median(list(errs.values())))
    gate = max(factor * med, min_px)
    bad = sorted(f for f, e in errs.items() if e > gate)
    if not bad:
        return 0
    Kj = jnp.asarray(m.K, jnp.float32)
    key = jax.random.key(seed)
    n_moved = 0
    for f in bad:
        vis = sorted(t for t in m.points if (f, t) in tracks)
        if len(vis) < 6:
            continue
        nb = _bucket(len(vis))
        Xw = _pad_rows(np.stack([m.points[t] for t in vis]), nb)
        uv = _pad_rows(np.stack([tracks[(f, t)] for t in vis]), nb)
        w_vis = jnp.asarray(_pad_rows(np.ones(len(vis), np.float32), nb))
        key, k2 = jax.random.split(key)
        packed = np.asarray(_pnp_dispatch(
            jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
            Kj, w_vis, k2, cfg, engine == "sweep" and nb <= 512),
            np.float64)
        pose_new = np.concatenate(
            [_np_log_so3(packed[:9].reshape(3, 3)), packed[9:12]])
        old = m.camera_poses[f]
        m.camera_poses[f] = pose_new
        e_new = frame_reproj_errors(m, {k: v for k, v in tracks.items()
                                        if k[0] == f}).get(f, np.inf)
        if e_new < errs[f]:
            n_moved += 1
            log.info("re-registered frame %d: median reproj %.1f -> "
                     "%.1f px (%d/%d PnP inliers)", f, errs[f], e_new,
                     int(packed[12]), len(vis))
        else:
            m.camera_poses[f] = old
    return n_moved


def prune_observations(p: BAProblem, max_px: float) -> tuple[BAProblem, int]:
    """Zero the weight of observations whose current reprojection residual
    exceeds ``max_px`` (standard SfM outlier rejection before a final BA
    polish: RANSAC gates registration, but chained wrong matches can still
    carry high-residual observations into the problem).  Returns the
    pruned problem and the number of observations dropped."""
    cams = np.asarray(p.cameras, np.float64)
    pts = np.asarray(p.points, np.float64)
    K = np.asarray(p.K, np.float64)
    oc = np.asarray(p.obs_cam)
    op = np.asarray(p.obs_pt)
    uv = np.asarray(p.obs_uv, np.float64)
    w = np.asarray(p.obs_w, np.float64)
    R = np.stack([_np_rodrigues(c[:3]) for c in cams])
    xc = np.einsum("oij,oj->oi", R[oc], pts[op]) + cams[oc, 3:]
    z = np.where(np.abs(xc[:, 2]) < 1e-12, 1e-12, xc[:, 2])
    proj_uv = (K[:2, :2] @ (xc[:, :2] / z[:, None]).T).T + K[:2, 2]
    r = np.linalg.norm(proj_uv - uv, axis=1)
    bad = (r > max_px) | (xc[:, 2] <= 0)
    n_drop = int((bad & (w > 0)).sum())
    w_new = np.where(bad, 0.0, w)
    return p._replace(obs_w=jnp.asarray(w_new, jnp.float32)), n_drop


def incremental_sfm(
    tracks: dict,            # {(frame, track_id): uv ndarray[2]}
    K: np.ndarray,
    frame_order: list[int],
    ransac_cfg: RansacConfig = RansacConfig(
        threshold=4.0, num_hypotheses=4096, exhaustive=False),
    ba_cfg: BundleAdjustConfig = BundleAdjustConfig(max_iters=15),
    ba_every: int = 1,
    seed: int = 0,
    checkpoint_dir: str | None = None,
    engine: str | None = None,
    bootstrap_stride: int = 1,
    keypoints=None,
) -> SfmMap:
    """Run incremental reconstruction over ``frame_order``.

    The world frame is the first camera; global scale is fixed by the
    two-view baseline (unit norm) — standard monocular gauge.

    ``bootstrap_stride``: bootstrap from ``(frame_order[0],
    frame_order[stride])`` instead of the first consecutive pair.  With
    slow camera motion the consecutive-pair parallax can be below the
    pixel noise, triangulating the seed map at effectively infinite depth
    — every later pose then collapses to a rotation-only fit (measured:
    inter-frame baselines shrink 1000x while BA residuals stay ~1 px).  A
    wider bootstrap pair fixes the seed geometry; the skipped intermediate
    frames register afterwards by PnP against the seeded map.

    ``engine``: "sweep" routes bootstrap essential-RANSAC and PnP
    registration through the fused Pallas kernels (counter-replay large-N
    sweeps), "stage" through the vmapped stage-wise engine; default picks
    by platform (sweep on TPU).

    With ``checkpoint_dir``, the map snapshots after every BA (orbax-backed,
    utils.checkpointing) and a rerun resumes from the last registered frame
    instead of recomputing — the reference recomputes its whole search from
    scratch every run (SURVEY.md §5 "checkpoint/resume: absent").
    """
    if engine is None:
        engine = ("sweep" if jax.devices()[0].platform == "tpu"
                  else "stage")
    m = SfmMap(K=np.asarray(K, np.float64))
    ckpt = None
    if checkpoint_dir is not None:
        from ransac_tpu.utils.checkpointing import CheckpointManager

        ckpt = CheckpointManager(checkpoint_dir)
        state = ckpt.restore()
        if state is not None:
            frames = [int(f) for f in np.atleast_1d(state["frames"])]
            m.camera_poses = {
                f: np.asarray(p) for f, p in zip(frames, state["poses"])}
            m.points = {
                int(t): np.asarray(x) for t, x in
                zip(np.atleast_1d(state["track_ids"]), state["points"])}
            log.info("resumed from checkpoint: %d frames, %d points",
                     len(m.camera_poses), len(m.points))

    def save_ckpt(step):
        if ckpt is None or not m.camera_poses:
            return
        frames = sorted(m.camera_poses)
        tids = sorted(m.points)
        ckpt.save(step, {
            "frames": np.array(frames),
            "poses": np.stack([m.camera_poses[f] for f in frames]),
            "track_ids": np.array(tids),
            "points": (np.stack([m.points[t] for t in tids])
                       if tids else np.zeros((0, 3))),
        })

    key = jax.random.key(seed)
    # Resume handling (ADVICE r3): a checkpoint saved right after a
    # wide-pair bootstrap holds frames {0, stride} — re-deriving the
    # bootstrap pair from frame_order[:2] would re-bootstrap from the
    # narrow consecutive pair and overwrite the wide-baseline seed
    # geometry.  Instead: bootstrap is DONE iff any two frames are
    # already registered; registered frames move to the front of
    # frame_order (preserving their order) so they keep serving as
    # triangulation partners, and the stride reorder applies to every
    # fresh bootstrap regardless of how we got here.
    reg = [f for f in frame_order if f in m.camera_poses]
    f_boot_done = len(reg) >= 2
    if f_boot_done:
        frame_order = reg + [f for f in frame_order
                             if f not in m.camera_poses]
        start_idx = len(reg)
    else:
        if bootstrap_stride > 1 and len(frame_order) > 2:
            # ADAPTIVE stride (round 4): the widest pair is only usable
            # if enough tracks SURVIVE it — on trajectories with
            # rotating motion direction, track survival over the
            # requested stride can collapse (measured: 10 common tracks
            # at stride 8 on the circuit demo vs 31 on the line), and a
            # ~10-point seed map starves every later registration.
            # Take the largest stride whose pair shares >= 16 tracks
            # (falling back to the most-shared pair if none does).
            t0_set = {t for g, t in tracks if g == frame_order[0]}
            best_s, best_common = 1, -1
            for s in range(min(bootstrap_stride,
                               len(frame_order) - 1), 0, -1):
                fs = frame_order[s]
                n_common = sum(1 for t in t0_set if (fs, t) in tracks)
                if n_common >= 16:
                    best_s, best_common = s, n_common
                    break
                if n_common > best_common:
                    best_s, best_common = s, n_common
            s = best_s
            if s != bootstrap_stride:
                log.info("bootstrap stride adapted %d -> %d "
                         "(%d common tracks)", bootstrap_stride, s,
                         best_common)
            f1b = frame_order[s]
            frame_order = ([frame_order[0], f1b]
                           + [f for f in frame_order[1:] if f != f1b])
        start_idx = 2
    f0, f1 = frame_order[0], frame_order[1]

    # ---- two-view bootstrap
    Kj = jnp.asarray(K, jnp.float32)
    if not f_boot_done:
        common = sorted(t for t in {t for f, t in tracks if f == f0}
                        if (f1, t) in tracks)
        nb = _bucket(len(common))
        wts = jnp.asarray(_pad_rows(np.ones(len(common), np.float32), nb))
        x1p = _pad_rows(np.stack([tracks[(f0, t)] for t in common]), nb)
        x2p = _pad_rows(np.stack([tracks[(f1, t)] for t in common]), nb)
        x1 = proj.normalize_pixels(jnp.asarray(x1p, jnp.float32), Kj)
        x2 = proj.normalize_pixels(jnp.asarray(x2p, jnp.float32), Kj)
        e_cfg = RansacConfig(
            threshold=(ransac_cfg.threshold / float(K[0, 0])) ** 2,
            num_hypotheses=ransac_cfg.num_hypotheses, exhaustive=False,
            selection=ransac_cfg.selection)
        key, k1 = jax.random.split(key)
        inl_mask, R, t, X, n = _essential_dispatch(
            x1, x2, wts, e_cfg, k1,
            engine == "sweep" and nb <= 1024)
        inl = np.asarray(inl_mask)
        log.info("bootstrap %d-%d: %d/%d essential inliers, %d cheiral",
                 f0, f1, inl.sum(), len(common), int(n))
        m.camera_poses[f0] = np.zeros(6)
        m.camera_poses[f1] = np.concatenate(
            [_np_log_so3(np.asarray(R, np.float64)),
             np.asarray(t, np.float64)])
        X = np.asarray(X, np.float64)
        for i, tr in enumerate(common):
            if inl[i] and X[i, 2] > 0:
                m.points[tr] = X[i]
        save_ckpt(1)

    # ---- incremental registration
    tracks_by_frame: dict = {}
    frames_by_track: dict = {}
    for (g_, t_) in tracks:
        tracks_by_frame.setdefault(g_, set()).add(t_)
        frames_by_track.setdefault(t_, []).append(g_)
    gate_n = 2.0 * ransac_cfg.threshold / float(K[0, 0])
    key_box = [key]

    def _dispatch_pnp(f):
        """Issue frame f's PnP-RANSAC against the CURRENT map without
        blocking; returns ``(vis, device_result)`` or None (too few map
        correspondences yet).  The split from `_finish_pnp` lets a whole
        registration window's dispatches pipeline through the
        accelerator tunnel before the first result is fetched — the
        round-4 demo spent 4-6 BLOCKING round-trips per frame (0.59
        s/frame steady state) on a dependency chain that does not
        actually exist within a window (the map is frozen until the
        window's triangulation pass)."""
        vis = sorted(t for t in m.points if (f, t) in tracks)
        if len(vis) < 6:
            log.warning("frame %d: only %d map correspondences, "
                        "deferring", f, len(vis))
            return None
        nb = _bucket(len(vis))
        Xw = _pad_rows(np.stack([m.points[t] for t in vis]), nb)
        uv = _pad_rows(np.stack([tracks[(f, t)] for t in vis]), nb)
        w_vis = jnp.asarray(_pad_rows(np.ones(len(vis), np.float32), nb))
        key_box[0], k2 = jax.random.split(key_box[0])
        use_sweep = engine == "sweep" and nb <= 512
        return vis, _pnp_dispatch(
            jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
            Kj, w_vis, k2, ransac_cfg, use_sweep)

    def _finish_pnp(f, vis, dev):
        packed = np.asarray(dev, np.float64)
        m.camera_poses[f] = np.concatenate(
            [_np_log_so3(packed[:9].reshape(3, 3)), packed[9:12]])
        log.info("frame %d registered: %d/%d PnP inliers", f,
                 int(packed[12]), len(vis))

    def _triangulate_frames(fs):
        """Triangulate the not-yet-mapped tracks visible in frames
        ``fs`` from EACH TRACK'S OWN widest-baseline pair of registered
        observations (the same principle as the post-BA widest-pair
        retriangulation).  Adjacent-frame baselines can sit below the
        pixel noise — a 2-view triangulation fits both views exactly
        regardless of depth, so the reprojection gate cannot catch the
        resulting quasi-infinite points — and "wide" must be measured
        in ESTIMATED CAMERA-CENTER DISTANCE, not frame-index distance
        (on loop trajectories the index-far frame is spatially close
        again).  The triangulation angle gate remains the real filter.
        One batched pass for the whole window: pair groups merge across
        frames, so device calls stay O(groups), not O(frames)."""
        reg_set = set(m.camera_poses)
        centers = {g: _cam_center(m.camera_poses[g]) for g in reg_set}
        cand = set()
        for f in fs:
            cand |= tracks_by_frame.get(f, set())
        assign: dict = {}
        for t in cand:
            if t in m.points:
                continue
            gs = sorted(g for g in frames_by_track.get(t, ())
                        if g in reg_set)
            if len(gs) < 2:
                continue
            C = np.stack([centers[g] for g in gs])
            d2 = np.sum((C[:, None] - C[None, :]) ** 2, -1)
            i1, i2 = np.unravel_index(int(np.argmax(d2)), d2.shape)
            if d2[i1, i2] <= 0:
                continue
            assign[t] = tuple(sorted((gs[i1], gs[i2])))
        m.points.update(_triangulate_tracks_batched(
            m, tracks, assign, Kj, gate_n))

    def run_ba(after_f):
        # NOTE on shape bucketing: padding the BA problem to power-of-2
        # buckets (fewer unique shapes -> fewer per-window recompiles)
        # was tried and REVERTED — the dense path's C x P cross tensors
        # inflate ~2.7x with the padding (measured: warm window BA 2.6
        # -> 5.5 s on the TPU demo), and the reordered f32 reductions
        # perturb the accept/reject LM path.  The persistent compile
        # cache (cli._enable_compile_cache) removes the recompile tax
        # across processes instead.
        p, frames, track_ids = m.as_ba_problem(tracks)
        res_ba = bundle_adjust(p, ba_cfg)
        m.apply_ba(res_ba, frames, track_ids)
        log.info("BA after frame %d: cost %.4g -> %.4g (%d iters)",
                 after_f, float(res_ba.initial_cost), float(res_ba.cost),
                 int(res_ba.iterations))
        _retriangulate_widest(m, tracks, gate_n)

    # Main pass + retry passes, WINDOWED (round 5): frames register in
    # windows of ``ba_every`` against a map frozen for the window — all
    # of a window's PnP dispatches are in flight before the first
    # result is fetched, then ONE window-wide triangulation pass and
    # one BA.  A frame deferred for lack of map correspondences often
    # becomes registrable once later frames have grown the map (the
    # retry passes; before them, one thin frame could cascade into an
    # unregistered tail — observed on the circuit demo).
    pending = [f for f in frame_order[start_idx:]
               if f not in m.camera_poses]
    n_done = 0
    for pass_i in range(3):
        if not pending:
            break
        if pass_i:
            log.info("retry pass %d over %d deferred frames", pass_i,
                     len(pending))
        still = []
        win = max(1, ba_every)
        for w0 in range(0, len(pending), win):
            window = pending[w0:w0 + win]
            inflight = []
            for f in window:
                d = _dispatch_pnp(f)
                if d is None:
                    still.append(f)
                else:
                    inflight.append((f, d[0], d[1]))
            if not inflight:
                continue
            for f, vis, dev in inflight:
                _finish_pnp(f, vis, dev)
            n_done += len(inflight)
            newly = [f for f, _, _ in inflight]
            _triangulate_frames(newly)
            run_ba(newly[-1])
            if keypoints is not None:
                # Guided re-association AFTER the window's BA: the
                # window poses and map are polished, so projections are
                # trustworthy (re-associating BEFORE BA measured a
                # registration collapse — raw-PnP poses attach wrong
                # tracks and the corruption cascades).  The added
                # observations feed the NEXT window's PnP and BA.
                added: list = []
                n_re = reassociate_map_points(m, tracks, keypoints,
                                              newly, max_px=2.0,
                                              added=added)
                for (gf, gt) in added:
                    tracks_by_frame.setdefault(gf, set()).add(gt)
                    frames_by_track.setdefault(gt, []).append(gf)
                if n_re:
                    log.info("re-associated %d map-point observations "
                             "over %d frames", n_re, len(newly))
            save_ckpt(n_done)
        if len(still) == len(pending):
            break  # no progress: a further pass cannot help
        pending = still

    # ---- frame-by-frame rescue (round 5, registration seed-robustness).
    # The windowed passes freeze the map for a whole window, so on
    # trajectories where the frontier outruns the map (panning circuits:
    # demo seeds 1/2 stalled at 35/23 of 64 frames) a thin frame's
    # failure cascades — the NEXT frame's correspondences needed the
    # triangulations the frozen window never made.  This stage only runs
    # when frames remain unregistered after the windowed passes, so
    # fully-registering runs (the committed seed-0 loop deliverable) are
    # bit-identical.  Policy: walk the stall tail one frame at a time —
    # register, triangulate IMMEDIATELY (the map grows with the
    # frontier), and gate acceptance on PnP inlier count (a near-floor
    # fit here is usually a garbage pose that would poison every later
    # triangulation); BA + guided re-association run every ``win``
    # rescued frames.  Keyframe-style windowing is the throughput path;
    # this is the robustness path, and it is dispatch-serial by design.
    if pending:
        log.info("rescue pass over %d stalled frames", len(pending))
    rescued_since_ba: list = []

    def _twoview_continue(f):
        """Chain frame ``f`` off the best-sharing REGISTERED frame by
        two-view essential RANSAC when PnP cannot see it (fewer than 6
        mapped correspondences — the circuit demo's actual stall: a
        panning frontier whose fresh tracks have no mapped history yet).
        Monocular scale comes from the median map/two-view depth ratio
        over the pair's shared MAPPED tracks (>= 3 anchors required);
        the relative rotation/direction come from the pair's own pixels.
        This is standard SLAM tracking recovery (a mini-bootstrap
        continuation), generalizing the reference's sequential two-view
        chaining (/root/reference/main_v1.py:836-971).  Returns True if
        ``f`` was registered."""
        ts_f = tracks_by_frame.get(f, set())
        best_g, shared = None, ()
        for g in m.camera_poses:
            sh = ts_f & tracks_by_frame.get(g, set())
            if len(sh) > len(shared):
                best_g, shared = g, sh
        if best_g is None or len(shared) < 16:
            return False
        common = sorted(shared)
        nb = _bucket(len(common))
        x1p = _pad_rows(np.stack([tracks[(best_g, t)] for t in common]),
                        nb)
        x2p = _pad_rows(np.stack([tracks[(f, t)] for t in common]), nb)
        wts = jnp.asarray(_pad_rows(np.ones(len(common), np.float32),
                                    nb))
        x1 = proj.normalize_pixels(jnp.asarray(x1p, jnp.float32), Kj)
        x2 = proj.normalize_pixels(jnp.asarray(x2p, jnp.float32), Kj)
        fx = float(m.K[0, 0])
        e_cfg = RansacConfig(
            threshold=(ransac_cfg.threshold / fx) ** 2,
            num_hypotheses=ransac_cfg.num_hypotheses, exhaustive=False,
            selection=ransac_cfg.selection)
        key_box[0], k1 = jax.random.split(key_box[0])
        inl_mask, R_rel, t_rel, X_rel, _n = _essential_dispatch(
            x1, x2, wts, e_cfg, k1, engine == "sweep" and nb <= 1024)
        inl = np.asarray(inl_mask)[:len(common)]
        if int(inl.sum()) < 16:
            return False
        Rg = _np_rodrigues(m.camera_poses[best_g][:3])
        tg = np.asarray(m.camera_poses[best_g][3:6], np.float64)
        X_rel = np.asarray(X_rel, np.float64)
        ratios = []
        for i, tr in enumerate(common):
            if inl[i] and tr in m.points and X_rel[i, 2] > 1e-6:
                d_map = (Rg @ m.points[tr] + tg)[2]
                if d_map > 1e-6:
                    ratios.append(d_map / X_rel[i, 2])
        if len(ratios) >= 3:
            s = float(np.median(ratios))
            src = f"{len(ratios)} map anchors"
        else:
            # No mapped anchors — the very situation that stalled the
            # frame (a frontier whose tracks have no mapped history).
            # Fall back to a MOTION-PRIOR scale: the median inter-frame
            # baseline of consecutive registered frames.  The resulting
            # scale seam is a genuine monocular unobservable here (no
            # co-observations bridge it, else PnP would have worked);
            # downstream it is exactly what the Sim(3) pose-graph
            # closure constrains, and registering the tail at prior
            # scale beats abandoning half the trajectory.
            # LOCAL median: the trajectory's map-unit scale drifts, so
            # the global median step can sit several-x off the scale
            # around the partner frame (measured 0.61 global vs
            # 0.056-0.12 local on the seed-1 circuit); use the last 8
            # consecutive steps at or before the partner.
            regs = sorted(g for g in m.camera_poses if g <= best_g)
            steps = [np.linalg.norm(_cam_center(m.camera_poses[a])
                                    - _cam_center(m.camera_poses[b]))
                     for a, b in zip(regs, regs[1:]) if b - a == 1][-8:]
            if not steps:
                return False
            s = float(np.median(steps)) * max(1, abs(f - best_g))
            src = "motion prior (no map anchors)"
        Rr = np.asarray(R_rel, np.float64)
        tv = np.asarray(t_rel, np.float64)
        R_f = Rr @ Rg
        t_f = Rr @ tg + s * tv
        m.camera_poses[f] = np.concatenate([_np_log_so3(R_f), t_f])
        log.info("rescue: frame %d chained by two-view from frame %d "
                 "(%d/%d essential inliers, scale %.3g from %s)",
                 f, best_g, int(inl.sum()), len(common), s, src)
        return True

    def _rescue_ba():
        run_ba(rescued_since_ba[-1])
        if keypoints is not None:
            added = []
            reassociate_map_points(m, tracks, keypoints,
                                   list(rescued_since_ba), max_px=2.0,
                                   added=added)
            for (gf, gt) in added:
                tracks_by_frame.setdefault(gf, set()).add(gt)
                frames_by_track.setdefault(gt, []).append(gf)
        rescued_since_ba.clear()
        save_ckpt(n_done)

    for pass_i in range(8):
        if not pending:
            break
        still = []
        for f in pending:
            d = _dispatch_pnp(f)
            ok = False
            if d is not None:
                vis, dev = d
                packed = np.asarray(dev, np.float64)
                n_inl = int(packed[12])
                # Inlier gate: absolute floor 8, relative 25% against
                # thin maps — but capped at 20, since 20+ absolute
                # inliers is a solid pose even when the visible map is
                # large and partly stale (seed-2 demo: 24/101 is a good
                # pose the uncapped relative gate rejected).
                if n_inl >= max(8, min(int(0.25 * len(vis)), 20)):
                    _finish_pnp(f, vis, dev)
                    ok = True
                else:
                    log.info("rescue: frame %d PnP rejected (%d/%d "
                             "inliers)", f, n_inl, len(vis))
            if not ok:
                ok = _twoview_continue(f)
            if not ok:
                still.append(f)
                continue
            n_done += 1
            m.rescued_frames.add(f)
            rescued_since_ba.append(f)
            _triangulate_frames([f])
            if len(rescued_since_ba) >= max(1, ba_every):
                _rescue_ba()
        if len(still) == len(pending):
            break
        pending = still
    if rescued_since_ba:
        _rescue_ba()
    if pending:
        log.warning("%d frames remain unregistered after rescue: %s",
                    len(pending), pending[:16])
    return m
