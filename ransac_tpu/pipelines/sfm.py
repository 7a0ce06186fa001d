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


@dataclass
class SfmMap:
    K: np.ndarray
    camera_poses: dict = field(default_factory=dict)   # frame -> [6]
    points: dict = field(default_factory=dict)         # track -> [3]

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
) -> SfmMap:
    """Run incremental reconstruction over ``frame_order``.

    The world frame is the first camera; global scale is fixed by the
    two-view baseline (unit norm) — standard monocular gauge.

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
            frame_order = frame_order[:2] + [
                f for f in frame_order[2:] if f not in m.camera_poses]

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
    f0, f1 = frame_order[0], frame_order[1]
    if ckpt is not None and f0 in m.camera_poses and f1 in m.camera_poses:
        f_boot_done = True
    else:
        f_boot_done = False

    # ---- two-view bootstrap
    Kj = jnp.asarray(K, jnp.float32)
    if not f_boot_done:
        common = sorted(t for t in {t for f, t in tracks if f == f0}
                        if (f1, t) in tracks)
        x1p = np.stack([tracks[(f0, t)] for t in common])
        x2p = np.stack([tracks[(f1, t)] for t in common])
        x1 = proj.normalize_pixels(jnp.asarray(x1p, jnp.float32), Kj)
        x2 = proj.normalize_pixels(jnp.asarray(x2p, jnp.float32), Kj)
        e_cfg = RansacConfig(
            threshold=(ransac_cfg.threshold / float(K[0, 0])) ** 2,
            num_hypotheses=ransac_cfg.num_hypotheses, exhaustive=False,
            selection=ransac_cfg.selection)
        key, k1 = jax.random.split(key)
        if engine == "sweep" and len(common) <= 1024:
            eres = ransac_mod.ransac_essential_sweep(
                x1, x2, jnp.ones(len(common)), e_cfg, k1)
        else:
            eres = ransac_mod.ransac_essential(
                x1, x2, jnp.ones(len(common)), e_cfg, k1)
        R, t, X, n = epipolar.recover_pose(
            eres.model, x1, x2, eres.inlier_mask.astype(jnp.float32))
        inl = np.asarray(eres.inlier_mask)
        log.info("bootstrap %d-%d: %d/%d essential inliers, %d cheiral",
                 f0, f1, inl.sum(), len(common), int(n))
        m.camera_poses[f0] = np.zeros(6)
        m.camera_poses[f1] = np.concatenate(
            [np.asarray(log_so3(R), np.float64), np.asarray(t, np.float64)])
        X = np.asarray(X, np.float64)
        for i, tr in enumerate(common):
            if inl[i] and X[i, 2] > 0:
                m.points[tr] = X[i]
        save_ckpt(1)

    # ---- incremental registration
    for step, f in enumerate(frame_order[2:], start=2):
        vis = sorted(t for t in m.points if (f, t) in tracks)
        if len(vis) < 6:
            log.warning("frame %d: only %d map correspondences, skipping",
                        f, len(vis))
            continue
        Xw = np.stack([m.points[t] for t in vis])
        uv = np.stack([tracks[(f, t)] for t in vis])
        key, k2 = jax.random.split(key)
        pnp_fn = (ransac_mod.ransac_pnp_sweep
                  if engine == "sweep" and len(vis) <= 512
                  else ransac_mod.ransac_pnp)
        res = pnp_fn(
            jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
            Kj, jnp.ones(len(vis)), ransac_cfg, k2,)
        Rf, tf = ransac_mod.pnp_pose_from_result(res)
        m.camera_poses[f] = np.concatenate(
            [np.asarray(log_so3(Rf), np.float64),
             np.asarray(tf, np.float64)])
        log.info("frame %d registered: %d/%d PnP inliers", f,
                 int(res.num_inliers), len(vis))

        # ---- triangulate new tracks vs the previous registered frame
        prev = [g for g in frame_order[:step] if g in m.camera_poses][-1]
        new_tracks = sorted(
            t for t in {t for g, t in tracks if g == f}
            if t not in m.points and (prev, t) in tracks)
        if new_tracks:
            xp = proj.normalize_pixels(jnp.asarray(
                np.stack([tracks[(prev, t)] for t in new_tracks]),
                jnp.float32), Kj)
            xf = proj.normalize_pixels(jnp.asarray(
                np.stack([tracks[(f, t)] for t in new_tracks]),
                jnp.float32), Kj)
            pose_p = m.camera_poses[prev]
            pose_f = m.camera_poses[f]
            Xn = epipolar.triangulate_dlt(
                xp, xf,
                exp_so3(jnp.asarray(pose_p[:3], jnp.float32)),
                jnp.asarray(pose_p[3:], jnp.float32),
                exp_so3(jnp.asarray(pose_f[:3], jnp.float32)),
                jnp.asarray(pose_f[3:], jnp.float32))
            Xn = np.asarray(Xn, np.float64)
            for i, tr in enumerate(new_tracks):
                # Cheirality in both views.
                for pose in (pose_p, pose_f):
                    Rv = np.asarray(exp_so3(jnp.asarray(pose[:3], jnp.float32)))
                    if (Rv @ Xn[i] + pose[3:])[2] <= 0:
                        break
                else:
                    m.points[tr] = Xn[i]

        # ---- periodic global BA
        if step % ba_every == 0:
            p, frames, track_ids = m.as_ba_problem(tracks)
            res_ba = bundle_adjust(p, ba_cfg)
            m.apply_ba(res_ba, frames, track_ids)
            log.info("BA after frame %d: cost %.4g -> %.4g (%d iters)",
                     f, float(res_ba.initial_cost), float(res_ba.cost),
                     int(res_ba.iterations))
            save_ckpt(step)
    return m
