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
    R = np.stack([np.asarray(exp_so3(jnp.asarray(c[:3], jnp.float32)))
                  for c in cams])
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
    if bootstrap_stride > 1 and len(frame_order) > 2 and not m.camera_poses:
        s = min(bootstrap_stride, len(frame_order) - 1)
        f1b = frame_order[s]
        frame_order = ([frame_order[0], f1b]
                       + [f for f in frame_order[1:] if f != f1b])
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
        if engine == "sweep" and nb <= 1024:
            eres = ransac_mod.ransac_essential_sweep(
                x1, x2, wts, e_cfg, k1)
        else:
            eres = ransac_mod.ransac_essential(
                x1, x2, wts, e_cfg, k1)
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
        nb = _bucket(len(vis))
        Xw = _pad_rows(np.stack([m.points[t] for t in vis]), nb)
        uv = _pad_rows(np.stack([tracks[(f, t)] for t in vis]), nb)
        w_vis = jnp.asarray(_pad_rows(np.ones(len(vis), np.float32), nb))
        key, k2 = jax.random.split(key)
        pnp_fn = (ransac_mod.ransac_pnp_sweep
                  if engine == "sweep" and nb <= 512
                  else ransac_mod.ransac_pnp)
        res = pnp_fn(
            jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
            Kj, w_vis, ransac_cfg, k2,)
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
            nt = _bucket(len(new_tracks))
            xp = proj.normalize_pixels(jnp.asarray(_pad_rows(
                np.stack([tracks[(prev, t)] for t in new_tracks]), nt),
                jnp.float32), Kj)
            xf = proj.normalize_pixels(jnp.asarray(_pad_rows(
                np.stack([tracks[(f, t)] for t in new_tracks]), nt),
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
            # Reprojection gate (in normalized units): tracks chained
            # through a wrong match triangulate far off their rays; plain
            # cheirality admits them and one bad map point then corrupts
            # PnP and BA downstream.  2x the RANSAC pixel threshold.
            gate_n = 2.0 * ransac_cfg.threshold / float(K[0, 0])
            xp_n = np.asarray(xp, np.float64)
            xf_n = np.asarray(xf, np.float64)
            for i, tr in enumerate(new_tracks):
                ok = True
                for pose, xn in ((pose_p, xp_n[i]), (pose_f, xf_n[i])):
                    Rv = np.asarray(exp_so3(jnp.asarray(pose[:3], jnp.float32)))
                    xc = Rv @ Xn[i] + pose[3:]
                    if xc[2] <= 0:
                        ok = False
                        break
                    if np.linalg.norm(xc[:2] / xc[2] - xn) > gate_n:
                        ok = False
                        break
                if ok:
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
