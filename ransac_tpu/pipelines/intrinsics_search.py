"""Intrinsics grid search: recover focal length / sensor format by PnP.

Parity with ``/root/reference/testpro-K.py:39-162``
(``estimate_camera_orientation``): for every (focal_length, sensor_size)
combination build K from film physics, run PnP-RANSAC (the reference's
5000-iteration budget becomes the engine's exhaustive/batched hypothesis
tensor), score by mean reprojection error and distance to a known camera
origin, rank, and LM-refine the winner (testpro-K.py:122-125).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ransac_tpu.models import ransac as ransac_mod
from ransac_tpu.ops import projection as proj
from ransac_tpu.ops.rotation import exp_so3, log_so3
from ransac_tpu.utils.config import RansacConfig
from ransac_tpu.utils.logging import get_logger

log = get_logger("intrinsics")

# Reference grids (testpro-K.py:227-233): focal lengths in mm and
# large-format film sizes (w, h) in mm.
DEFAULT_FOCAL_LENGTHS_MM = (90, 100, 120, 150, 180, 210, 240, 300, 360)
DEFAULT_SENSOR_SIZES_MM = ((102, 127), (127, 178), (203, 254))


@dataclass
class IntrinsicsCandidate:
    focal_mm: float
    sensor_mm: tuple
    K: np.ndarray
    rvec: np.ndarray
    tvec: np.ndarray
    n_inliers: int
    mean_err_px: float
    max_err_px: float
    origin: np.ndarray
    dist_to_known: float


@dataclass
class IntrinsicsSearchResult:
    candidates: list          # ranked IntrinsicsCandidate
    best: IntrinsicsCandidate
    refined_rvec: np.ndarray
    refined_tvec: np.ndarray
    refined_mean_err_px: float


def search_intrinsics(
    pos3d: np.ndarray,            # [N,3] (scene-centered recommended)
    pixels: np.ndarray,           # [N,2]
    image_size: tuple,            # (W, H)
    known_origin: np.ndarray | None = None,
    focal_lengths_mm=DEFAULT_FOCAL_LENGTHS_MM,
    sensor_sizes_mm=DEFAULT_SENSOR_SIZES_MM,
    ransac_cfg: RansacConfig = RansacConfig(
        threshold=30.0, num_hypotheses=5000, exhaustive=True),
    rank_by: str = "dist",        # 'dist' (testpro-K.py:99) or 'err'
    seed: int = 0,
) -> IntrinsicsSearchResult:
    W, H = image_size
    n = len(pos3d)
    mask = jnp.ones(n, jnp.float32)
    Xj = jnp.asarray(pos3d, jnp.float32)
    pj = jnp.asarray(pixels, jnp.float32)
    key = jax.random.key(seed)

    cands: list[IntrinsicsCandidate] = []
    for f_mm in focal_lengths_mm:
        for sw, sh in sensor_sizes_mm:
            K = np.asarray(proj.intrinsics_from_physical(
                float(f_mm), float(sw), float(sh), W, H, W / 2.0, H / 2.0),
                dtype=np.float64)
            key, k = jax.random.split(key)
            res = ransac_mod.ransac_pnp(
                Xj, pj, jnp.asarray(K, jnp.float32), mask, ransac_cfg, k)
            R, t = ransac_mod.pnp_pose_from_result(res)
            pix_pred, _ = proj.project_points(
                Xj, R, t, jnp.asarray(K, jnp.float32))
            err = np.linalg.norm(np.asarray(pix_pred) - pixels, axis=1)
            Rn = np.asarray(R, np.float64)
            tn = np.asarray(t, np.float64)
            origin = -Rn.T @ tn
            dist = (float(np.linalg.norm(origin - known_origin))
                    if known_origin is not None else np.nan)
            cands.append(IntrinsicsCandidate(
                focal_mm=float(f_mm), sensor_mm=(sw, sh), K=K,
                rvec=np.asarray(log_so3(R), np.float64), tvec=tn,
                n_inliers=int(res.num_inliers),
                mean_err_px=float(err.mean()), max_err_px=float(err.max()),
                origin=origin, dist_to_known=dist))

    if rank_by == "dist" and known_origin is not None:
        cands.sort(key=lambda c: (c.dist_to_known, c.mean_err_px))
    else:
        cands.sort(key=lambda c: (c.mean_err_px, c.dist_to_known))
    best = cands[0]
    log.info("best combo: f=%.0fmm sensor=%s err=%.2fpx dist=%.1fm",
             best.focal_mm, best.sensor_mm, best.mean_err_px,
             best.dist_to_known)

    # LM refine the winner on all points (testpro-K.py:122-125).
    from ransac_tpu.ops.lm import refine_pose

    rvec_r, tvec_r, _ = refine_pose(
        jnp.asarray(best.rvec, jnp.float32),
        jnp.asarray(best.tvec, jnp.float32),
        Xj, pj, jnp.asarray(best.K, jnp.float32))
    pix_pred, _ = proj.project_points(
        Xj, exp_so3(rvec_r), tvec_r, jnp.asarray(best.K, jnp.float32))
    err_r = np.linalg.norm(np.asarray(pix_pred) - pixels, axis=1)
    return IntrinsicsSearchResult(
        candidates=cands, best=best,
        refined_rvec=np.asarray(rvec_r, np.float64),
        refined_tvec=np.asarray(tvec_r, np.float64),
        refined_mean_err_px=float(err_r.mean()))
