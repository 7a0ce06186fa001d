"""DEM ray-cast geo-inversion: pixel -> ground coordinates.

Replaces the reference's scalar REPL path (``/root/reference/main_v1.py:
547-684``): per query pixel it builds one ray, then marches it 1 m at a
time, calling PROJ + scipy interpolation from Python on EVERY step (hot
loop #4, SURVEY.md §3.1) — the slowest interactive path in the reference.

Here all query pixels march in lockstep inside one ``lax.while_loop`` over
a [R,3] position tensor with a per-ray done mask, sampling a pre-warped
scene-centered UTM DEM with a fused bilinear gather — zero host round-trips
and zero in-loop geodesy.  Both of the reference's ray-correction modes are
implemented:

- weighted optimization factors (main_v1.py:577-632): per-control-point
  componentwise ideal/computed direction ratios, |f|>2 outlier filter,
  inverse-distance weights capped at ``max_weight`` with the nearest
  control point boosted ``knn_weight``x, z-component correction;
- per-axis least-squares scales (test_pro.py:645-680) via the shared LM
  core (``ops.lm.fit_ray_scales``).

The reference's >=150-step hit warmup (main_v1.py:650) is reproduced via
``RaycastConfig.min_hit_step``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ransac_tpu.io.dem import DemUtm, bilinear_sample
from ransac_tpu.ops import projection as proj
from ransac_tpu.ops.lm import fit_ray_scales
from ransac_tpu.utils.config import RaycastConfig


# ------------------------------------------------------------ corrections
def calculate_weights(query_pixels: jnp.ndarray, control_pixels: jnp.ndarray,
                      max_weight: float = 1.0, knn_weight: float = 10.0):
    """Batched main_v1.py:577-596: weights [R, C] — inverse pixel distance
    capped at max_weight, nearest control point boosted knn_weight x."""
    d = jnp.linalg.norm(
        query_pixels[:, None, :] - control_pixels[None, :, :], axis=-1)
    w = jnp.minimum(jnp.where(d == 0.0, 1.0, 1.0 / jnp.where(d == 0, 1.0, d)),
                    max_weight)
    nearest = jnp.argmin(d, axis=1)
    boost = jax.nn.one_hot(nearest, control_pixels.shape[0], dtype=w.dtype)
    return w * (1.0 + (knn_weight - 1.0) * boost)


def compute_optimization_factors(
    control_pixels: jnp.ndarray,   # [C,2]
    control_pos3d: jnp.ndarray,    # [C,3] centered UTM
    K: jnp.ndarray, R: jnp.ndarray, ray_origin: jnp.ndarray,
    factor_abs_max: float = 2.0,
):
    """Batched main_v1.py:599-625.  Returns (factors [C,3], valid [C]) —
    componentwise ideal/computed ray ratios; |f| > factor_abs_max rows are
    filtered (valid=False) exactly like the reference's continue."""
    ideal = control_pos3d - ray_origin[None, :]
    norm = jnp.linalg.norm(ideal, axis=-1, keepdims=True)
    valid = norm[:, 0] > 0
    ideal = ideal / jnp.where(norm > 0, norm, 1.0)
    rays = proj.pixel_to_ray(control_pixels, K, R)
    factors = ideal / jnp.where(jnp.abs(rays) < 1e-12, 1e-12, rays)
    valid = valid & jnp.all(jnp.abs(factors) <= factor_abs_max, axis=-1)
    return factors, valid


def weighted_factors(factors: jnp.ndarray, valid: jnp.ndarray,
                     weights: jnp.ndarray):
    """Batched main_v1.py:627-632 over query rows: weights [R,C] x factors
    [C,3] -> [R,3] normalized weighted mean over valid control points."""
    w = weights * valid[None, :].astype(weights.dtype)
    wsum = jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
    return (w[..., None] * factors[None, :, :]).sum(1) / wsum


# ------------------------------------------------------------ ray march
@partial(jax.jit,
         static_argnames=("max_steps", "min_hit_step", "step", "chunk"))
def march_rays(
    origins: jnp.ndarray,      # [R,3] centered UTM
    directions: jnp.ndarray,   # [R,3] unit
    dem_data: jnp.ndarray, x0, y0, dx, dy,
    max_steps: int, step: float = 1.0, min_hit_step: int = 150,
    chunk: int = 64,
):
    """Lockstep batched ray march.  Returns (hits [R,3], hit_mask [R]).

    Termination per ray: z <= DEM(x, y) after >= min_hit_step steps (the
    reference warmup quirk, main_v1.py:650), or leaving the DEM footprint,
    or max_steps.  Instead of one tiny gather per 1 m step (the reference
    does one PROJ FFI call + scipy interpolation per step, main_v1.py:
    638-656), each while_loop iteration evaluates ``chunk`` future steps of
    every active ray in a single [R*chunk] bilinear gather and resolves the
    first crossing in the chunk — same step-0..max_steps-1 semantics, 1/chunk
    the trip count, and gathers big enough to saturate the memory system.
    Early-exits when every ray is done.
    """
    n = origins.shape[0]
    xmax = x0 + dx * (dem_data.shape[1] - 1)
    ymax = y0 + dy * (dem_data.shape[0] - 1)
    ks = jnp.arange(chunk, dtype=origins.dtype)        # relative step ids

    def cond(state):
        i, pos, done, hit = state
        return (i < max_steps) & jnp.logical_not(jnp.all(done))

    def body(state):
        i, pos, done, hit = state
        # Candidate positions for global steps i..i+chunk-1 (active rays
        # carry pos == origin + i*step*dir, so P[:, k] is step i+k).
        P = pos[:, None, :] + (step * ks)[None, :, None] * directions[:, None, :]
        z_dem = bilinear_sample(
            dem_data, x0, y0, dx, dy,
            P[..., 0].reshape(-1), P[..., 1].reshape(-1)).reshape(n, chunk)
        inside = ((P[..., 0] >= x0) & (P[..., 0] <= xmax)
                  & (P[..., 1] >= y0) & (P[..., 1] <= ymax))
        gstep = i + jnp.arange(chunk)                  # [chunk] global ids
        in_budget = gstep < max_steps
        hit_k = ((gstep >= min_hit_step)[None, :] & (P[..., 2] <= z_dem)
                 & inside & in_budget[None, :])
        stop_k = (hit_k | ~inside) & in_budget[None, :]
        any_stop = stop_k.any(axis=1) & ~done
        first = jnp.argmax(stop_k, axis=1)             # first stop in chunk
        first_is_hit = jnp.take_along_axis(hit_k, first[:, None], 1)[:, 0]
        stop_pos = jnp.take_along_axis(P, first[:, None, None], 1)[:, 0, :]
        adv = jnp.minimum(jnp.asarray(chunk), max_steps - i)
        adv_pos = pos + (adv * step) * directions
        new_pos = jnp.where(done[:, None], pos,
                            jnp.where(any_stop[:, None], stop_pos, adv_pos))
        hit = hit | (any_stop & first_is_hit)
        done = done | any_stop
        return i + chunk, new_pos, done, hit

    i0 = jnp.asarray(0)
    done0 = jnp.zeros(n, bool)
    hit0 = jnp.zeros(n, bool)
    _, pos, done, hit = jax.lax.while_loop(
        cond, body, (i0, origins, done0, hit0))
    return pos, hit


# ------------------------------------------------------------ inverter
@dataclass
class GeoInverter:
    """Holds the solved camera + DEM and answers pixel->geo queries in
    batch — the engine behind the reference's REPL (main_v1.py:934-958) and
    boundary conversion (main_v1.py:765-785)."""

    K: np.ndarray
    R: np.ndarray
    ray_origin: np.ndarray      # [3] centered UTM
    dem: DemUtm
    control_pixels: np.ndarray  # [C,2]
    control_pos3d: np.ndarray   # [C,3] centered
    cfg: RaycastConfig = RaycastConfig()

    def __post_init__(self):
        self._factors, self._valid = compute_optimization_factors(
            jnp.asarray(self.control_pixels, jnp.float32),
            jnp.asarray(self.control_pos3d, jnp.float32),
            jnp.asarray(self.K, jnp.float32),
            jnp.asarray(self.R, jnp.float32),
            jnp.asarray(self.ray_origin, jnp.float32),
            self.cfg.factor_abs_max)
        if self.cfg.correction == "lsq_scales":
            ideal = self.control_pos3d - self.ray_origin
            ideal = ideal / np.linalg.norm(ideal, axis=1, keepdims=True)
            rays = np.asarray(proj.pixel_to_ray(
                jnp.asarray(self.control_pixels, jnp.float32),
                jnp.asarray(self.K, jnp.float32),
                jnp.asarray(self.R, jnp.float32)))
            scales, _ = fit_ray_scales(
                jnp.asarray(ideal, jnp.float32), jnp.asarray(rays))
            self._scales = np.asarray(scales)
        else:
            self._scales = np.ones(3, np.float32)

    def rays_for(self, pixels: np.ndarray) -> jnp.ndarray:
        pixels = jnp.asarray(np.atleast_2d(pixels), jnp.float32)
        rays = proj.pixel_to_ray(
            pixels, jnp.asarray(self.K, jnp.float32),
            jnp.asarray(self.R, jnp.float32))
        if self.cfg.correction == "weighted_factors":
            w = calculate_weights(
                pixels, jnp.asarray(self.control_pixels, jnp.float32),
                self.cfg.max_weight, self.cfg.knn_weight)
            f = weighted_factors(self._factors, self._valid, w)
            # Reference applies only the z factor then renormalizes
            # (main_v1.py:671-678).
            rays = rays.at[:, 2].multiply(f[:, 2])
        elif self.cfg.correction == "lsq_scales":
            rays = rays * jnp.asarray(self._scales)[None, :]
        return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)

    def pixel_to_geo(self, pixels: np.ndarray):
        """[R,2] pixels -> (utm [R,3] f64 absolute, hit_mask [R])."""
        pixels = np.atleast_2d(np.asarray(pixels, np.float64))
        rays = self.rays_for(pixels)
        origins = jnp.broadcast_to(
            jnp.asarray(self.ray_origin, jnp.float32), rays.shape)
        dem_arrs = self.dem.device_arrays()
        max_steps = int(self.cfg.max_search_dist_m / self.cfg.step_m)
        pos, hit = march_rays(
            origins, rays, *dem_arrs, max_steps=max_steps,
            step=self.cfg.step_m, min_hit_step=self.cfg.min_hit_step)
        utm = self.dem.frame.uncenter(np.asarray(pos, np.float64))
        return utm, np.asarray(hit)

    def convert_boundary(self, json_data: dict):
        """ISAT segmentation JSON -> {(group, category): [utm rows]} +
        pixel dict, batched (main_v1.py:765-785 parity incl. the
        `geo_coord.all()` nonzero filter)."""
        import re

        keys, pix = [], []
        for obj in json_data.get("objects", []):
            group = obj.get("group")
            category = re.sub(r"[^a-zA-Z0-9]", "", str(obj.get("category")))
            for px, py in obj.get("segmentation", []):
                keys.append((group, category))
                pix.append((px, py))
        if not pix:
            return {}, {}
        utm, hit = self.pixel_to_geo(np.asarray(pix, np.float64))
        geo, pixels = {}, {}
        for k, p, u, h in zip(keys, pix, utm, hit):
            if not h or not u.all():
                continue
            geo.setdefault(k, []).append(u)
            pixels.setdefault(k, []).append(p)
        return geo, pixels
