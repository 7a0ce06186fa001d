"""Fused RANSAC scoring kernels (Pallas TPU).

The hot loop of the whole framework: given H hypothesis models and N
correspondences, produce per-hypothesis inlier counts and MSAC scores.  The
jnp path materializes an [H, N] residual tensor in HBM; these kernels keep
everything in VMEM/registers — each grid step streams one block of models,
loops the (tiny, padded) point set from SMEM-resident scalars, and writes
just the [2, H] reduction.  HBM traffic drops from O(H*N) to O(H), which is
what makes >=10^7 hypotheses/s/chip feasible (BASELINE.md target: 10^5).

Model layouts are column-major over hypotheses ([P, H], lanes = hypotheses)
so each model parameter row broadcasts across the vector lanes.

Replaces the inlier-count inner loops of ``cv2.findHomography`` /
``cv2.solvePnPRansac`` (``/root/reference/main_v1.py:312,497``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Hypotheses per grid step (lanes): multiple of 128.
BLOCK_H = 2048
# Padded point capacity (static unroll bound).
MAX_POINTS = 16


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _pad_models(models_t: jnp.ndarray, block: int):
    p, h = models_t.shape
    h_pad = -(-h // block) * block
    return jnp.pad(models_t, ((0, 0), (0, h_pad - h))), h_pad


def _pad_points(pts: jnp.ndarray, mask: jnp.ndarray, width: int):
    n = pts.shape[0]
    assert n <= MAX_POINTS, f"pad points beyond {MAX_POINTS} upstream"
    pts_p = jnp.zeros((MAX_POINTS, width), pts.dtype).at[:n, : pts.shape[1]].set(pts)
    mask_p = jnp.zeros((MAX_POINTS, 1), jnp.float32).at[:n, 0].set(
        mask.astype(jnp.float32))
    return pts_p, mask_p


# ---------------------------------------------------------------- homography
def _h_score_kernel(src_ref, dst_ref, mask_ref, thr_ref, m_ref, out_ref):
    thr_sq = thr_ref[0, 0]
    m = m_ref[...]  # [16, BLOCK_H] rows: h00..h22 in rows 0..8
    count = jnp.zeros((1, m.shape[1]), jnp.float32)
    msac = jnp.zeros((1, m.shape[1]), jnp.float32)
    for n in range(MAX_POINTS):
        x = src_ref[n, 0]
        y = src_ref[n, 1]
        px = dst_ref[n, 0]
        py = dst_ref[n, 1]
        valid = mask_ref[n, 0]
        u = m[0:1, :] * x + m[1:2, :] * y + m[2:3, :]
        v = m[3:4, :] * x + m[4:5, :] * y + m[5:6, :]
        w = m[6:7, :] * x + m[7:8, :] * y + m[8:9, :]
        inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        du = u * inv_w - px
        dv = v * inv_w - py
        e2 = du * du + dv * dv
        inl = jnp.where(e2 <= thr_sq, 1.0, 0.0) * valid
        count += inl
        msac += jnp.minimum(e2, thr_sq) * valid
    out_ref[0:1, :] = count
    out_ref[1:2, :] = msac


@functools.partial(jax.jit, static_argnames=("interpret",))
def homography_scores(models: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                      point_mask: jnp.ndarray, threshold: jnp.ndarray,
                      interpret: bool = False):
    """models [H,3,3]; src/dst [N<=16,2]; -> (counts [H] f32, msac [H] f32).

    Counts exclude masked points; msac is the truncated squared-residual sum
    (identical semantics to the jnp path in models.ransac.ransac_fit).
    """
    h = models.shape[0]
    m_t = models.reshape(h, 9).T  # [9, H]
    m_t = jnp.pad(m_t, ((0, MAX_POINTS - 9), (0, 0)))
    m_t, h_pad = _pad_models(m_t, BLOCK_H)
    src_p, mask_p = _pad_points(src, point_mask, 2)
    dst_p, _ = _pad_points(dst, point_mask, 2)
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1) ** 2

    out = pl.pallas_call(
        _h_score_kernel,
        grid=(h_pad // BLOCK_H,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # src
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dst
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr^2
            pl.BlockSpec((MAX_POINTS, BLOCK_H), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, BLOCK_H), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=h_pad * MAX_POINTS * 14, transcendentals=0,
            bytes_accessed=h_pad * (MAX_POINTS + 2) * 4),
    )(src_p, dst_p, mask_p, thr, m_t)
    return out[0, :h], out[1, :h]


# ---------------------------------------------------------------- PnP
def _pnp_score_kernel(X_ref, pix_ref, mask_ref, thr_ref, m_ref, out_ref):
    thr_sq = thr_ref[0, 0]
    m = m_ref[...]  # rows 0..8 = R, 9..11 = t
    count = jnp.zeros((1, m.shape[1]), jnp.float32)
    msac = jnp.zeros((1, m.shape[1]), jnp.float32)
    big = jnp.float32(1e12)
    for n in range(MAX_POINTS):
        X = X_ref[n, 0]
        Y = X_ref[n, 1]
        Z = X_ref[n, 2]
        px = pix_ref[n, 0]
        py = pix_ref[n, 1]
        valid = mask_ref[n, 0]
        xc = m[0:1, :] * X + m[1:2, :] * Y + m[2:3, :] * Z + m[9:10, :]
        yc = m[3:4, :] * X + m[4:5, :] * Y + m[5:6, :] * Z + m[10:11, :]
        zc = m[6:7, :] * X + m[7:8, :] * Y + m[8:9, :] * Z + m[11:12, :]
        behind = zc <= 1e-6
        inv_z = 1.0 / jnp.where(behind, 1.0, zc)
        du = xc * inv_z - px
        dv = yc * inv_z - py
        e2 = du * du + dv * dv
        e2 = jnp.where(behind, big, e2)
        inl = jnp.where(e2 <= thr_sq, 1.0, 0.0) * valid
        count += inl
        msac += jnp.minimum(e2, thr_sq) * valid
    out_ref[0:1, :] = count
    out_ref[1:2, :] = msac


@functools.partial(jax.jit, static_argnames=("interpret",))
def pnp_scores(models: jnp.ndarray, Xw: jnp.ndarray, pix_n: jnp.ndarray,
               point_mask: jnp.ndarray, threshold: jnp.ndarray,
               interpret: bool = False):
    """models [H,12] (R row-major 9 + t 3); Xw [N,3]; pix_n [N,2] normalized
    coords; threshold in normalized units."""
    h = models.shape[0]
    m_t = models.T  # [12, H]
    m_t = jnp.pad(m_t, ((0, MAX_POINTS - 12), (0, 0)))
    m_t, h_pad = _pad_models(m_t, BLOCK_H)
    X_p, mask_p = _pad_points(Xw, point_mask, 3)
    pix_p, _ = _pad_points(pix_n, point_mask, 2)
    thr = jnp.asarray(threshold, jnp.float32).reshape(1, 1) ** 2

    out = pl.pallas_call(
        _pnp_score_kernel,
        grid=(h_pad // BLOCK_H,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((MAX_POINTS, BLOCK_H), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, BLOCK_H), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, h_pad), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=h_pad * MAX_POINTS * 22, transcendentals=0,
            bytes_accessed=h_pad * (MAX_POINTS + 2) * 4),
    )(X_p, pix_p, mask_p, thr, m_t)
    return out[0, :h], out[1, :h]


# ------------------------------------------------------- jnp reference path
def homography_scores_ref(models, src, dst, point_mask, threshold):
    from ransac_tpu.ops.homography import transfer_errors

    r = jax.vmap(lambda H: transfer_errors(H, src, dst))(models)
    thr_sq = threshold * threshold
    r_sq = jnp.where(jnp.isfinite(r), r * r, jnp.inf)
    pm = point_mask.astype(bool)[None, :]
    counts = ((r_sq <= thr_sq) & pm).sum(-1).astype(jnp.float32)
    msac = jnp.where(pm, jnp.minimum(r_sq, thr_sq), 0.0).sum(-1)
    return counts, msac


def pnp_scores_ref(models, Xw, pix_n, point_mask, threshold):
    def resid(m):
        R = m[:9].reshape(3, 3)
        t = m[9:12]
        Xc = Xw @ R.T + t
        z = Xc[:, 2]
        ok = z > 1e-6
        uv = Xc[:, :2] / jnp.where(ok, z, 1.0)[:, None]
        e2 = jnp.sum((uv - pix_n) ** 2, -1)
        return jnp.where(ok, e2, 1e12)

    e2 = jax.vmap(resid)(models)
    thr_sq = threshold * threshold
    pm = point_mask.astype(bool)[None, :]
    counts = ((e2 <= thr_sq) & pm).sum(-1).astype(jnp.float32)
    msac = jnp.where(pm, jnp.minimum(e2, thr_sq), 0.0).sum(-1)
    return counts, msac
