"""Candidate-axis fused homography-RANSAC sweep.

The localization search is (458 candidate cameras) x (C(13,4)=715
exhaustive hypotheses); the single-problem sweep kernel (``sweep.py``)
handles one candidate per launch.  This kernel adds the candidate axis to
the grid: each grid step (c, b) loads candidate c's plane-projected points
from its VMEM block, runs BLOCK_H hypotheses from a *shared, precomputed*
sample-index tensor (exhaustive enumeration — identical combos for every
candidate, streamed once), and writes sublane-reduced per-(candidate,
lane) winner records.

The full search's hypothesize-and-verify therefore runs as ONE launch with
O(C) HBM traffic, feeding the existing per-candidate refit + reference
scoring (pipelines.localize).  It replaces the 458 sequential
cv2.findHomography RANSAC loops of the reference (main_v1.py:274-284,312).

The solver is the same division/sqrt-free projective-frame (adjugate)
4-point homography as ``sweep.py`` (see its module docstring): the shared
pixel set is globally normalized to O(1) once in the wrapper (threshold
scaled along, msac rescaled back), candidate plane points are O(1) by
construction, and each candidate's winning sample is re-solved exactly
downstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ransac_tpu.ops.pallas.gather import tree_gather_many

BLOCK_H = 1024
SUB = 8
LAN = BLOCK_H // SUB
MAX_POINTS = 16
N_ACC = 4          # independent accumulator pairs (ops.pallas.sweep)


def _make_kernel(n_score: int):
    def kernel(dst_ref, mask_ref, thr_ref, src_ref, idx_ref,
               fbest_ref, ibest_ref):
        thr_sq = thr_ref[0]
        src = src_ref[0]          # [MAX_POINTS, 2] candidate block (VMEM)
        idx = idx_ref[...]        # [4, SUB, LAN] int32 sample indices

        cols = [[src[nn, 0] for nn in range(n_score)],
                [src[nn, 1] for nn in range(n_score)],
                [dst_ref[nn, 0] for nn in range(n_score)],
                [dst_ref[nn, 1] for nn in range(n_score)]]
        g = [tree_gather_many(idx[j], cols, n_score) for j in range(4)]
        sx = [g[j][0] for j in range(4)]
        sy = [g[j][1] for j in range(4)]
        dx = [g[j][2] for j in range(4)]
        dy = [g[j][3] for j in range(4)]

        # Projective-frame 4-point homography (division-free, up to scale;
        # see sweep.py).
        def det3(px, py, qx, qy, rx, ry):
            return (qx - px) * (ry - py) - (rx - px) * (qy - py)

        def frame(xs, ys):
            d0 = det3(xs[0], ys[0], xs[1], ys[1], xs[2], ys[2])
            l1 = det3(xs[3], ys[3], xs[1], ys[1], xs[2], ys[2])
            l2 = det3(xs[0], ys[0], xs[3], ys[3], xs[2], ys[2])
            l3 = det3(xs[0], ys[0], xs[1], ys[1], xs[3], ys[3])
            M = [[l1 * xs[0], l2 * xs[1], l3 * xs[2]],
                 [l1 * ys[0], l2 * ys[1], l3 * ys[2]],
                 [l1, l2, l3]]
            ok = ((jnp.abs(d0) > 1e-7) & (jnp.abs(l1) > 1e-7)
                  & (jnp.abs(l2) > 1e-7) & (jnp.abs(l3) > 1e-7))
            return M, ok

        A, ok_s = frame(sx, sy)
        B, ok_d = frame(dx, dy)
        valid = ok_s & ok_d

        adjA = [[A[1][1] * A[2][2] - A[1][2] * A[2][1],
                 A[0][2] * A[2][1] - A[0][1] * A[2][2],
                 A[0][1] * A[1][2] - A[0][2] * A[1][1]],
                [A[1][2] * A[2][0] - A[1][0] * A[2][2],
                 A[0][0] * A[2][2] - A[0][2] * A[2][0],
                 A[0][2] * A[1][0] - A[0][0] * A[1][2]],
                [A[1][0] * A[2][1] - A[1][1] * A[2][0],
                 A[0][1] * A[2][0] - A[0][0] * A[2][1],
                 A[0][0] * A[1][1] - A[0][1] * A[1][0]]]
        H = [None] * 9
        for r in range(3):
            for c in range(3):
                H[3 * r + c] = (B[r][0] * adjA[0][c] + B[r][1] * adjA[1][c]
                                + B[r][2] * adjA[2][c])

        # N_ACC independent accumulator pairs (round-5 flagship finding,
        # ops.pallas.sweep.N_ACC): breaks the serial accumulate chain.
        counts = [jnp.zeros((SUB, LAN), jnp.float32)
                  for _ in range(N_ACC)]
        msacs = [jnp.zeros((SUB, LAN), jnp.float32)
                 for _ in range(N_ACC)]
        for nn in range(n_score):
            x = src[nn, 0]
            y = src[nn, 1]
            px = dst_ref[nn, 0]
            py = dst_ref[nn, 1]
            wp = mask_ref[nn]
            u = H[0] * x + H[1] * y + H[2]
            v = H[3] * x + H[4] * y + H[5]
            w = H[6] * x + H[7] * y + H[8]
            # Division-deferred scoring (see ops.pallas.sweep): exact
            # inlier test in algebraic form, MSAC via one approx
            # reciprocal; degenerate w contributes exactly thr^2.
            a = u - px * w
            b = v - py * w
            r2 = a * a + b * b
            w2 = jnp.maximum(w * w, jnp.float32(1e-30))
            t = thr_sq * w2
            iw2 = pl.reciprocal(w2, approx=True)
            k = nn % N_ACC
            counts[k] = counts[k] + jnp.where(r2 <= t, wp, 0.0)
            msacs[k] = msacs[k] + jnp.minimum(r2, t) * iw2 * wp
        count = counts[0]
        msac = msacs[0]
        for k in range(1, N_ACC):
            count = count + counts[k]
            msac = msac + msacs[k]

        msac = jnp.where(valid, msac, jnp.float32(3.4e38))
        packed = (idx[0] + idx[1] * 16 + idx[2] * 256 + idx[3] * 4096)

        # Sublane reduction: per-lane min-MSAC record (ties -> smallest
        # packed index; exhaustive enumeration is deterministic).
        msac_m = jnp.min(msac, axis=0, keepdims=True)
        selm = msac == msac_m
        packed_m = jnp.min(jnp.where(selm, packed, 2 ** 30),
                           axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (packed == packed_m),
                                    count, -2.0), axis=0, keepdims=True)
        fbest_ref[0, 0] = msac_m[0]
        fbest_ref[0, 1] = count_m[0]
        ibest_ref[0, 0] = packed_m[0]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def multi_candidate_sweep(
    src_all: jnp.ndarray,     # [C, MAX_POINTS, 2] per-candidate plane pts
    dst: jnp.ndarray,         # [N<=16, 2] shared pixels
    point_mask: jnp.ndarray,  # [N]
    sample_idx: jnp.ndarray,  # [4, H] int32 (H multiple of BLOCK_H)
    threshold,
    interpret: bool = False,
):
    """One launch over (C candidates x H hypotheses).

    Returns sublane-reduced records ``(msac [C, H/8], counts [C, H/8],
    packed [C, H/8])``: per (candidate, lane), the min-MSAC hypothesis of
    its 8 sublane hypotheses.  ``argmin(msac, 1)`` + the matching packed
    entry give exactly the same winner as per-hypothesis records.
    """
    C = src_all.shape[0]
    n = dst.shape[0]
    H = sample_idx.shape[1]
    assert H % BLOCK_H == 0
    n_blocks = H // BLOCK_H
    # Hypothesis (s, b, l) <-> flat h = s*(n_blocks*LAN) + b*LAN + l.
    idx3 = sample_idx.reshape(4, SUB, n_blocks * LAN)

    # Global O(1) normalization of the shared pixel set (candidate plane
    # points are O(1) already); threshold scales along, msac scaled back.
    dm = jnp.sum(dst * point_mask[:, None].astype(dst.dtype), 0) / (
        jnp.maximum(jnp.sum(point_mask.astype(dst.dtype)), 1.0))
    dd = jnp.sqrt(jnp.sum((dst - dm) ** 2, -1))
    s_dst = 1.4142135623730951 / jnp.maximum(
        jnp.sum(dd * point_mask.astype(dst.dtype))
        / jnp.maximum(jnp.sum(point_mask.astype(dst.dtype)), 1.0), 1e-12)

    src_p = jnp.zeros((C, MAX_POINTS, 2), jnp.float32).at[
        :, :src_all.shape[1]].set(src_all)
    dst_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(
        (dst - dm) * s_dst)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = (jnp.asarray(threshold, jnp.float32).reshape(1) * s_dst) ** 2

    kernel = _make_kernel(n)
    fout, iout = pl.pallas_call(
        kernel,
        grid=(C, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # dst
            pl.BlockSpec(memory_space=pltpu.SMEM),   # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),   # thr^2
            pl.BlockSpec((1, MAX_POINTS, 2), lambda c, b: (c, 0, 0),
                         memory_space=pltpu.VMEM),   # candidate points
            pl.BlockSpec((4, SUB, LAN), lambda c, b: (0, 0, b),
                         memory_space=pltpu.VMEM),   # sample indices
        ],
        out_specs=(
            pl.BlockSpec((1, 2, LAN), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LAN), lambda c, b: (c, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, 2, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, n_blocks * LAN), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=C * H * (500 + 22 * n), transcendentals=0,
            bytes_accessed=C * (MAX_POINTS * 8 + H * 12 // 8)),
    )(dst_p, mask_p, thr, src_p, idx3.astype(jnp.int32))
    inv_s2 = 1.0 / (s_dst * s_dst)
    msac_n = fout[:, 0]
    msac = jnp.where(msac_n >= jnp.float32(3e38), jnp.float32(3.4e38),
                     msac_n * inv_s2)
    return msac, fout[:, 1], iout[:, 0]
