"""Candidate-axis fused homography-RANSAC sweep.

The localization search is (458 candidate cameras) x (C(13,4)=715
exhaustive hypotheses); the single-problem sweep kernel (``sweep.py``)
handles one candidate per launch.  This kernel adds the candidate axis to
the grid: each grid step (c, b) loads candidate c's plane-projected points
from its VMEM block, runs BLOCK_H hypotheses from a *shared, precomputed*
sample-index tensor (exhaustive enumeration — identical combos for every
candidate, streamed once), and writes the per-(candidate, block) winner.

The full search's hypothesize-and-verify therefore runs as ONE launch with
O(C) HBM traffic, feeding the existing per-candidate refit + reference
scoring (pipelines.localize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_H = 1024
SUB = 8
LAN = BLOCK_H // SUB
MAX_POINTS = 16


def _make_kernel(n_score: int):
    def kernel(dst_ref, mask_ref, thr_ref, src_ref, idx_ref,
               fbest_ref, ibest_ref):
        thr_sq = thr_ref[0]
        src = src_ref[0]          # [MAX_POINTS, 2] candidate block (VMEM)
        idx = idx_ref[...]        # [4, SUB, LAN] int32 sample indices

        def gather_src(col, ind):
            acc = jnp.zeros((SUB, LAN), jnp.float32)
            for nn in range(n_score):
                acc = acc + jnp.where(ind == nn, src[nn, col], 0.0)
            return acc

        def gather_dst(col, ind):
            acc = jnp.zeros((SUB, LAN), jnp.float32)
            for nn in range(n_score):
                acc = acc + jnp.where(ind == nn, dst_ref[nn, col], 0.0)
            return acc

        sx = [gather_src(0, idx[j]) for j in range(4)]
        sy = [gather_src(1, idx[j]) for j in range(4)]
        dx = [gather_dst(0, idx[j]) for j in range(4)]
        dy = [gather_dst(1, idx[j]) for j in range(4)]

        def hartley(xs, ys):
            mx = (xs[0] + xs[1] + xs[2] + xs[3]) * 0.25
            my = (ys[0] + ys[1] + ys[2] + ys[3]) * 0.25
            d = [jnp.sqrt((x - mx) ** 2 + (y - my) ** 2 + 1e-20)
                 for x, y in zip(xs, ys)]
            md = (d[0] + d[1] + d[2] + d[3]) * 0.25
            s = 1.4142135623730951 / jnp.maximum(md, 1e-12)
            return ([(x - mx) * s for x in xs], [(y - my) * s for y in ys],
                    mx, my, s)

        sxn, syn, smx, smy, ss = hartley(sx, sy)
        dxn, dyn, dmx, dmy, sd = hartley(dx, dy)

        one = jnp.ones((SUB, LAN), jnp.float32)
        zero = jnp.zeros((SUB, LAN), jnp.float32)

        def u_row(j):
            x, y, u = sxn[j], syn[j], dxn[j]
            return [x, y, one, zero, zero, zero, -u * x, -u * y, u]

        def v_row(j):
            x, y, v = sxn[j], syn[j], dyn[j]
            return [zero, zero, zero, x, y, one, -v * x, -v * y, v]

        aug = [u_row(0), u_row(1), u_row(2),
               v_row(0), v_row(1), v_row(2),
               u_row(3), v_row(3)]

        valid = jnp.ones((SUB, LAN), jnp.bool_)
        group_end = {0: 3, 1: 3, 2: 3, 3: 6, 4: 6, 5: 6, 6: 8, 7: 8}
        for k in range(8):
            for i in range(k + 1, group_end[k]):
                swap = jnp.abs(aug[i][k]) > jnp.abs(aug[k][k])
                for c in range(k, 9):
                    a_k = aug[k][c]
                    a_i = aug[i][c]
                    aug[k][c] = jnp.where(swap, a_i, a_k)
                    aug[i][c] = jnp.where(swap, a_k, a_i)
            p = aug[k][k]
            valid = valid & (jnp.abs(p) > 1e-7)
            inv_p = 1.0 / jnp.where(jnp.abs(p) < 1e-12, 1e-12, p)
            for i in range(k + 1, 8):
                f = aug[i][k] * inv_p
                for c in range(k + 1, 9):
                    aug[i][c] = aug[i][c] - f * aug[k][c]
        h = [zero] * 8
        for k in range(7, -1, -1):
            acc = aug[k][8]
            for c in range(k + 1, 8):
                acc = acc - aug[k][c] * h[c]
            p = aug[k][k]
            h[k] = acc / jnp.where(jnp.abs(p) < 1e-12, 1e-12, p)

        hn = h + [one]
        m = [None] * 9
        for r in range(3):
            a, b, c = hn[3 * r], hn[3 * r + 1], hn[3 * r + 2]
            m[3 * r] = a * ss
            m[3 * r + 1] = b * ss
            m[3 * r + 2] = -ss * (a * smx + b * smy) + c
        inv_sd = 1.0 / sd
        H = [
            m[0] * inv_sd + dmx * m[6], m[1] * inv_sd + dmx * m[7],
            m[2] * inv_sd + dmx * m[8],
            m[3] * inv_sd + dmy * m[6], m[4] * inv_sd + dmy * m[7],
            m[5] * inv_sd + dmy * m[8],
            m[6], m[7], m[8],
        ]

        count = jnp.zeros((SUB, LAN), jnp.float32)
        msac = jnp.zeros((SUB, LAN), jnp.float32)
        for nn in range(n_score):
            x = src[nn, 0]
            y = src[nn, 1]
            px = dst_ref[nn, 0]
            py = dst_ref[nn, 1]
            wp = mask_ref[nn]
            u = H[0] * x + H[1] * y + H[2]
            v = H[3] * x + H[4] * y + H[5]
            w = H[6] * x + H[7] * y + H[8]
            inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
            du = u * inv_w - px
            dv = v * inv_w - py
            e2 = du * du + dv * dv
            count = count + jnp.where(e2 <= thr_sq, wp, 0.0)
            msac = msac + jnp.minimum(e2, thr_sq) * wp

        msac = jnp.where(valid, msac, jnp.float32(3.4e38))
        packed = (idx[0] + idx[1] * 16 + idx[2] * 256 + idx[3] * 4096)
        fbest_ref[0, 0] = msac
        fbest_ref[0, 1] = count
        ibest_ref[0, 0] = packed

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

    Returns (msac [C, H], counts [C, H], packed [H]) — packed is shared
    across candidates (same exhaustive sample set).
    """
    C = src_all.shape[0]
    n = dst.shape[0]
    H = sample_idx.shape[1]
    assert H % BLOCK_H == 0
    n_blocks = H // BLOCK_H
    # Hypothesis (s, b, l) <-> flat h = s*(n_blocks*LAN) + b*LAN + l.
    idx3 = sample_idx.reshape(4, SUB, n_blocks * LAN)

    src_p = jnp.zeros((C, MAX_POINTS, 2), jnp.float32).at[:, :src_all.shape[1]].set(src_all)
    dst_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(dst)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = jnp.asarray(threshold, jnp.float32).reshape(1) ** 2

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
            pl.BlockSpec((1, 2, SUB, LAN), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, LAN), lambda c, b: (c, 0, 0, b),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((C, 2, SUB, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((C, 1, SUB, n_blocks * LAN), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=C * H * (1100 + 22 * n), transcendentals=C * H * 8,
            bytes_accessed=C * (MAX_POINTS * 8 + H * 12)),
    )(dst_p, mask_p, thr, src_p, idx3.astype(jnp.int32))
    return (fout[:, 0].reshape(C, -1), fout[:, 1].reshape(C, -1),
            iout[0, 0].reshape(-1))