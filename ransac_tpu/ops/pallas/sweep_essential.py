"""Fully-fused 8-point essential-matrix RANSAC sweep kernel.

Completes the fused hypothesize-and-verify family (homography ``sweep.py``,
P3P ``sweep_pnp.py``): each lane draws an 8-point sample from the (<=16
pad) normalized correspondence set, Hartley-normalizes both sides, solves
the 8x9 epipolar system with f33=1 by unrolled partially-pivoted Gaussian
elimination in registers, denormalizes, and scores every correspondence
with the Sampson distance.  Rank-2 enforcement is intentionally deferred
to the host refit: for inlier counting the unconstrained F's Sampson
distances are near-identical, and the winning sample is re-solved exactly
by the engine's normalized 8-point (SVD + rank projection) afterwards.

Serves BASELINE.json configs[2] ("8-point essential-matrix RANSAC") at the
same traffic profile as the other sweeps (12 B/hypothesis).
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


def _make_kernel(n_points: int, n_score: int):
    def kernel(x1_ref, x2_ref, mask_ref, thr_ref, bits_ref,
               fout_ref, iout_ref):
        thr_sq = thr_ref[0]  # Sampson bound, already in squared units
        bits = pltpu.bitcast(bits_ref[...], jnp.uint32)

        # 8-subset Fisher-Yates.
        idx = []
        for j in range(8):
            r = (bits[j] % jnp.uint32(n_points - j)).astype(jnp.int32)
            prev_sorted = []
            for pv in idx:
                ins = pv
                out = []
                for sv in prev_sorted:
                    lo = jnp.minimum(sv, ins)
                    hi = jnp.maximum(sv, ins)
                    out.append(lo)
                    ins = hi
                out.append(ins)
                prev_sorted = out
            for sv in prev_sorted:
                r = r + (r >= sv).astype(jnp.int32)
            idx.append(r)

        def gather(ref, col, ind):
            acc = jnp.zeros((SUB, LAN), jnp.float32)
            for nn in range(n_points):
                acc = acc + jnp.where(ind == nn, ref[nn, col], 0.0)
            return acc

        u1 = [gather(x1_ref, 0, i) for i in idx]
        v1 = [gather(x1_ref, 1, i) for i in idx]
        u2 = [gather(x2_ref, 0, i) for i in idx]
        v2 = [gather(x2_ref, 1, i) for i in idx]

        def hartley8(xs, ys):
            mx = sum(xs) / 8.0
            my = sum(ys) / 8.0
            md = sum(jnp.sqrt((x - mx) ** 2 + (y - my) ** 2 + 1e-20)
                     for x, y in zip(xs, ys)) / 8.0
            s = 1.4142135623730951 / jnp.maximum(md, 1e-12)
            return ([(x - mx) * s for x in xs], [(y - my) * s for y in ys],
                    mx, my, s)

        u1n, v1n, m1x, m1y, s1 = hartley8(u1, v1)
        u2n, v2n, m2x, m2y, s2 = hartley8(u2, v2)

        # Epipolar rows with f33 = 1:
        #   [u2u1, u2v1, u2, v2u1, v2v1, v2, u1, v1] f8 = -1
        one = jnp.ones((SUB, LAN), jnp.float32)
        aug = []
        for j in range(8):
            a, b, c, d = u1n[j], v1n[j], u2n[j], v2n[j]
            aug.append([c * a, c * b, c, d * a, d * b, d, a, b, -one])

        valid = jnp.ones((SUB, LAN), jnp.bool_)
        # Full partial pivoting (no structural zeros in this system).
        for k in range(8):
            for i in range(k + 1, 8):
                swap = jnp.abs(aug[i][k]) > jnp.abs(aug[k][k])
                for c in range(k, 9):
                    a_k = aug[k][c]
                    a_i = aug[i][c]
                    aug[k][c] = jnp.where(swap, a_i, a_k)
                    aug[i][c] = jnp.where(swap, a_k, a_i)
            p = aug[k][k]
            valid = valid & (jnp.abs(p) > 1e-8)
            inv_p = 1.0 / jnp.where(jnp.abs(p) < 1e-12, 1e-12, p)
            for i in range(k + 1, 8):
                f = aug[i][k] * inv_p
                for c in range(k + 1, 9):
                    aug[i][c] = aug[i][c] - f * aug[k][c]
        f8 = [jnp.zeros((SUB, LAN), jnp.float32)] * 8
        for k in range(7, -1, -1):
            acc = aug[k][8]
            for c in range(k + 1, 8):
                acc = acc - aug[k][c] * f8[c]
            p = aug[k][k]
            f8[k] = acc / jnp.where(jnp.abs(p) < 1e-12, 1e-12, p)
        Fn = f8 + [one]  # row-major f11..f33 in normalized coords

        # Denormalize: F = T2^T Fn T1 with T = [[s,0,-s mx],[0,s,-s my],
        # [0,0,1]].  T2^T Fn first (T2^T = [[s2,0,0],[0,s2,0],
        # [-s2 m2x, -s2 m2y, 1]]).
        G = [
            s2 * Fn[0], s2 * Fn[1], s2 * Fn[2],
            s2 * Fn[3], s2 * Fn[4], s2 * Fn[5],
            -s2 * m2x * Fn[0] - s2 * m2y * Fn[3] + Fn[6],
            -s2 * m2x * Fn[1] - s2 * m2y * Fn[4] + Fn[7],
            -s2 * m2x * Fn[2] - s2 * m2y * Fn[5] + Fn[8],
        ]
        # G @ T1: columns transform.
        F = [
            G[0] * s1, G[1] * s1, -s1 * (G[0] * m1x + G[1] * m1y) + G[2],
            G[3] * s1, G[4] * s1, -s1 * (G[3] * m1x + G[4] * m1y) + G[5],
            G[6] * s1, G[7] * s1, -s1 * (G[6] * m1x + G[7] * m1y) + G[8],
        ]

        count = jnp.zeros((SUB, LAN), jnp.float32)
        msac = jnp.zeros((SUB, LAN), jnp.float32)
        for nn in range(n_score):
            a = x1_ref[nn, 0]
            b = x1_ref[nn, 1]
            c = x2_ref[nn, 0]
            d = x2_ref[nn, 1]
            wp = mask_ref[nn]
            Fx1_0 = F[0] * a + F[1] * b + F[2]
            Fx1_1 = F[3] * a + F[4] * b + F[5]
            Fx1_2 = F[6] * a + F[7] * b + F[8]
            Ftx2_0 = F[0] * c + F[3] * d + F[6]
            Ftx2_1 = F[1] * c + F[4] * d + F[7]
            x2Fx1 = c * Fx1_0 + d * Fx1_1 + Fx1_2
            denom = (Fx1_0 * Fx1_0 + Fx1_1 * Fx1_1
                     + Ftx2_0 * Ftx2_0 + Ftx2_1 * Ftx2_1)
            e = (x2Fx1 * x2Fx1) / jnp.maximum(denom, 1e-12)
            count = count + jnp.where(e <= thr_sq, wp, 0.0)
            msac = msac + jnp.minimum(e, thr_sq) * wp

        msac = jnp.where(valid, msac, jnp.float32(3.4e38))
        # 8 x 4-bit indices fill the int32 exactly (idx[7] uses the sign
        # bits; unpack_sample8 masks them back out).
        packed = idx[0]
        for j in range(1, 8):
            packed = packed | (idx[j] << (4 * j))
        fout_ref[0] = msac
        fout_ref[1] = count
        iout_ref[0] = packed

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_hyp", "n_points", "interpret"))
def essential_ransac_sweep(
    seed, x1: jnp.ndarray, x2: jnp.ndarray, point_mask: jnp.ndarray,
    threshold_sq, n_hyp: int, n_points: int | None = None,
    interpret: bool = False,
):
    """Fused 8-point sweep on normalized coords.

    ``threshold_sq`` is the Sampson bound in squared normalized units
    ((px_threshold / focal)^2).  Returns per-hypothesis (msac [H],
    counts [H], packed_idx [H]); unpack the winner with ``unpack_sample8``.
    """
    n = x1.shape[0]
    if n_points is None:
        n_points = n
    assert n <= MAX_POINTS
    n_blocks = max(n_hyp // BLOCK_H, 1)

    x1_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(x1)
    x2_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(x2)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = jnp.asarray(threshold_sq, jnp.float32).reshape(1)
    key = jax.random.key(jnp.asarray(seed, jnp.uint32))
    bits = jax.random.bits(key, (8, SUB, n_blocks * LAN), jnp.uint32)

    kernel = _make_kernel(n_points, n)
    fout, iout = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, SUB, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((1, SUB, n_blocks * LAN), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * (2300 + 25 * n), transcendentals=n_hyp * 4,
            bytes_accessed=n_hyp * 44),
    )(x1_p, x2_p, mask_p, thr, bits)
    return fout[0].reshape(-1), fout[1].reshape(-1), iout[0].reshape(-1)


def unpack_sample8(packed: int) -> np.ndarray:
    p = int(packed) & 0xFFFFFFFF
    return np.array([(p >> (4 * j)) & 15 for j in range(8)], dtype=np.int32)
