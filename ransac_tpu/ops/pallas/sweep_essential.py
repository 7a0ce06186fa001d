"""Fully-fused 8-point essential-matrix RANSAC sweep kernel.

Completes the fused hypothesize-and-verify family (homography ``sweep.py``,
P3P ``sweep_pnp.py``): each lane derives its 8-point sample from an
in-kernel counter-based PRNG (murmur3-finalizer hash of the flat
hypothesis index — no random tensor crosses HBM), gathers the sample from
scalar memory via the shared log2 selection tree, Hartley-normalizes both
sides, solves the 8x9 epipolar system with f33=1 by unrolled
partially-pivoted Gaussian elimination in registers, denormalizes, scores
every correspondence with the Sampson distance, and reduces each block to
TWO best records (min-MSAC and lexicographic max-count) — ~24 B of HBM
traffic per block.  Rank-2 enforcement is intentionally deferred to the
host refit: for inlier counting the unconstrained F's Sampson distances
are near-identical, and the winning sample is re-solved exactly by the
engine's normalized 8-point (SVD + rank projection) afterwards.

Hypotheses whose minimal sample touches a masked-out point are invalidated
in-kernel, so cross-block selection over the reduced records is exact.

Serves BASELINE.json configs[2] ("8-point essential-matrix RANSAC"),
replacing OpenCV-style findEssentialMat(RANSAC) hypothesize-and-verify.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ransac_tpu.ops.pallas.gather import tree_gather_many

BLOCK_H = 4096
SUB = 8
MAX_POINTS = 16


def _fmix(x):
    """murmur3 32-bit finalizer: bijective avalanche mixer (counter PRNG)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _make_kernel(n_points: int, n_score: int, reduce_block: bool,
                 block_h: int):
    LAN = block_h // SUB

    def kernel(x1_ref, x2_ref, mask_ref, thr_ref, seed_ref, vmask_ref,
               fout_ref, iout_ref):
        thr_sq = thr_ref[0]  # Sampson bound, already in squared units
        # Counter-based PRNG: flat hypothesis index hashed with 8
        # pre-mixed per-draw seeds.
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * block_h + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        bits = [_fmix(flatu ^ seed_ref[j]) for j in range(8)]

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

        # Masked-out points poison any hypothesis that sampled them.
        vmask = vmask_ref[0]
        ok_bits = vmask >> idx[0]
        for j in range(1, 8):
            ok_bits = ok_bits & (vmask >> idx[j])
        sample_valid = (ok_bits & 1) == 1

        # Gather the sampled coordinates via the log2 selection tree.
        cols = [[x1_ref[nn, 0] for nn in range(n_points)],
                [x1_ref[nn, 1] for nn in range(n_points)],
                [x2_ref[nn, 0] for nn in range(n_points)],
                [x2_ref[nn, 1] for nn in range(n_points)]]
        g = [tree_gather_many(i, cols, n_points) for i in idx]
        u1 = [g[j][0] for j in range(8)]
        v1 = [g[j][1] for j in range(8)]
        u2 = [g[j][2] for j in range(8)]
        v2 = [g[j][3] for j in range(8)]

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

        valid = sample_valid
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

        big = jnp.float32(3.4e38)
        msac = jnp.where(valid, msac, big)
        count = jnp.where(valid, count, -1.0)
        # 8 x 4-bit indices fill the int32 exactly (idx[7] uses the sign
        # bits; unpack_sample8 masks them back out).
        packed = idx[0]
        for j in range(1, 8):
            packed = packed | (idx[j] << (4 * j))

        if not reduce_block:
            fout_ref[0] = msac
            fout_ref[1] = count
            iout_ref[0] = packed
            return

        # Sublane reduction: one record per LANE per selection rule
        # (min-MSAC and lexicographic max-count).  Packed indices can use
        # the sign bit, so tie-breaks compare an unsigned-shifted copy.
        pcmp = packed ^ jnp.int32(-2 ** 31)  # order-preserving for uint cmp
        msac_m = jnp.min(msac, axis=0, keepdims=True)
        selm = msac == msac_m
        pcmp_m = jnp.min(jnp.where(selm, pcmp, jnp.int32(2 ** 31 - 1)),
                         axis=0, keepdims=True)
        packed_m = pcmp_m ^ jnp.int32(-2 ** 31)
        count_m = jnp.max(jnp.where(selm & (pcmp == pcmp_m), count, -2.0),
                          axis=0, keepdims=True)
        count_c = jnp.max(count, axis=0, keepdims=True)
        selc = count == count_c
        msac_c = jnp.min(jnp.where(selc, msac, big), axis=0, keepdims=True)
        pcmp_c = jnp.min(jnp.where(selc & (msac == msac_c), pcmp,
                                   jnp.int32(2 ** 31 - 1)),
                         axis=0, keepdims=True)
        packed_c = pcmp_c ^ jnp.int32(-2 ** 31)
        fout_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        iout_ref[...] = jnp.concatenate([packed_m, packed_c], axis=0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_hyp", "n_points", "interpret", "full_records",
                     "block_h"))
def essential_ransac_sweep(
    seed, x1: jnp.ndarray, x2: jnp.ndarray, point_mask: jnp.ndarray,
    threshold_sq, n_hyp: int, n_points: int | None = None,
    interpret: bool = False, full_records: bool = False,
    block_h: int | None = None,
):
    """Fused 8-point sweep on normalized coords.

    ``threshold_sq`` is the Sampson bound in squared normalized units
    ((px_threshold / focal)^2).

    Default (``full_records=False``): sublane-reduced records
    ``(msac [2, B], counts [2, B], packed [2, B])`` with B = n_hyp / 8 —
    row 0 selects by min MSAC, row 1 by lexicographic (max count, min
    MSAC).  Samples touching ``point_mask == 0`` points are invalidated
    in-kernel.  ``full_records=True``: per-hypothesis ``(msac [H], counts
    [H], packed [H])``.  Unpack winners with ``unpack_sample8``.
    """
    n = x1.shape[0]
    if n_points is None:
        n_points = n
    assert n <= MAX_POINTS
    if block_h is None:
        block_h = min(BLOCK_H, max(SUB, (n_hyp // SUB) * SUB))
    assert block_h % SUB == 0
    LAN = block_h // SUB
    n_blocks = max(n_hyp // block_h, 1)

    x1_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(x1)
    x2_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(x2)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = jnp.asarray(threshold_sq, jnp.float32).reshape(1)
    seed_u = jnp.asarray(seed, jnp.uint32)
    seeds = _fmix(seed_u + jnp.arange(1, 9, dtype=jnp.uint32)
                  * jnp.uint32(0x9E3779B9))
    vmask = jnp.sum(
        jnp.where(mask_p > 0, jnp.int32(1) << jnp.arange(MAX_POINTS), 0)
    ).reshape(1).astype(jnp.int32)

    kernel = _make_kernel(n_points, n, reduce_block=not full_records,
                          block_h=block_h)
    if full_records:
        out_specs = (
            pl.BlockSpec((2, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((2, SUB, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((1, SUB, n_blocks * LAN), jnp.int32),
        )
    else:
        out_specs = (
            pl.BlockSpec((4, LAN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LAN), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((4, n_blocks * LAN), jnp.float32),
            jax.ShapeDtypeStruct((2, n_blocks * LAN), jnp.int32),
        )
    fout, iout = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-draw seeds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sample bitmask
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * (2300 + 25 * n), transcendentals=n_hyp * 4,
            bytes_accessed=n_blocks * 24),
    )(x1_p, x2_p, mask_p, thr, seeds, vmask)
    if full_records:
        return fout[0].reshape(-1), fout[1].reshape(-1), iout[0].reshape(-1)
    return (fout[jnp.array([0, 2])], fout[jnp.array([1, 3])], iout)


def unpack_sample8(packed: int) -> np.ndarray:
    p = int(packed) & 0xFFFFFFFF
    return np.array([(p >> (4 * j)) & 15 for j in range(8)], dtype=np.int32)
