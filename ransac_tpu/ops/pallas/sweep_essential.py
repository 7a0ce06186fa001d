"""Fully-fused 8-point essential-matrix RANSAC sweep kernel.

Completes the fused hypothesize-and-verify family (homography ``sweep.py``,
P3P ``sweep_pnp.py``): each lane derives its 8-point sample from an
in-kernel counter-based PRNG (murmur3-finalizer hash of the flat
hypothesis index — no random tensor crosses HBM), gathers the sample from
scalar memory via the shared log2 selection tree, solves the 8-point
system division- and pivot-free (below), scores every correspondence with
the Sampson distance, and reduces each block to TWO best records (min-MSAC
and lexicographic max-count) — ~24 B of HBM traffic per block.  Rank-2
enforcement is intentionally deferred to the host refit: for inlier
counting the unconstrained F's Sampson distances are near-identical, and
the winning sample is re-solved exactly by the engine's normalized
8-point (SVD + rank projection) afterwards.

Solver (canonical-frame generalized cross product): map the first 4
sampled correspondences of EACH image onto the canonical projective basis
(e1, e2, e3, (1,1,1)) with the division-free adjugate frame from the
homography sweep, T = adj([l1*s1 | l2*s2 | l3*s3]).  In the primed frames
the epipolar constraints of those 4 points force F' = T2^-T F T1^-1 to
have a ZERO DIAGONAL (points 1-3) and zero entry sum (point 4).  The
remaining 4 correspondences then give a 4x5 homogeneous system on
[f13,f21,f23,f31,f32] (after substituting f12 = -sum of the others) whose
1-D nullspace is the generalized cross product of its rows — five 4x4
determinants sharing the 2x2 minors of row pairs (Plücker expansion).
F = T2^T F' T1 recomposes the scoring matrix in input coordinates.  NO
divide, sqrt, or pivot anywhere, vs per-sample Hartley (16 sqrt) +
pivoted 8x8 elimination (~900 ops, 16 divides) before; degenerate frames
(3 collinear among the 4 anchors in either image) and rank-deficient
systems are invalidated, matching RANSAC's degenerate-sample rejection.
The caller pre-normalizes both point sets with one shared scale so the
frame determinants are O(1) in f32; Sampson decisions are unchanged
(numerator and denominator both rescale, threshold scaled along).

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

SUB = 8
BLOCK_H = 2048     # LAN 256: N_ACC accumulators + 9 F tiles fit the vreg file
MAX_POINTS = 16
N_ACC = 4          # independent accumulator pairs (ops.pallas.sweep)


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

        # Canonical adjugate frames from the first 4 sampled points of
        # each image (same construction as the homography sweep's solve).
        def det3(px, py, qx, qy, rx, ry):
            return (qx - px) * (ry - py) - (rx - px) * (qy - py)

        def frame_adj(xs, ys):
            d0 = det3(xs[0], ys[0], xs[1], ys[1], xs[2], ys[2])
            l1 = det3(xs[3], ys[3], xs[1], ys[1], xs[2], ys[2])
            l2 = det3(xs[0], ys[0], xs[3], ys[3], xs[2], ys[2])
            l3 = det3(xs[0], ys[0], xs[1], ys[1], xs[3], ys[3])
            A = [[l1 * xs[0], l2 * xs[1], l3 * xs[2]],
                 [l1 * ys[0], l2 * ys[1], l3 * ys[2]],
                 [l1, l2, l3]]
            # adj(A) maps the 4 points onto (e1, e2, e3, (1,1,1)) up to
            # scale (adj(A) = det(A) A^-1; the scale drops out of F).
            T = [[A[1][1] * A[2][2] - A[1][2] * A[2][1],
                  A[0][2] * A[2][1] - A[0][1] * A[2][2],
                  A[0][1] * A[1][2] - A[0][2] * A[1][1]],
                 [A[1][2] * A[2][0] - A[1][0] * A[2][2],
                  A[0][0] * A[2][2] - A[0][2] * A[2][0],
                  A[0][2] * A[1][0] - A[0][0] * A[1][2]],
                 [A[1][0] * A[2][1] - A[1][1] * A[2][0],
                  A[0][1] * A[2][0] - A[0][0] * A[2][1],
                  A[0][0] * A[1][1] - A[0][1] * A[1][0]]]
            ok = ((jnp.abs(d0) > 1e-7) & (jnp.abs(l1) > 1e-7)
                  & (jnp.abs(l2) > 1e-7) & (jnp.abs(l3) > 1e-7))
            # Frobenius-normalize: T entries are degree-6 polynomials of
            # the coordinates, and everything downstream is polynomial in
            # T (the nullspace determinants reach degree ~56 in the raw
            # coordinates, far outside f32 range unless rescaled here).
            n2 = sum(T[r][c] * T[r][c] for r in range(3) for c in range(3))
            inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
            T = [[T[r][c] * inv for c in range(3)] for r in range(3)]
            return T, ok

        T1, ok1 = frame_adj(u1[:4], v1[:4])
        T2, ok2 = frame_adj(u2[:4], v2[:4])
        valid = sample_valid & ok1 & ok2

        # Remaining 4 correspondences in the primed frames give rows
        #   [s q, s r, t p, t r, u p, u q] on [f12,f13,f21,f23,f31,f32];
        # substituting f12 = -(f13+f21+f23+f31+f32) (point-4 constraint)
        # leaves a 4x5 system on [f13,f21,f23,f31,f32].
        rows = []
        for j in range(4, 8):
            p = T1[0][0] * u1[j] + T1[0][1] * v1[j] + T1[0][2]
            q = T1[1][0] * u1[j] + T1[1][1] * v1[j] + T1[1][2]
            r = T1[2][0] * u1[j] + T1[2][1] * v1[j] + T1[2][2]
            s = T2[0][0] * u2[j] + T2[0][1] * v2[j] + T2[0][2]
            t = T2[1][0] * u2[j] + T2[1][1] * v2[j] + T2[1][2]
            w = T2[2][0] * u2[j] + T2[2][1] * v2[j] + T2[2][2]
            c0 = s * q
            rows.append([s * r - c0, t * p - c0, t * r - c0,
                         w * p - c0, w * q - c0])

        # Nullspace of the 4x5 system: generalized cross product via
        # Plücker expansion — 2x2 minors of row pairs (0,1) and (2,3),
        # then each 4x4 determinant is a 6-term bilinear combination.
        m01 = {}
        m23 = {}
        for i in range(5):
            for j in range(i + 1, 5):
                m01[i, j] = rows[0][i] * rows[1][j] - rows[0][j] * rows[1][i]
                m23[i, j] = rows[2][i] * rows[3][j] - rows[2][j] * rows[3][i]

        def det4(c0, c1, c2, c3):
            return (m01[c0, c1] * m23[c2, c3] - m01[c0, c2] * m23[c1, c3]
                    + m01[c0, c3] * m23[c1, c2] + m01[c1, c2] * m23[c0, c3]
                    - m01[c1, c3] * m23[c0, c2] + m01[c2, c3] * m23[c0, c1])

        f13 = det4(1, 2, 3, 4)
        f21 = -det4(0, 2, 3, 4)
        f23 = det4(0, 1, 3, 4)
        f31 = -det4(0, 1, 2, 4)
        f32 = det4(0, 1, 2, 3)
        f12 = -(f13 + f21 + f23 + f31 + f32)

        # F = T2^T F' T1 with F' = [[0,f12,f13],[f21,0,f23],[f31,f32,0]].
        # P = F' T1 first (each F' row has two nonzeros).
        P = [[f12 * T1[1][c] + f13 * T1[2][c] for c in range(3)],
             [f21 * T1[0][c] + f23 * T1[2][c] for c in range(3)],
             [f31 * T1[0][c] + f32 * T1[1][c] for c in range(3)]]
        F = [T2[0][r] * P[0][c] + T2[1][r] * P[1][c] + T2[2][r] * P[2][c]
             for r in range(3) for c in range(3)]
        # Frobenius-normalize F so the Sampson epsilon floor below is
        # scale-independent (the old f33=1 solve guaranteed |F| >= 1; a
        # near-zero F would floor every denominator and fake a full
        # consensus).  A genuinely vanishing nullspace (rank-deficient
        # 4x5 system: coincident/degenerate remaining points) is
        # invalidated rather than normalized into noise.
        fn2 = sum(f * f for f in F)
        valid = valid & (fn2 > 1e-30)
        finv = jax.lax.rsqrt(jnp.maximum(fn2, 1e-36))
        F = [f * finv for f in F]

        # N_ACC independent accumulator pairs: with one pair the score
        # loop is LATENCY-bound on the serial accumulate chains (the
        # round-5 flagship finding, ops.pallas.sweep.N_ACC).
        counts = [jnp.zeros((SUB, LAN), jnp.float32)
                  for _ in range(N_ACC)]
        msacs = [jnp.zeros((SUB, LAN), jnp.float32)
                 for _ in range(N_ACC)]
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
            # Division-deferred Sampson test (EXACT rewrite of the old
            # n2/dmax <= thr): n2 <= thr*dmax, MSAC via one approx
            # reciprocal — min(n2, thr*dmax)/dmax == min(n2/dmax, thr).
            dmax = jnp.maximum(denom, 1e-12)
            n2_ = x2Fx1 * x2Fx1
            t2_ = thr_sq * dmax
            k = nn % N_ACC
            counts[k] = counts[k] + jnp.where(n2_ <= t2_, wp, 0.0)
            msacs[k] = msacs[k] + (jnp.minimum(n2_, t2_)
                                   * pl.reciprocal(dmax, approx=True) * wp)
        count = counts[0]
        msac = msacs[0]
        for k in range(1, N_ACC):
            count = count + counts[k]
            msac = msac + msacs[k]

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

    # Global normalization with ONE shared scale: per-image centering +
    # a common isotropic scale keeps Sampson decisions exact (numerator
    # (x2^T F x1)^2 and denominator gradient norms both pick up s^2 per
    # factor; thresholding e*s^2 against thr*s^2 is unchanged) while
    # making the in-kernel frame determinants O(1) for f32.
    m1 = jnp.sum(x1[:n_points], 0) / n_points
    m2 = jnp.sum(x2[:n_points], 0) / n_points
    d = (jnp.sum(jnp.sqrt(jnp.sum((x1[:n_points] - m1) ** 2, -1)))
         + jnp.sum(jnp.sqrt(jnp.sum((x2[:n_points] - m2) ** 2, -1))))
    s = 1.4142135623730951 / jnp.maximum(d / (2 * n_points), 1e-12)
    x1_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set((x1 - m1) * s)
    x2_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set((x2 - m2) * s)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = (jnp.asarray(threshold_sq, jnp.float32).reshape(1) * s * s)
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
            flops=n_hyp * (1400 + 30 * n), transcendentals=0,
            bytes_accessed=n_blocks * 24),
    )(x1_p, x2_p, mask_p, thr, seeds, vmask)

    inv_s2 = 1.0 / (s * s)

    def _rescale(m):
        return jnp.where(m >= jnp.float32(3e38), jnp.float32(3.4e38),
                         m * inv_s2)

    if full_records:
        return (_rescale(fout[0].reshape(-1)), fout[1].reshape(-1),
                iout[0].reshape(-1))
    return (_rescale(fout[jnp.array([0, 2])]), fout[jnp.array([1, 3])],
            iout)


def unpack_sample8(packed: int) -> np.ndarray:
    p = int(packed) & 0xFFFFFFFF
    return np.array([(p >> (4 * j)) & 15 for j in range(8)], dtype=np.int32)


def issue_slots_per_hyp(n_points: int) -> float:
    """Analytic VPU issue-slot count per hypothesis (FMA = 2 slots; see
    ``sweep.issue_slots_per_hyp``).  Canonical-frame generalized-cross-
    product solve: two adjugate frames + 4x5 Pluecker determinant chain
    with mid-flight rescale (~500 mul-adds -> ~1000 slots incl. 3
    rsqrt); Sampson-gated epipolar scoring ~45/point."""
    return 1100 + 45 * n_points
