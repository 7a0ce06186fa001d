"""Fully-fused P3P-RANSAC sweep kernel.

Same design as ``sweep.py`` (the homography sweep) applied to pose
hypotheses: each lane derives its 3-point minimal sample from an in-kernel
counter-based PRNG (murmur3-finalizer hash of the flat hypothesis index —
no random tensor ever crosses HBM), gathers the sample from scalar memory
via the shared log2 selection tree, solves Grunert's P3P in registers —
law-of-cosines ratios, resultant quartic solved by Newton-from-Cauchy-bound
resolvent cubic + Ferrari (Mosaic has no acos), Newton depth polish against
the exact constraint system via an unrolled 3x3 solve, exact triangle-frame
(triad) absolute orientation — scores all correspondences for each of the
four candidate roots, and reduces each block to TWO best records (min-MSAC
and lexicographic max-count, each with the winning root id packed in) —
~24 B of HBM traffic per BLOCK_H=4096 sampled hypotheses.

Hypotheses whose minimal sample touches a masked-out point are invalidated
in-kernel (one variable-shift bit test per draw against the caller's
validity bitmask), so cross-block selection over the reduced records is
exact.

This is the BASELINE.json north-star kernel: "massively-parallel RANSAC
where thousands of minimal-sample hypotheses (P3P/EPnP) are fit and
inlier-scored per Pallas grid step", replacing
``cv2.solvePnPRansac(iterationsCount=5000, ...)``
(``/root/reference/main_v1.py:497-502``).
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
N_ROOTS = 4


def _fmix(x):
    """murmur3 32-bit finalizer: bijective avalanche mixer (counter PRNG)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _solve_quartic_vec(b, c, d, e):
    """Real roots of x^4 + b x^3 + c x^2 + d x + e = 0 on lane vectors.
    Returns (roots list[4], ok list[4]) — mirrors
    ops.linalg.solve_quartic_real (monic input).

    The resolvent-cubic largest root is found by Newton iteration started
    above the Cauchy bound (monotone convergence onto the largest real
    root) — Mosaic has no acos/trig-cubic path, and this needs only
    arithmetic + sqrt.
    """
    shift = b / 4.0
    b2 = b * b
    p = c - 3.0 * b2 / 8.0
    q = d - b * c / 2.0 + b2 * b / 8.0
    r = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0

    # Resolvent cubic m^3 + cb m^2 + cc m + cd = 0: largest real root.
    cb = p
    cc = p * p / 4.0 - r
    cd = -q * q / 8.0
    m = 1.0 + jnp.maximum(jnp.abs(cb),
                          jnp.maximum(jnp.abs(cc), jnp.abs(cd)))
    for _ in range(30):
        f = ((m + cb) * m + cc) * m + cd
        df = (3.0 * m + 2.0 * cb) * m + cc
        step = f / jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)
        # Plain Newton from above the largest root is monotone; clamp the
        # step to keep iterates finite on flat stretches.
        m = m - jnp.clip(step, -1e6, 1e6)
    m = jnp.maximum(m, 1e-12)

    s = jnp.sqrt(2.0 * m)
    q_term = q / (2.0 * s)
    base = p / 2.0 + m
    roots = []
    ok = []
    for sign in (1.0, -1.0):
        ccq = base + sign * q_term
        disc2 = s * s / 4.0 - ccq
        good = disc2 >= 0.0
        sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
        for pm in (1.0, -1.0):
            roots.append(sign * s / 2.0 + pm * sq2 - shift)
            ok.append(good)
    # Newton polish (2 steps) on the monic quartic.
    for i in range(4):
        x = roots[i]
        for _ in range(2):
            f = (((x + b) * x + c) * x + d) * x + e
            df = ((4.0 * x + 3.0 * b) * x + 2.0 * c) * x + d
            x = x - f / jnp.where(jnp.abs(df) < 1e-20, 1e-20, df)
        roots[i] = x
    return roots, ok


def _make_kernel(n_points: int, n_score: int, reduce_block: bool,
                 block_h: int):
    LAN = block_h // SUB

    def kernel(X_ref, f_ref, pix_ref, mask_ref, thr_ref, seed_ref,
               vmask_ref, fout_ref, iout_ref):
        thr_sq = thr_ref[0]
        # Anisotropy ay = fy/fx: the caller pre-scales the pool's py by ay
        # and the pose's y-row is scaled here, so du^2 + dv^2 is the TRUE
        # pixel error divided by fx (pixel-true threshold under
        # anisotropic K; cv2.solvePnPRansac semantics, main_v1.py:497-502).
        ay = thr_ref[1]
        # Counter-based PRNG: flat hypothesis index hashed with 3
        # pre-mixed per-draw seeds.  No random bits cross HBM.
        sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
        flat = pl.program_id(0) * block_h + sub * LAN + lane
        flatu = pltpu.bitcast(flat, jnp.uint32)
        bits = [_fmix(flatu ^ seed_ref[j]) for j in range(3)]

        # 3-subset Fisher-Yates.
        idx = []
        for j in range(3):
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

        # Masked-out points poison any hypothesis that sampled them
        # (engine sample_ok semantics).
        vmask = vmask_ref[0]
        ok_bits = (vmask >> idx[0]) & (vmask >> idx[1]) & (vmask >> idx[2])
        sample_valid = (ok_bits & 1) == 1

        # World points and unit bearings of the sample via the log2
        # selection tree (shared index bit masks).
        cols = [[X_ref[n, 0] for n in range(n_points)],
                [X_ref[n, 1] for n in range(n_points)],
                [X_ref[n, 2] for n in range(n_points)],
                [f_ref[n, 0] for n in range(n_points)],
                [f_ref[n, 1] for n in range(n_points)],
                [f_ref[n, 2] for n in range(n_points)]]
        g = [tree_gather_many(i, cols, n_points) for i in idx]
        P = [[g[j][c] for c in range(3)] for j in range(3)]
        F = [[g[j][3 + c] for c in range(3)] for j in range(3)]

        def dot3(a, b):
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        def sub3(a, b):
            return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]

        def norm3(a):
            return jnp.sqrt(dot3(a, a) + 1e-30)

        cos_a = dot3(F[1], F[2])
        cos_b = dot3(F[0], F[2])
        cos_g = dot3(F[0], F[1])
        a2 = dot3(sub3(P[1], P[2]), sub3(P[1], P[2]))
        b2 = jnp.maximum(dot3(sub3(P[0], P[2]), sub3(P[0], P[2])), 1e-12)
        c2 = dot3(sub3(P[0], P[1]), sub3(P[0], P[1]))
        ra = a2 / b2
        rc = c2 / b2

        qa2, qa1, qa0 = ra, -2.0 * ra * cos_b, ra
        qc2, qc1, qc0 = rc, -2.0 * rc * cos_b, rc
        n2 = 1.0 - qa2 + qc2
        n1 = -qa1 + qc1
        n0 = -qa0 - 1.0 + qc0
        p2_, p1_, p0_ = -qc2, -qc1, 1.0 - qc0
        d1, d0 = 2.0 * cos_a, -2.0 * cos_g

        c4 = n2 * n2 + p2_ * d1 * d1
        c3 = (2 * n2 * n1 - 2 * cos_g * (n2 * d1) + 2 * p2_ * d1 * d0
              + p1_ * d1 * d1)
        c2_ = (2 * n2 * n0 + n1 * n1 - 2 * cos_g * (n2 * d0 + n1 * d1)
               + p2_ * d0 * d0 + 2 * p1_ * d1 * d0 + p0_ * d1 * d1)
        c1 = (2 * n1 * n0 - 2 * cos_g * (n1 * d0 + n0 * d1)
              + p1_ * d0 * d0 + 2 * p0_ * d1 * d0)
        c0 = n0 * n0 - 2 * cos_g * (n0 * d0) + p0_ * d0 * d0
        c4s = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
        roots, root_ok = _solve_quartic_vec(
            c3 / c4s, c2_ / c4s, c1 / c4s, c0 / c4s)

        packed = idx[0] + idx[1] * 16 + idx[2] * 256

        # Running best across the 4 roots under both selection rules.
        big = jnp.float32(3.4e38)
        bestA_msac = jnp.full((SUB, LAN), big)
        bestA_count = jnp.full((SUB, LAN), -1.0)
        bestA_root = jnp.zeros((SUB, LAN), jnp.int32)
        bestB_msac = jnp.full((SUB, LAN), big)
        bestB_count = jnp.full((SUB, LAN), -1.0)
        bestB_root = jnp.zeros((SUB, LAN), jnp.int32)

        for k in range(N_ROOTS):
            v = roots[k]
            D = d1 * v + d0
            N = (n2 * v + n1) * v + n0
            u = N / jnp.where(jnp.abs(D) < 1e-9, 1e-9, D)
            s1 = jnp.sqrt(b2 / jnp.maximum(
                1.0 + v * v - 2.0 * v * cos_b, 1e-12))
            s2 = u * s1
            s3 = v * s1
            valid = (sample_valid & root_ok[k] & (v > 1e-6) & (u > 1e-6)
                     & (jnp.abs(D) > 1e-9))

            # Newton polish of depths on the law-of-cosines system
            # (2 iterations, unrolled 3x3 solve via adjugate).
            for _ in range(2):
                r1 = s2 * s2 + s3 * s3 - 2 * s2 * s3 * cos_a - a2
                r2 = s1 * s1 + s3 * s3 - 2 * s1 * s3 * cos_b - b2
                r3 = s1 * s1 + s2 * s2 - 2 * s1 * s2 * cos_g - c2
                j12 = 2 * s2 - 2 * s3 * cos_a
                j13 = 2 * s3 - 2 * s2 * cos_a
                j21 = 2 * s1 - 2 * s3 * cos_b
                j23 = 2 * s3 - 2 * s1 * cos_b
                j31 = 2 * s1 - 2 * s2 * cos_g
                j32 = 2 * s2 - 2 * s1 * cos_g
                # Solve J ds = -r, J = [[0,j12,j13],[j21,0,j23],[j31,j32,0]]
                det = (- j12 * (0.0 - j23 * j31) + j13 * (j21 * j32 - 0.0))
                det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
                b1, b2r, b3 = -r1, -r2, -r3
                ds1 = (b1 * (0.0 - j23 * j32) - j12 * (b2r * 0.0 - j23 * b3)
                       + j13 * (b2r * j32 - 0.0 * b3)) / det
                ds2 = (0.0 - b1 * (j21 * 0.0 - j23 * j31)
                       + j13 * (j21 * b3 - b2r * j31)) / det
                ds3 = (0.0 - j12 * (j21 * b3 - b2r * j31)
                       + b1 * (j21 * j32 - 0.0)) / det
                lim1 = 0.1 * jnp.abs(s1) + 1e-6
                s1 = s1 + jnp.clip(ds1, -lim1, lim1)
                s2 = s2 + jnp.clip(ds2, -lim1, lim1)
                s3 = s3 + jnp.clip(ds3, -lim1, lim1)
            valid = valid & (s1 > 0) & (s2 > 0) & (s3 > 0)

            # Camera-frame points.
            C = [[F[j][c] * (s1, s2, s3)[j] for c in range(3)]
                 for j in range(3)]

            # Triad orientation: R maps world->camera, t = c_c - R c_w.
            def triad(Pts):
                u1 = sub3(Pts[1], Pts[0])
                e1n = norm3(u1)
                e1 = [u1[c] / e1n for c in range(3)]
                v1 = sub3(Pts[2], Pts[0])
                d_ = dot3(v1, e1)
                vp = [v1[c] - d_ * e1[c] for c in range(3)]
                vpn = norm3(vp)
                e2 = [vp[c] / vpn for c in range(3)]
                e3 = [e1[1] * e2[2] - e1[2] * e2[1],
                      e1[2] * e2[0] - e1[0] * e2[2],
                      e1[0] * e2[1] - e1[1] * e2[0]]
                return e1, e2, e3

            ew = triad(P)
            ec = triad(C)
            # R = Bc @ Bw^T where columns of B are the triad vectors:
            # R[r][c] = sum_k ec_k[r] * ew_k[c].
            R = [[ec[0][r] * ew[0][c] + ec[1][r] * ew[1][c]
                  + ec[2][r] * ew[2][c] for c in range(3)] for r in range(3)]
            cw = [(P[0][c] + P[1][c] + P[2][c]) / 3.0 for c in range(3)]
            ccm = [(C[0][c] + C[1][c] + C[2][c]) / 3.0 for c in range(3)]
            t = [ccm[r] - (R[r][0] * cw[0] + R[r][1] * cw[1]
                           + R[r][2] * cw[2]) for r in range(3)]

            # Pixel-true anisotropic scoring: scale the pose's y-row once
            # per root (pool py is pre-scaled by ay host-side).
            Ry = [R[1][c] * ay for c in range(3)]
            ty = t[1] * ay

            # Score all points in fx-normalized pixel-true units.
            count = jnp.zeros((SUB, LAN), jnp.float32)
            msac = jnp.zeros((SUB, LAN), jnp.float32)
            far = jnp.float32(1e12)
            for nn in range(n_score):
                Xx = X_ref[nn, 0]
                Xy = X_ref[nn, 1]
                Xz = X_ref[nn, 2]
                px = pix_ref[nn, 0]
                py = pix_ref[nn, 1]
                wp = mask_ref[nn]
                xc = R[0][0] * Xx + R[0][1] * Xy + R[0][2] * Xz + t[0]
                yc = Ry[0] * Xx + Ry[1] * Xy + Ry[2] * Xz + ty
                zc = R[2][0] * Xx + R[2][1] * Xy + R[2][2] * Xz + t[2]
                behind = zc <= 1e-6
                inv_z = 1.0 / jnp.where(behind, 1.0, zc)
                du = xc * inv_z - px
                dv = yc * inv_z - py
                e2_ = du * du + dv * dv
                e2_ = jnp.where(behind, far, e2_)
                count = count + jnp.where(e2_ <= thr_sq, wp, 0.0)
                msac = msac + jnp.minimum(e2_, thr_sq) * wp

            msac = jnp.where(valid, msac, big)
            count = jnp.where(valid, count, -1.0)

            if not reduce_block:
                fout_ref[2 * k] = msac
                fout_ref[2 * k + 1] = count
                continue

            updA = msac < bestA_msac
            bestA_count = jnp.where(updA, count, bestA_count)
            bestA_root = jnp.where(updA, k, bestA_root)
            bestA_msac = jnp.minimum(msac, bestA_msac)
            updB = (count > bestB_count) | ((count == bestB_count)
                                            & (msac < bestB_msac))
            bestB_count = jnp.where(updB, count, bestB_count)
            bestB_msac = jnp.where(updB, msac, bestB_msac)
            bestB_root = jnp.where(updB, k, bestB_root)

        if not reduce_block:
            iout_ref[0] = packed
            return

        # Sublane reduction: one record per LANE per selection rule
        # (min-MSAC and lexicographic max-count), ties broken by smallest
        # packed index; the winning root id rides in packed bits 12-13.
        packedA = packed + bestA_root * 4096
        packedB = packed + bestB_root * 4096
        msac_m = jnp.min(bestA_msac, axis=0, keepdims=True)
        selm = bestA_msac == msac_m
        packed_m = jnp.min(jnp.where(selm, packedA, 2 ** 30),
                           axis=0, keepdims=True)
        count_m = jnp.max(jnp.where(selm & (packedA == packed_m),
                                    bestA_count, -2.0),
                          axis=0, keepdims=True)
        count_c = jnp.max(bestB_count, axis=0, keepdims=True)
        selc = bestB_count == count_c
        msac_c = jnp.min(jnp.where(selc, bestB_msac, big),
                         axis=0, keepdims=True)
        packed_c = jnp.min(jnp.where(selc & (bestB_msac == msac_c),
                                     packedB, 2 ** 30),
                           axis=0, keepdims=True)
        fout_ref[...] = jnp.concatenate(
            [msac_m, count_m, msac_c, count_c], axis=0)
        iout_ref[...] = jnp.concatenate([packed_m, packed_c], axis=0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_hyp", "n_points", "interpret", "full_records",
                     "block_h"))
def pnp_ransac_sweep(
    seed, Xw: jnp.ndarray, pix_n: jnp.ndarray, point_mask: jnp.ndarray,
    threshold_n, n_hyp: int, n_points: int | None = None,
    interpret: bool = False, full_records: bool = False,
    block_h: int | None = None, ay=1.0,
):
    """Fused P3P sweep on normalized coords.

    Default (``full_records=False``): sublane-reduced records
    ``(msac [2, B], counts [2, B], packed [2, B])`` with B = n_hyp / 8 —
    row 0 selects by min MSAC, row 1 by lexicographic (max count, min
    MSAC); each record is the best across the hypothesis's four P3P roots,
    whose id sits in packed bits 12-13 (``unpack_sample3`` ignores it).
    Samples touching ``point_mask == 0`` points are invalidated in-kernel.

    ``full_records=True``: per-(hypothesis, root) ``(msac [4H], counts
    [4H], packed [4H])`` flattened root-major — for tests/inspection.

    ``threshold_n`` is in fx-normalized units (pixel_threshold / fx);
    ``ay = fy / fx`` scales y-residuals so the bound is pixel-true under
    anisotropic K (traced — no recompile per K).
    """
    n = Xw.shape[0]
    if n_points is None:
        n_points = n
    assert n <= MAX_POINTS
    if block_h is None:
        block_h = min(BLOCK_H, max(SUB, (n_hyp // SUB) * SUB))
    assert block_h % SUB == 0
    LAN = block_h // SUB
    n_blocks = max(n_hyp // block_h, 1)

    ones = jnp.ones_like(pix_n[..., :1])
    f = jnp.concatenate([pix_n, ones], -1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)

    ay_f = jnp.asarray(ay, jnp.float32)
    pix_s = pix_n * jnp.stack([jnp.float32(1.0), ay_f])  # py pre-scaled
    X_p = jnp.zeros((MAX_POINTS, 3), jnp.float32).at[:n].set(Xw)
    f_p = jnp.zeros((MAX_POINTS, 3), jnp.float32).at[:n].set(f)
    pix_p = jnp.zeros((MAX_POINTS, 2), jnp.float32).at[:n].set(pix_s)
    mask_p = jnp.zeros((MAX_POINTS,), jnp.float32).at[:n].set(
        point_mask.astype(jnp.float32))
    thr = jnp.stack([jnp.asarray(threshold_n, jnp.float32) ** 2, ay_f])
    seed_u = jnp.asarray(seed, jnp.uint32)
    seeds = _fmix(seed_u + jnp.arange(1, 4, dtype=jnp.uint32)
                  * jnp.uint32(0x9E3779B9))
    vmask = jnp.sum(
        jnp.where(mask_p > 0, jnp.int32(1) << jnp.arange(MAX_POINTS), 0)
    ).reshape(1).astype(jnp.int32)

    kernel = _make_kernel(n_points, n, reduce_block=not full_records,
                          block_h=block_h)
    if full_records:
        out_specs = (
            pl.BlockSpec((2 * N_ROOTS, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, LAN), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((2 * N_ROOTS, SUB, n_blocks * LAN),
                                 jnp.float32),
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
            pl.BlockSpec(memory_space=pltpu.SMEM),  # X
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bearings
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pix_n
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr^2
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-draw seeds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # sample bitmask
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=n_hyp * (2500 + 4 * 25 * n), transcendentals=n_hyp * 20,
            bytes_accessed=n_blocks * 24),
    )(X_p, f_p, pix_p, mask_p, thr, seeds, vmask)
    if full_records:
        msac = fout[0::2].reshape(N_ROOTS, -1).reshape(-1)
        counts = fout[1::2].reshape(N_ROOTS, -1).reshape(-1)
        packed = jnp.tile(iout[0].reshape(-1), (N_ROOTS,))
        return msac, counts, packed
    return (fout[jnp.array([0, 2])], fout[jnp.array([1, 3])], iout)


def unpack_sample3(packed: int) -> np.ndarray:
    p = int(packed)
    return np.array([p & 15, (p >> 4) & 15, (p >> 8) & 15], dtype=np.int32)


def issue_slots_per_hyp(n_points: int) -> float:
    """Analytic VPU issue-slot count per P3P SAMPLE (4 roots solved and
    scored; FMA = 2 slots — see ``sweep.issue_slots_per_hyp``).

    - PRNG + 3-draw Fisher-Yates + tree gather (15 cols)          ~260
    - Grunert quartic: 30-step Newton resolvent cubic (~240) +
      Ferrari + 2-step polish x4 roots (~160) + depth/triad pose
      construction x4 roots (~300)                                ~700
    - single-pass scoring, 4 roots x n x (project ~14 + residual
      + records ~12)                                              ~104n
    """
    return 960 + 104 * n_points
